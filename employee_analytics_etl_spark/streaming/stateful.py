"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running profile (event count, value sum, last-seen) that
survives across micro-batches — the pattern for operators Structured
Streaming's built-in aggregations can't express (per-key custom state
machines, CEP-ish logic, online features).

State: one row per user_id (count, sum, last_ts_micros). Output: the
updated profile per user per batch. GroupStateTimeout can evict idle
users in production; the bounded smoke test uses NoTimeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_profile(key, pdfs, state):
    # NB: module-level function (picklable), no annotations (see
    # similarity.lsh_hyperplane_buckets note on `from __future__`).
    import pandas as pd

    (user_id,) = key
    n, total, last_us = state.get() if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_micros"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts_micros": [last_us],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events (with event-time ts) → per-user running profile via
    applyInPandasWithState. Input may be a streaming OR batch frame
    with columns (user_id, ts, value)."""
    prepared = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_micros"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
