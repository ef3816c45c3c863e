"""Structured Streaming tests: stream results must equal the batch
twins on the same bounded input (file source + availableNow + memory
sink)."""

import pytest

from employee_analytics_etl_spark.operators.windows import tumbling_window_agg
from employee_analytics_etl_spark.sources.readers import read_parquet_table
from employee_analytics_etl_spark.streaming.jobs import (
    build_events_stream,
    run_to_memory,
    session_window_stream,
    tumbling_counts_stream,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def batch_events(spark):
    return read_parquet_table(spark, SF_SMOKE, "events")


class TestStreaming:
    def test_tumbling_stream_equals_batch(self, spark, batch_events):
        stream = build_events_stream(spark, SF_SMOKE)
        got = run_to_memory(
            tumbling_counts_stream(stream), "t_tumbling", spark
        ).collect()
        want = tumbling_window_agg(batch_events, "ts", 3600, ["event_type"]).collect()

        def key(rows):
            return sorted(
                (r["window_start_sec"], r["event_type"], r["n_events"], r["total_value"])
                for r in rows
            )

        assert key(got) == key(want)

    def test_session_window_stream_runs(self, spark):
        stream = build_events_stream(spark, SF_SMOKE)
        got = run_to_memory(
            session_window_stream(stream), "t_sessions", spark
        ).collect()
        assert len(got) > 0
        assert all(r["n_events"] >= 1 for r in got)
