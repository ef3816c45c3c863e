"""Streaming scale bench (VERDICT r11 ask #5): sustained throughput +
state-store size for the two heaviest streaming jobs under a rate
source, at two rates.

The batch twins prove the streaming tier's CORRECTNESS (pytest runs
every stream against its batch-equivalent result); nothing before this
harness proved the tier survives VOLUME. This measures, per job and
rate, from Structured Streaming's own progress telemetry
(StreamingQuery.recentProgress — the same numbers a production
monitoring stack scrapes):

- sustained_rows_per_sec: mean processedRowsPerSecond over the steady
  tail (first SKIP_BATCHES batches dropped — codegen/state warmup)
- input_vs_processed: mean inputRowsPerSecond / processedRowsPerSecond
  over the tail; > 1 sustained = the job cannot keep up at that rate
  (the backpressure read — rate sources don't slow down, so pressure
  shows up as batch latency + this ratio, not as source throttling)
- state_rows / state_mem_bytes: final-batch stateOperators totals
- watermark_lag_sec: wall clock minus the last progress's event-time
  watermark — bounded lag = watermark advancing at source speed
- batch_sec_p50/p95 over the tail

Jobs (both from streaming/jobs.py, unmodified — the harness only
synthesizes their input from a rate source):

- sessionize: session_window_stream, 10 s gap. USER_CARD_SESSION (1M)
  user keys at rate R means each user fires every USER_CARD/R seconds;
  at R = 20k/100k that inter-arrival (50 s / 10 s) straddles the gap,
  so sessions both extend and close — the state store holds the open
  horizon (~R·gap rows) in steady state rather than growing unbounded.
- interval_join: clicks_before_purchase_stream, 60 s lookback, 10 s
  watermark. USER_CARD_JOIN (100k) keys gives each purchase a handful
  of matching clicks, so the join does real pair work while state
  stays bounded by the watermark + interval horizon.

Usage:
    python tools/bench_streaming.py OUT.json [--rates 20000,100000]
        [--duration 45] [--jobs sessionize,interval_join]

Honest-mode notes recorded in the artifact: rate-source rows are
synthesized in-JVM (no network/disk source cost — this isolates the
OPERATOR's sustainable rate); event time is wall clock, so watermark
lag directly measures end-to-end keep-up.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

USER_CARD_SESSION = 1_000_000
USER_CARD_JOIN = 100_000
SKIP_BATCHES = 3


def rate_events(spark, rows_per_sec: int, user_card: int):
    """Synthesize the events-table shape from a rate source: the same
    columns the file-source stream produces, with wall-clock event
    time. 8 source partitions ~ one per 4 cores at local[32]."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .option("numPartitions", "8")
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        (F.col("value") % user_card).cast("long").alias("user_id"),
        F.when(F.col("value") % 10 < 8, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 500).cast("double").alias("value"),
    )


def build_job(spark, job: str, rate: int):
    from employee_analytics_etl_spark.streaming.jobs import (
        clicks_before_purchase_stream,
        session_window_stream,
    )

    if job == "sessionize":
        ev = rate_events(spark, rate, USER_CARD_SESSION)
        return session_window_stream(ev, gap="10 seconds", watermark="10 seconds")
    if job == "interval_join":
        ev = rate_events(spark, rate, USER_CARD_JOIN)
        return clicks_before_purchase_stream(
            ev, lookback_sec=60, watermark="10 seconds"
        )
    raise SystemExit(f"unknown job {job!r}")


def _iso_to_epoch(s: str) -> float:
    return (
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def summarize(progresses: list[dict], wall_end: float) -> dict:
    tail = [
        p
        for p in progresses[SKIP_BATCHES:]
        if p.get("numInputRows", 0) > 0
    ]
    if not tail:
        return {"error": "no steady-state batches", "n_batches": len(progresses)}
    proc = [p["processedRowsPerSecond"] for p in tail]
    inp = [p["inputRowsPerSecond"] for p in tail]
    durs = sorted(p["batchDuration"] / 1000.0 for p in tail)
    last = progresses[-1]
    state = last.get("stateOperators") or []
    wm = (last.get("eventTime") or {}).get("watermark")
    out = {
        "n_batches": len(progresses),
        "n_steady_batches": len(tail),
        "sustained_rows_per_sec": round(sum(proc) / len(proc), 1),
        "input_rows_per_sec": round(sum(inp) / len(inp), 1),
        "input_vs_processed": round(
            (sum(inp) / len(inp)) / max(sum(proc) / len(proc), 1e-9), 3
        ),
        "batch_sec_p50": round(durs[len(durs) // 2], 3),
        "batch_sec_p95": round(durs[min(len(durs) - 1, int(len(durs) * 0.95))], 3),
        "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
        "state_mem_bytes": sum(s.get("memoryUsedBytes", 0) for s in state),
        "output_rows_last_batch": sum(
            s.get("numRowsUpdated", 0) for s in state
        ),
    }
    if wm:
        try:
            out["watermark_lag_sec"] = round(wall_end - _iso_to_epoch(wm), 1)
        except ValueError:
            out["watermark_lag_sec_raw"] = wm
    return out


def run_leg(spark, job: str, rate: int, duration: int) -> dict:
    df = build_job(spark, job, rate)
    q = (
        df.writeStream.format("noop")
        .option(
            "checkpointLocation",
            f"/tmp/bench_streaming_ckpt/{job}_{rate}_{int(time.time())}",
        )
        .outputMode("append")
        .start()
    )
    try:
        time.sleep(duration)
        # StreamingQueryProgress is a dict subclass with a .json str
        # property; normalize to plain dicts either way.
        progresses = [
            json.loads(p.json) if isinstance(getattr(p, "json", None), str) else dict(p)
            for p in q.recentProgress
        ]
        wall_end = time.time()
    finally:
        q.stop()
    res = summarize(progresses, wall_end)
    res["rate_rows_per_sec"] = rate
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--rates", default="20000,100000")
    ap.add_argument("--duration", type=int, default=45)
    ap.add_argument("--jobs", default="sessionize,interval_join")
    args = ap.parse_args()

    from employee_analytics_etl_spark.session import build_session

    spark = build_session(app_name="bench-streaming")
    master = spark.sparkContext.master
    result: dict = {
        "master": master,
        "duration_sec_per_leg": args.duration,
        "skip_batches": SKIP_BATCHES,
        "user_cardinality": {
            "sessionize": USER_CARD_SESSION,
            "interval_join": USER_CARD_JOIN,
        },
        "loadavg_start": list(os.getloadavg()),
        "note": (
            "rate-source input is synthesized in-JVM (isolates operator "
            "cost, no source I/O); event time is wall clock so "
            "watermark_lag_sec measures end-to-end keep-up. "
            "input_vs_processed > 1 sustained = cannot keep up."
        ),
        "jobs": {},
    }
    for job in args.jobs.split(","):
        result["jobs"][job] = {}
        for rate in (int(r) for r in args.rates.split(",")):
            print(f"[{job} @ {rate}/s x {args.duration}s on {master}] ...")
            leg = run_leg(spark, job, rate, args.duration)
            result["jobs"][job][str(rate)] = leg
            print(f"    -> {leg}")
    result["loadavg_end"] = list(os.getloadavg())
    spark.stop()
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
