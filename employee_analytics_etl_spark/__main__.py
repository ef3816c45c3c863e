"""CLI entry points mirroring the reference's four scripts
(SURVEY.md §3: main.py / load.py / transform.py / extract.py):

    python -m employee_analytics_etl_spark run        --raw-dir D --out O
    python -m employee_analytics_etl_spark transform  --raw-dir D
    python -m employee_analytics_etl_spark validate   --raw-dir D
    python -m employee_analytics_etl_spark report     --raw-dir D --out O
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="employee_analytics_etl_spark")
    p.add_argument("command", choices=["run", "transform", "validate", "report"])
    p.add_argument("--raw-dir", required=True, help="directory of <table>.csv inputs")
    p.add_argument("--out", default="out", help="output directory")
    p.add_argument("--as-of", default="2025-12-29", help="pinned as_of date (ISO)")
    p.add_argument("--jdbc-url", default=None)
    args = p.parse_args(argv)

    from .config import PipelineConfig
    from .plans.pipeline import run_pipeline
    from .session import build_session

    conf = PipelineConfig(
        raw_dir=args.raw_dir,
        processed_dir=os.path.join(args.out, "processed") if args.command in ("run", "report") else "",
        report_path=os.path.join(args.out, "reports", "etl_summary_report.txt")
        if args.command in ("run", "report")
        else "",
        as_of=dt.date.fromisoformat(args.as_of),
        jdbc_url=args.jdbc_url,
    )
    spark = build_session(app_name=f"eae-{args.command}")
    res = run_pipeline(spark, conf)

    if args.command == "transform":
        for name, df in res["outputs"].items():
            print(f"== {name} ==")
            df.show(3, truncate=False)
    elif args.command == "validate":
        print(json.dumps({k: v for k, v in res["dq"].items()}, indent=2, default=str))
    else:
        print(res["report"])
        print(json.dumps(res["timings"], indent=2), file=sys.stderr)
    spark.stop()
    return 0 if res["dq"]["critical_issues"] == 0 else 2


if __name__ == "__main__":
    raise SystemExit(main())
