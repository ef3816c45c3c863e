"""Parquet compression-codec A/B: write the lineitem fact with
snappy vs zstd, record bytes on disk and write/scan wall — the
storage-layer lever that matters at 100 TB (zstd typically buys
~25-35% smaller files for a small CPU premium; smaller files =
fewer IO bytes = faster cold scans). Run:

    python tools/codec_experiment.py [sf_dir]

Prints one JSON line per codec. Results land in PERF.md."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from employee_analytics_etl_spark.session import build_session

    spark = build_session(app_name="codec_experiment")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()  # warm the source scan
    for codec in ("snappy", "zstd"):
        out = tempfile.mkdtemp(prefix=f"codec_{codec}_")
        try:
            t0 = time.time()
            li.write.mode("overwrite").option(
                "compression", codec
            ).parquet(out)
            t1 = time.time()
            back = spark.read.parquet(out)
            n = back.count()
            t2 = time.time()
            print(
                json.dumps(
                    {
                        "codec": codec,
                        "bytes": du(out),
                        "write_sec": round(t1 - t0, 2),
                        "scan_sec": round(t2 - t1, 2),
                        "rows": n,
                    }
                )
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
