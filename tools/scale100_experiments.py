"""Factor-100 scale artifacts for the r10/r11 queries (VERDICT r10
asks #2 and #3).

Three experiments, one JSON artifact (BENCH_scale100_r11.json):

1. `semdedup_embedding_prune` at 100x vectors — the only new
   quadratic term r10 added (the in-cell pair join). The fixture is a
   dimension-PERMUTATION replication of the sf0.1 embeddings table
   (200k vectors): each replica r applies a seeded permutation of the
   64 dims, an orthogonal map, so WITHIN-replica pairwise cosines (and
   the true near-dup structure) are preserved exactly while
   cross-replica cosines are pseudo-random — near-dup density grows
   LINEARLY in factor, the honest construction (exact replication
   would make every 100-replica family mutually cos=1: a factor^2
   failure by data design, not by operator design). Demonstrates:
   (a) the default sign_bits=4 budget refusal naming hot cells,
   (b) the documented capacity lever — the smallest sign_bits whose
       exact in-cell pair count passes the 50M budget,
   (c) min-of-3 wall at that setting vs the 1x (sf0.1) wall.

2. `doc_exact_substring_runs` at the factor-100 full multifile layout
   (500k docs) — r9 proved the spans base plan sublinear at 100x; this
   covers the run-coalescing per-document window added in r10.

3. `dedup_candidate_levenshtein` (new r11) at the same factor-100
   layout — the composed candidate-first pipeline completing under
   budget at the exact density where blocked_levenshtein_pairs'
   default budget correctly refuses (BENCH_heavy100_r10.json).

Usage: python tools/scale100_experiments.py OUT.json
Writes the artifact and prints a one-line summary per experiment.
Run idle (loadavg < 2): wall-clock numbers are records.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

EMB100_DIR = "/tmp/spark_graft_emb100"
MULTIFILE100 = "/tmp/spark_graft_multifile100"
FACTOR = 100


def build_emb100(spark) -> str:
    """Write the 100x dimension-permutation embeddings table (cached)."""
    out = os.path.join(EMB100_DIR, "embeddings.parquet")
    manifest = os.path.join(EMB100_DIR, "_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f).get("factor") == FACTOR:
                return out
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    pdf = src.to_pandas()
    base = np.stack(pdf["embedding"].to_numpy())  # (n, 64)
    n, dim = base.shape
    os.makedirs(EMB100_DIR, exist_ok=True)
    frames = []
    for r in range(FACTOR):
        perm = np.random.RandomState(r).permutation(dim)
        rep = base[:, perm]
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy() + r * n,
                    "embedding": list(rep),
                }
            )
        )
    big = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False), out)
    with open(manifest, "w") as f:
        json.dump({"factor": FACTOR, "n": int(n * FACTOR), "dim": dim}, f)
    return out


def _probe_detail(msg: str) -> str:
    """Slice the budget detail ("sum(...)...") out of a semdedup
    refusal message; fall back to the raw message when the format
    doesn't carry the expected markers (r11 ADVICE #3 — find()
    returning -1 used to produce garbage slices). Always truncated to
    80 chars."""
    lo, hi = msg.find("sum("), msg.find("; worst")
    return (msg[lo:hi] if 0 <= lo < hi else msg)[:80]


def _require_passing(passing, probe: dict) -> int:
    """Fail loud when no sign_bits probe fit the pair budget — the
    timing legs would otherwise crash with an opaque TypeError from
    sign_bits=None (r11 ADVICE #3)."""
    if passing is None:
        raise RuntimeError(
            "semdedup factor-100: no sign_bits in range(5, 17) fit the "
            f"50M pair budget — probe results: {probe}"
        )
    return passing


def semdedup_experiment(spark) -> dict:
    from employee_analytics_etl_spark.operators.dedup import (
        clear_pair_budget_cache,
        semdedup_prune,
    )

    path = build_emb100(spark)
    emb = spark.read.parquet(path)
    n_vec = emb.count()
    result: dict = {"n_vectors": n_vec, "budget": 50_000_000}

    # (a) default sign_bits must refuse
    clear_pair_budget_cache()
    try:
        semdedup_prune(emb, "vec_id", "embedding", sign_bits=4)
        result["default_bits_refusal"] = "DID NOT RAISE — unexpected"
    except ValueError as exc:
        result["default_bits_refusal"] = str(exc)[:400]

    # (b) smallest sign_bits whose exact pair count passes
    passing = None
    probe: dict[int, str] = {}
    for bits in range(5, 17):
        clear_pair_budget_cache()
        try:
            semdedup_prune(emb, "vec_id", "embedding", sign_bits=bits)
            probe[bits] = "pass"
            passing = bits
            break
        except ValueError as exc:
            probe[bits] = _probe_detail(str(exc))
    result["bits_probe"] = {str(k): v for k, v in probe.items()}
    result["min_passing_sign_bits"] = passing
    passing = _require_passing(passing, result["bits_probe"])

    # (c) min-of-3 wall at the passing setting, plus the 1x baseline
    def run(df, bits):
        t0 = time.time()
        clear_pair_budget_cache()
        out = semdedup_prune(df, "vec_id", "embedding", sign_bits=bits)
        out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    run(base, 4)  # warm codegen
    result["wall_1x_bits4_s"] = min(run(base, 4) for _ in range(3))
    runs = [run(emb, passing) for _ in range(3)]
    result["wall_100x_runs_s"] = runs
    result["wall_100x_min_s"] = min(runs)
    kept = None
    clear_pair_budget_cache()
    out = semdedup_prune(emb, "vec_id", "embedding", sign_bits=passing)
    from pyspark.sql import functions as F

    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).first()
    result["rows_100x"] = agg["rows"]
    result["kept_100x"] = agg["kept"]
    return result


def bench_queries(queries: list[str], out_path: str) -> dict:
    """Run named registry queries at the factor-100 multifile layout
    through bench.py itself (same warmup + min-of-3 discipline)."""
    import subprocess

    env = dict(
        os.environ,
        SPARK_GRAFT_QUERIES=",".join(queries),
        SPARK_GRAFT_MULTIFILE_FACTOR=str(FACTOR),
        SPARK_GRAFT_MULTIFILE_DIR=MULTIFILE100,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py", "--layout", "multifile"],
        env=env,
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.strip().startswith("{"):
            d = json.loads(line)
            if isinstance(d.get("queries"), dict):
                return d
    raise RuntimeError(
        f"bench produced no result JSON; stderr tail: {proc.stderr[-2000:]}"
    )


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_scale100_r11.json"
    loadavg = os.getloadavg()
    from employee_analytics_etl_spark.session import build_session

    # factor>=30 bench defaults: 500 shuffle partitions (bench.py does
    # this itself for the multifile legs; the semdedup leg sets it here)
    spark = build_session(shuffle_partitions=500)
    artifact = {
        "experiment": (
            "factor-100 artifacts for the r10/r11 queries: semdedup sign_bits "
            "capacity lever on a 100x dim-permutation embeddings table; "
            "doc_exact_substring_runs and dedup_candidate_levenshtein at the "
            "factor-100 full multifile layout (500 partitions, 32g heap "
            "bench defaults). Single local JVM; cross-round wall-clock NOT "
            "comparable to other rounds' records (host drift — see "
            "BENCH_ab_r8r9_r10.json)."
        ),
        "loadavg_start": list(loadavg),
    }
    print("[1/3] semdedup 100x ...", flush=True)
    artifact["semdedup_embedding_prune_100x"] = semdedup_experiment(spark)
    spark.stop()
    print("[2/3] substring runs + [3/3] candidate levenshtein via bench ...",
          flush=True)
    bench = bench_queries(
        ["doc_exact_substring_runs", "dedup_candidate_levenshtein"], out_path
    )
    artifact["multifile100_bench"] = {
        "queries_runs": bench.get("queries_runs"),
        "queries_min": bench.get("queries"),
        "load_warning": bench.get("load_warning"),
        "startup_sec": bench.get("startup_sec"),
    }
    artifact["loadavg_end"] = list(os.getloadavg())
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact.get("multifile100_bench", {}).get("queries_min")))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
