"""Same-session interleaved A/B of two trees' headline benches.

VERDICT r9 ask #1: the r8->r9 idle-record drift (51.0 -> 60.7 s, spread
~uniformly over untouched queries) was ATTRIBUTED to a slower ambient
host but never proven — no same-session old-tree-vs-new-tree run was
recorded, so the two records are not comparable. This harness settles
such questions the only way that controls for the host: check out both
trees as git worktrees, run their benches interleaved A/B/A/B within
ONE session (same machine state, same config, minutes apart), and
compare per-query minima on the common query set.

Usage:
    python tools/ab_bench.py LABEL_A:PATH_A LABEL_B:PATH_B OUT.json \
        [--sf-dir /root/testdata/sf0.1] [--reps 2] [--cpus 32]

Each rep runs A's bench then B's bench (cwd = the tree, so each tree
executes its own registry/bench code). Per tree per query the recorded
time is the min over reps of the bench's own min-of-3 — 6 samples per
query per tree at the defaults. The verdict line classifies the result:
trees within noise (median ratio in [0.93, 1.08] over common queries)
=> host drift proven; otherwise the named queries carry a real
regression and their plans need diffing.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_bench(tree: str, sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # The bench prints exactly one result JSON line; other '{'-prefixed
    # stdout (log4j noise, partial progress) must not be mistaken for
    # it — scan candidates newest-first and validate the shape.
    d = None
    for line in reversed(out.splitlines()):
        if not line.strip().startswith("{"):
            continue
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(cand, dict) and isinstance(cand.get("queries"), dict) \
                and "value" in cand:
            d = cand
            break
    if d is None:
        raise RuntimeError(
            f"bench in {tree} printed no valid result JSON line "
            "(expected a dict with 'queries' and 'value')"
        )
    d["_wall"] = round(time.time() - t0, 1)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a", help="LABEL:PATH of tree A")
    ap.add_argument("b", help="LABEL:PATH of tree B")
    ap.add_argument("out", help="output JSON path")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()
    (la, pa), (lb, pb) = (x.split(":", 1) for x in (args.a, args.b))
    if la == lb:
        # Identical labels would merge both trees into one `best` bucket
        # and yield a degenerate ratio-1.0 "within noise" verdict.
        ap.error(f"labels must differ (both are {la!r})")

    runs: list[dict] = []
    for rep in range(args.reps):
        for label, path in ((la, pa), (lb, pb)):
            load0 = os.getloadavg()
            print(
                f"[rep {rep + 1}/{args.reps}] {label} @ {path} "
                f"(loadavg {load0[0]:.2f}) ...",
                flush=True,
            )
            d = run_bench(path, args.sf_dir, args.cpus)
            runs.append(
                {
                    "rep": rep,
                    "label": label,
                    "loadavg_start": list(load0),
                    "load_warning": bool(d.get("load_warning")),
                    "value": d.get("value"),
                    "n_queries": d.get("n_queries"),
                    "queries": d.get("queries"),
                    "wall": d.get("_wall"),
                }
            )
            print(
                f"    -> total {d.get('value')} s over "
                f"{d.get('n_queries')} queries "
                f"(load_warning={d.get('load_warning')})",
                flush=True,
            )

    best: dict[str, dict[str, float]] = {la: {}, lb: {}}
    for r in runs:
        for q, v in (r["queries"] or {}).items():
            cur = best[r["label"]].get(q)
            best[r["label"]][q] = v if cur is None else min(cur, v)
    common = sorted(set(best[la]) & set(best[lb]))
    per_query = {
        q: {
            la: best[la][q],
            lb: best[lb][q],
            "ratio": round(best[lb][q] / best[la][q], 3),
        }
        for q in common
    }
    ratios = [per_query[q]["ratio"] for q in common]
    med = statistics.median(ratios) if ratios else None
    tot_a = round(sum(best[la][q] for q in common), 3)
    tot_b = round(sum(best[lb][q] for q in common), 3)
    within_noise = med is not None and 0.93 <= med <= 1.08
    outliers = {
        q: per_query[q]
        for q in common
        if per_query[q]["ratio"] > 1.25 or per_query[q]["ratio"] < 0.8
    }
    result = {
        "experiment": (
            f"interleaved A/B ({args.reps} reps each, alternating) of "
            f"{la} vs {lb} headline benches at {args.sf_dir}, one session, "
            "per-query min across reps of each bench's min-of-3"
        ),
        "trees": {la: pa, lb: pb},
        "n_common": len(common),
        "common_total": {la: tot_a, lb: tot_b},
        "median_ratio": med,
        "verdict": (
            "trees within noise — cross-round record drift is HOST, not code"
            if within_noise
            else "trees differ — named outliers carry a real code delta"
        ),
        "outlier_queries": outliers,
        "per_query": per_query,
        "any_load_warning": any(r["load_warning"] for r in runs),
        "runs": [
            {k: v for k, v in r.items() if k != "queries"} for r in runs
        ],
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(
        f"\n{la}={tot_a}s {lb}={tot_b}s over {len(common)} common queries; "
        f"median ratio {med}; {result['verdict']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
