"""Distributed frequent-items (heavy hitters) — candidate-generate →
exact-verify, the same two-phase split as MinHash→Jaccard.

Exact frequency counting of a high-cardinality item stream (corpus
tokens, URLs, user ids) via a full groupBy shuffles every distinct item;
at 100 TB the long tail dominates the exchange while only the head
matters. The scalable plan:

Phase 1 — candidates: one scan; each partition maintains a mergeable
Misra-Gries summary of k counters (Agarwal et al., "Mergeable
Summaries", PODS'12: merge = add counts, keep the k largest, subtract
the (k+1)-st largest). An MG summary with k counters underestimates any
item's partition count by at most n_p/(k+1), so every item with global
count > n/(k+1) — in particular every item over the n/k threshold —
must exceed the MG error bound in at least one partition (pigeonhole)
and therefore survives in that partition's candidate set: the union of
per-partition candidates provably contains ALL global heavy hitters.
At most k·partitions candidate rows leave phase 1.

Phase 2 — exact verify: one more scan, semi-joined (broadcast) against
the candidate set, exact groupBy counts of candidates ONLY, threshold
cut count·k > n. The shuffle carries just candidate-item rows — head-
sized, not tail-sized. Output counts are EXACT (oracle: plain SQL
GROUP BY + HAVING), the approximation only ever touched candidate
GENERATION — a superset, never the answer.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: Counter, batch_counts: Counter, k: int) -> Counter:
    """Mergeable-summaries MG merge: sum, keep top-k, subtract (k+1)-st."""
    counters.update(batch_counts)
    if len(counters) > k:
        top = counters.most_common(k + 1)
        cut = top[k][1]  # (k+1)-st largest count
        counters = Counter(
            {item: c - cut for item, c in top[:k] if c - cut > 0}
        )
    return counters


def mg_candidates(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Phase 1: per-partition Misra-Gries candidate items (plus one
    row-count row per partition, item NULL, so the total rides the same
    scan). Output schema: (item string, n_rows long)."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: Counter = Counter()
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            if len(pdf):
                vc = pdf[item_col].value_counts()
                counters = _mg_merge(
                    counters, Counter(dict(zip(vc.index, vc.to_numpy()))), k
                )
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "n_rows": [None] * len(counters) + [n_rows],
            }
        )

    return df.select(F.col(item_col).alias(item_col)).mapInPandas(
        op, schema="item string, n_rows long"
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 50,
) -> DataFrame:
    """EXACT counts of every item with frequency > n/k, computed with
    two scans and a candidate-only shuffle (module docstring has the
    completeness proof). Output: (item, cnt) — deterministic, exact.
    """
    phase1 = mg_candidates(df, item_col, k)
    # internal alias: the caller's item_col may itself be "item", which
    # would make the semi-join condition ambiguous
    cands = (
        phase1.filter(F.col("item").isNotNull())
        .select(F.col("item").alias("_hh_cand"))
        .distinct()
    )
    total = phase1.agg(F.sum("n_rows").alias("n_total"))
    exact = (
        df.join(
            F.broadcast(cands), F.col(item_col) == F.col("_hh_cand"), "left_semi"
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select("item", "cnt")
    )
