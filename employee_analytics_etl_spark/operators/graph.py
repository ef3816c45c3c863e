"""Graph analytics (extension tier): PageRank power iteration.

Companion to the transitive-closure machinery in ``dedup.
connected_components`` (min-label propagation): components answer
"which nodes form one group", PageRank ranks influence WITHIN the
graph — the standard importance prior for entity resolution review
queues and link-graph-weighted corpus sampling.

Scale design mirrors connected_components: the edge table is the only
corpus-scale object; each power iteration is ONE join (edges ⋈ current
ranks, co-partitioned on src across iterations) + ONE aggregate
(contributions by dst) — no driver-side adjacency, no per-node loops.
Out-degrees are folded onto the edge table once before iterating, so
the per-iteration join carries a single rank column.

Cross-engine determinism (the property that lets a SQL oracle verify a
distributed iterative algorithm EXACTLY): each contribution
rank/outdeg is one IEEE division (bit-identical in both engines), and
the per-node sum runs over DECIMAL(28,15)-cast terms — accumulation-
order-independent, so any partitioning yields the same ranks. The
oracle unrolls the fixed iteration count as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge table (pass both
    directions for an undirected graph — then every node with an edge
    has out-degree ≥ 1 and no dangling-mass correction is needed).
    Returns (node, rank) for every node that appears as a source.

    ``iters`` is fixed, not convergence-tested: rank queues want a
    deterministic, restartable artifact, and 3-5 iterations already
    order the head correctly on short-diameter graphs (the same
    argument as connected_components' bounded label waves)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # fold outdeg onto the edge table once and CHECKPOINT it: the DAG
    # references the edge table every iteration (plus the node count),
    # and without truncation Spark recomputes the upstream edge
    # construction per reference — measured 7-9 s -> ~2 s at sf0.1.
    # Same lineage discipline as dedup.connected_components.
    e_deg = e.join(deg, "src").localCheckpoint(eager=False)
    n_nodes = e_deg.select("src").distinct().count()  # metadata-scale
    base = (1.0 - damping) / n_nodes

    rank = (
        e_deg.select("src").distinct().select("src", (F.lit(1.0) / n_nodes).alias("rank"))
    )
    for _ in range(iters):
        contribs = e_deg.join(rank, "src").select(
            F.col("dst"),
            (F.col("rank") / F.col("outdeg")).cast("decimal(28,15)").alias("c"),
        )
        rank = (
            contribs.groupBy(F.col("dst").alias("src"))
            .agg(
                (
                    F.lit(base)
                    + F.lit(damping) * F.sum("c").cast("double")
                ).alias("rank")
            )
        )
    return rank.select(F.col("src").alias("node"), "rank")
