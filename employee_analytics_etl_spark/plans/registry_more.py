"""Round-3 session-B additions: graph analytics beyond PageRank,
autocorrelation, target encoding, chunk-level exact-substring dedup
(Lee et al. shape), and md5-derandomized sketches (count-min, Bloom
join pruning) whose estimates are EXACTLY reproducible in the DuckDB
oracle because both engines compute the identical md5-derived hashes.

Graph base: the part co-purchase graph — two parts are linked when
they appear in the same order. Per-order fan-out is bounded by order
size (≤7 lineitems in TPC-H-shaped data), so edge construction is
linear in lineitem at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import graph as G
from .registry import query, t

# Shared DuckDB CTE: canonical part co-purchase edges + degrees.
_EDGES_SQL = """
    e AS (
      SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) part co-purchase edge set. Self-join on
    l_orderkey: sort-merge on the order key, per-order fan-out is
    C(items, 2) ≤ C(7, 2) — linear in lineitem, no hub blow-up."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1, l2 = li.alias("l1"), li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(F.col("l1.l_partkey").alias("u"), F.col("l2.l_partkey").alias("v"))
        .distinct()
    )


@query(
    "graph_triangle_stats",
    oracle=f"""
    WITH {_EDGES_SQL},
    tri AS (
      SELECT COUNT(*) AS n_tri
      FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
           JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(n_tri AS BIGINT) FROM tri) AS n_triangles,
           (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           ROUND(3.0 * (SELECT n_tri FROM tri)
                 / (SELECT SUM(d * (d - 1) / 2) FROM deg), 9) AS global_clustering
    """,
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the part
    co-purchase graph via degree-oriented wedge enumeration
    (operators/graph.py:triangle_stats has the last-reducer scale
    notes). Exact integer counts → exact oracle; the oracle closes
    triangles with the simple a<b<c three-way join, which is fine at
    oracle scale but squares hub degrees — the Spark side is the
    100 TB shape."""
    return G.triangle_stats(_copurchase_edges(spark, sf_dir))


@query(
    "graph_degree_histogram",
    oracle=f"""
    WITH {_EDGES_SQL}
    SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY d
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first thing
    to look at before choosing a join/partition strategy on graph
    data (hub detection feeds the skew-salting decision the same way
    key_skew_profile does for relational keys)."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
