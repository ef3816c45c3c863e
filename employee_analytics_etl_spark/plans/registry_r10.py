"""Round-10 additions.

Headline entry: `doc_exact_substring_runs` — the maximal-run view of
exact cross-document substring dedup (VERDICT r9 ask #6). The r9
`doc_exact_substring_dedup` audits at k-window granularity
(position-union token counts); this coalesces adjacent/overlapping
non-canonical duplicated windows into maximal runs (islands-and-gaps),
matching Lee et al.'s "remove every duplicated substring >= k tokens"
span semantics one level closer: a long verbatim copy is ONE run with
its true token length, not a pile of window hits. Operator:
operators/dedup.py: exact_substring_runs.

Registered into the same QUERIES/ORACLE dicts as plans.registry.
Import side effects: importing this module populates the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import exact_substring_runs
from .registry import query, t

_RUN_K = 20  # same window length as doc_exact_substring_dedup — the
# two views of one dedup decision must agree on what "duplicated" means


@query(
    "doc_exact_substring_runs",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    occ AS (
      SELECT doc_id, CAST(i.i AS INT) AS pos,
             md5(array_to_string(w[(i.i + 1):(i.i + {_RUN_K})], ' ')) AS dig
      FROM d, UNNEST(range(0, CAST(greatest(len(w) - {_RUN_K - 1}, 0) AS BIGINT))) AS i(i)
    ),
    marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY dig) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY dig ORDER BY doc_id, pos) AS rn
      FROM occ
    ),
    dup AS (SELECT doc_id, pos FROM marked WHERE cnt >= 2 AND rn > 1),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  > {_RUN_K} THEN 1 ELSE 0 END AS brk
      FROM dup
    ),
    runs AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_idx
      FROM isl
    )
    SELECT doc_id,
           CAST(run_idx AS BIGINT) AS run_idx,
           CAST(MIN(pos) AS BIGINT) AS run_start,
           CAST(MAX(pos) + {_RUN_K - 1} AS BIGINT) AS run_end,
           CAST(MAX(pos) + {_RUN_K - 1} - MIN(pos) + 1 AS BIGINT) AS run_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM runs GROUP BY doc_id, run_idx
    """,
)
def doc_exact_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated runs per document (Lee et al. ExactSubstr
    span semantics at k-token window resolution): one row per
    coalesced run of non-canonical duplicated windows — run_start/
    run_end inclusive token positions, run_tokens the exact cut
    length, n_windows the windows merged. Same digest-shuffle plan as
    doc_exact_substring_dedup plus a per-document (partitioned, never
    global) islands-and-gaps window over the duplicated occurrences
    only. See operators.dedup.exact_substring_runs."""
    docs = t(spark, sf_dir, "documents")
    return exact_substring_runs(docs, k=_RUN_K)


@query(
    "semdedup_embedding_prune",
    oracle="""
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
        + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
        + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
        + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cell
      FROM embeddings
    ),
    drp AS (
      SELECT DISTINCT b.vec_id
      FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    )
    SELECT c.vec_id, CAST(c.cell AS INT) AS cell,
           (drp.vec_id IS NULL) AS kept
    FROM c LEFT JOIN drp ON c.vec_id = drp.vec_id
    """,
)
def semdedup_embedding_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): bucket embeddings into clusters, compare pairs
    ONLY within a cluster, and prune dominated near-duplicates.
    Returns one row per vector: (vec_id, cell, kept) — a vector is
    pruned iff ANY smaller-id vector in its cell has round(cosine, 6)
    >= 0.4, including a smaller-id vector that was itself pruned
    (transitive over-pruning vs the paper's one-per-neighborhood
    reading — the deliberate SQL-expressible rule; the oracle encodes
    identical semantics).

    Determinism: the paper clusters with k-means and keeps the member
    farthest from the centroid; both choices are float-accumulation-
    order-dependent cross-engine, so this variant substitutes the two
    deterministic stand-ins the registry already trusts — sign-bit
    cells (the knn_ivf_cosine partitioning: first 4 dims' signs, 16
    cells) and a keep-lowest-id rule (the paper reports keeping
    random/low/high-similarity members within eps-clusters changes
    results marginally; the rule is the documented degree of freedom).
    That makes the whole decision EXACTLY SQL-expressible — a full
    value-hash oracle instead of the bounds-style one the kmeans
    queries carry.

    Scale shape: cells are scan-side bit arithmetic (no shuffle); the
    only quadratic term is the in-cell pair join — exactly SemDeDup's
    design point (cluster count bounds pair cost; at 100 TB raise the
    sign-bit count so cells stay bounded, the same capacity lever as
    the LSH band width) — and it is BUDGETED like every pair scorer in
    the family: operators.dedup.semdedup_prune runs
    assert_blocked_pair_budget on the cells eagerly and raises naming
    the hot cells instead of launching a silent quadratic job."""
    from ..operators.dedup import semdedup_prune

    emb = t(spark, sf_dir, "embeddings")
    return semdedup_prune(emb, "vec_id", "embedding").select(
        F.col("id").alias("vec_id"), "cell", "kept"
    )
