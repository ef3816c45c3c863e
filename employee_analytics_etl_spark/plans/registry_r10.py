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
