"""Round-9 additions.

The headline entry is the one canonical LLM-corpus dedup operator the
registry didn't yet carry first-class: exact cross-document SUBSTRING
dedup (Lee et al., arXiv:2107.06499) — `doc_chunk_exact_dedup` handles
fixed chunk granularity, but production corpus dedup cuts any >= k-token
span shared anywhere in the corpus. `operators/dedup.py:
exact_substring_spans` is the distributable form (k-token rolling
windows -> span-digest groupBy -> non-canonical occurrences cut,
position-union); this module registers its oracle-gated audit query.

Registered into the same QUERIES/ORACLE dicts as plans.registry.
Import side effects: importing this module populates the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import exact_substring_spans
from .registry import query, t

_SPAN_K = 20  # Lee et al. use 50 tokens on web corpora; the synthetic
# documents average ~54 tokens, so 20 keeps the same "substantial
# span" shape while the corpus still contains non-trivial duplication
# (sf0.01: ~750 duplicated 20-token windows across 500 docs).


@query(
    "doc_exact_substring_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    base AS (
      SELECT doc_id, len(w) AS n_tokens,
             greatest(len(w) - {_SPAN_K - 1}, 0) AS n_spans
      FROM d
    ),
    occ AS (
      SELECT doc_id, CAST(i.i AS INT) AS pos,
             md5(array_to_string(w[(i.i + 1):(i.i + {_SPAN_K})], ' ')) AS dig
      FROM d, UNNEST(range(0, CAST(greatest(len(w) - {_SPAN_K - 1}, 0) AS BIGINT))) AS i(i)
    ),
    marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY dig) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY dig ORDER BY doc_id, pos) AS rn
      FROM occ
    ),
    dup AS (SELECT doc_id, pos, rn FROM marked WHERE cnt >= 2),
    dps AS (SELECT doc_id, COUNT(*) AS dup_spans FROM dup GROUP BY doc_id),
    rem AS (
      SELECT doc_id, COUNT(DISTINCT p) AS removed_tokens
      FROM (SELECT doc_id, pos + j.j AS p
            FROM dup, UNNEST(range(0, {_SPAN_K})) AS j(j)
            WHERE rn > 1)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_spans AS BIGINT) AS n_spans,
           CAST(COALESCE(s.dup_spans, 0) AS BIGINT) AS dup_spans,
           CAST(COALESCE(r.removed_tokens, 0) AS BIGINT) AS removed_tokens,
           CAST(b.n_tokens - COALESCE(r.removed_tokens, 0) AS BIGINT) AS kept_tokens,
           ROUND(CAST(b.n_tokens - COALESCE(r.removed_tokens, 0) AS DOUBLE)
                 / b.n_tokens, 6) AS kept_ratio
    FROM base b
    LEFT JOIN dps s USING (doc_id)
    LEFT JOIN rem r USING (doc_id)
    """,
)
def doc_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document audit of exact >= k-token substring dedup (Lee et
    al. ExactSubstr at k-granularity): which token positions survive
    after every non-canonical occurrence of a corpus-duplicated
    20-token window is cut. kept_ratio is the post-dedup retention a
    corpus-curation pipeline reports before committing the cut.

    No tie hazard in kept_ratio's 6-dp rounding: a/b with b <= 99 can
    only produce an exact 5 in the 7th decimal if b has a 2^7 or 5^7
    factor (b | 10^7, b not| 10^6) — impossible below 128."""
    return exact_substring_spans(t(spark, sf_dir, "documents"), k=_SPAN_K)
