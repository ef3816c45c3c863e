"""Round-12 additions.

The candidate-first verifier FAMILY (VERDICT r11 ask #7): round 11
proved the composed prefix-filter-candidates → banded-Levenshtein
pipeline completes at factor-100 density where the blocked form's pair
budget (correctly) refuses. Rounds' blocked Damerau / Jaro-Winkler
verifiers hit the same wall — these two queries prove the candidate
stage composes with the WHOLE verifier family behind the shared
`_candidate_text_pairs` shape: same lossless SSJoin candidates, a
different Arrow-batched scorer over only those candidates.
Operators: operators/dedup.py: candidate_damerau_pairs,
candidate_jaro_winkler_pairs.

Registered into the same QUERIES/ORACLE dicts as plans.registry.
Import side effects: importing this module populates the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as D
from ..operators.partitioning import fan_out
from .registry import query, t

# Shared candidate CTE text (0.25 / 0.3 floors differ per query): the
# oracle recomputes the brute-force share-a-shingle candidate set —
# with the r12 whole-text fallback arm for sub-5-token documents — so
# matching it proves the prefix generator's completeness at the floor,
# independently per verifier.
_CAND_CTE = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             array_to_string(list_slice(tk, i, i + 4), ' ') AS shingle
      FROM toks, UNNEST(range(1, len(tk) - 3)) AS u(i)
      WHERE len(tk) >= 5
      UNION
      SELECT doc_id AS id, array_to_string(tk, ' ') AS shingle
      FROM toks WHERE len(tk) BETWEEN 1 AND 4
    ),
    sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS intersection
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    cand AS (
      SELECT i.id_a, i.id_b,
             ROUND(CAST(i.intersection AS DOUBLE)
                   / (sa.sz + sb.sz - i.intersection), 6) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE CAST(i.intersection AS DOUBLE)
            / (sa.sz + sb.sz - i.intersection) >= {floor}
    )
"""


@query(
    "dedup_candidate_damerau",
    oracle=_CAND_CTE.format(floor="0.25")
    + """
    SELECT c.id_a AS doc_id_a, c.id_b AS doc_id_b, c.jaccard,
           CAST(damerau_levenshtein(da.text, db.text) AS BIGINT) AS dl_dist
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    WHERE damerau_levenshtein(da.text, db.text)
          <= greatest(length(da.text), length(db.text)) * 10 / 100
    """,
)
def dedup_candidate_damerau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-first DAMERAU linkage: the same lossless prefix-filter
    SSJoin candidate stage as `dedup_candidate_levenshtein`, verified
    by the transposition-aware Damerau DP (Arrow pandas_udf — Spark
    has no damerau builtin) instead of banded Levenshtein. The floor
    is 0.25, not 0.3: an adjacent transposition can straddle a token
    boundary and disturb n+1 = 6 shingles (vs n = 5 for a
    substitution), so the q-gram count-filter bound at d = 10%·len
    relaxes to J >= 0.4/1.6 = 0.25 (operator docstring derives it).
    Sub-5-token documents use the whole-text-shingle fallback; the
    oracle's UNION arm encodes it identically. The oracle's DuckDB
    `damerau_levenshtein` is the fuzz-verified twin of the Python
    kernel, so the value-hash match proves candidate completeness AND
    scorer exactness. See operators.dedup.candidate_damerau_pairs."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    return D.candidate_damerau_pairs(
        docs, "doc_id", "text", n=5, jaccard_floor=0.25, max_rel_dist_pct=10
    )


@query(
    "dedup_candidate_jaro_winkler",
    oracle=_CAND_CTE.format(floor="0.3")
    + """
    SELECT c.id_a AS doc_id_a, c.id_b AS doc_id_b, c.jaccard,
           ROUND(jaro_winkler_similarity(da.text, db.text), 6) AS jw_sim
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    WHERE jaro_winkler_similarity(da.text, db.text) >= 0.9
    """,
)
def dedup_candidate_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-first JARO-WINKLER linkage: prefix-filter SSJoin
    candidates scored by the DuckDB-exact Jaro-Winkler pandas_udf,
    keeping pairs with jw >= 0.9. Unlike the edit-distance
    compositions there is NO count-filter theorem tying min_sim to a
    Jaccard floor (JW is not edit-bounded) — the 0.3 floor is the
    standard record-linkage blocking contract (Christen 2012),
    surfaced and documented in the operator docstring rather than
    hidden; the oracle applies the SAME floor, so the compare proves
    the declared semantics exactly (floor AND scorer), not an
    unblocked all-pairs JW. See
    operators.dedup.candidate_jaro_winkler_pairs."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    return D.candidate_jaro_winkler_pairs(
        docs, "doc_id", "text", n=5, jaccard_floor=0.3, min_sim=0.9
    )
