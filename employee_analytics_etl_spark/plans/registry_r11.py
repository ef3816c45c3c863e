"""Round-11 additions.

Headline entry: `dedup_candidate_levenshtein` — the composed
candidate-first edit-distance pipeline (VERDICT r10 ask #3): lossless
prefix-filter SSJoin candidates → banded-Levenshtein verify. This is
the scale path BENCH_heavy100_r10.json names for the density where
`dedup_levenshtein_pairs`' (lang, source, length-band) blocking
saturates its pair budget: candidate volume tracks true near-dup
density, not block-size squares, so the composed form completes at
factor-100 where the blocked form (correctly) refuses at the default
budget. Operator: operators/dedup.py: candidate_levenshtein_pairs.

Registered into the same QUERIES/ORACLE dicts as plans.registry.
Import side effects: importing this module populates the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.partitioning import fan_out
from .registry import query, t


@query(
    "dedup_candidate_levenshtein",
    oracle="""
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
            / (sa.sz + sb.sz - i.intersection) >= 0.3
    )
    SELECT c.id_a AS doc_id_a, c.id_b AS doc_id_b, c.jaccard,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev_dist
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    WHERE levenshtein(da.text, db.text)
          <= greatest(length(da.text), length(db.text)) * 10 / 100
    """,
)
def dedup_candidate_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-first edit-distance linkage: lossless prefix-filter
    SSJoin (5-gram Jaccard >= 0.3) generates candidates, banded
    Levenshtein (<= 10% of the longer text) verifies — the composed
    scale path for blocking densities where `dedup_levenshtein_pairs`'
    pair budget saturates (BENCH_heavy100_r10.json: 442M blocked pairs
    at factor-100 vs candidates tracking true near-dup density). The
    0.3 floor sits just under the q-gram count-filter bound for 10%
    relative distance with 5-grams (Gravano et al. VLDB'01): one edit
    disturbs <= 5 shingles, so d = 0.1·len gives J >= 1/3. Unlike the
    blocked form, NO block key is needed — cross-lang / cross-source
    near-identical texts are found too. Short documents (< 5 tokens)
    fall back to ONE whole-text shingle (`short_whole_text=True`,
    r11 ADVICE #1) so short exact/near-exact duplicates — which a
    pure 5-gram generator structurally excludes — still pair; the
    oracle's UNION arm encodes the identical fallback, so the compare
    exercises it rather than sharing the exclusion. The oracle
    recomputes the
    brute-force share-a-shingle candidate set and full-DP Levenshtein;
    matching it exactly proves both the prefix generator's
    completeness at the floor AND the banded verifier's exactness.
    See operators.dedup.candidate_levenshtein_pairs."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    return D.candidate_levenshtein_pairs(
        docs, "doc_id", "text", n=5, jaccard_floor=0.3, max_rel_dist_pct=10
    )


@query(
    "media_mp3_stream_stats",
    oracle="""
    WITH audio AS (
      SELECT doc_id, 3 + doc_id % 5 AS n,
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  ELSE 32000 END AS rate
      FROM documents WHERE doc_id % 4 = 1
    ),
    fr AS (
      SELECT doc_id, n, rate,
             list_value(32,40,48,56,64,80,96,112,128,
                        160,192,224,256,320)[
               CAST(CASE WHEN (doc_id // 4) % 2 = 0
                    THEN 1 + (doc_id + u.f) % 14
                    ELSE 1 + doc_id % 14 END AS INT)] AS kbps
      FROM audio, UNNEST(range(0, n)) AS u(f)
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(MAX(n) AS INT) AS n_frames,
           CAST(MAX(rate) AS INT) AS sample_rate,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END AS INT)
             AS channels,
           (doc_id % 3 = 0) AS has_id3v2,
           ROUND(MAX(n) * 1152.0 / MAX(rate), 6) AS duration_sec,
           CAST(SUM(kbps) AS BIGINT) AS total_kbps,
           (COUNT(DISTINCT kbps) > 1) AS is_vbr
    FROM fr GROUP BY doc_id
    """,
)
def media_mp3_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL MP3 frame-header parse under the driver gate
    (r11, closing the loudest real-codec boundary at the structure
    level): synthesize a deterministic header-true MPEG-1 Layer III
    stream per 'audio' doc (n = 3 + id%5 frames; sample rate by id%3;
    mono iff id%5=0; VBR frame-bitrate walk 1+(id+f)%14 iff
    (id//4)%2=0 else CBR at 1+id%14; ID3v2 tag iff id%3=0; trailing
    ID3v1 on VBR streams), push it through the pure-Python header
    walker (operators/codecs.py:parse_mp3_frames — sync validation,
    ID3 skip, exact frame-length hop arithmetic) via
    multimodal.mp3_stream_stats, and emit per-stream structure stats
    the oracle re-derives arithmetically from the same id recurrences.
    A mis-sized frame hop, a wrong bitrate-table row, or a broken ID3
    skip desynchronizes the walk and cannot match. CONTRACT DEPENDENCY
    (r11 verdict note, made explicit r12): because the oracle and the
    in-query generator share the id recurrences, this oracle proves the
    PARSER only while the SYNTHESIZER is independently pinned — the
    spec-strictness/round-trip pytest
    (tests/test_r11_queries.py::TestMp3HeaderParse and
    tests/test_r12_queries.py::TestMp3Id3Footer) is load-bearing for
    this query's gate, not auxiliary; weakening it would let a
    matched-but-wrong encoder/parser pair through. Full PCM decode of
    the Huffman audio payload remains the documented
    NotImplementedError boundary; this query is the triage pass a
    100 TB audio corpus runs before any decode."""
    from ..operators import multimodal as MM

    def gen(batches):
        import pandas as pd

        from ..operators.codecs import encode_mp3_frame_stream

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 3 + did % 5
                vbr = (did // 4) % 2 == 0
                idxs = [
                    1 + (did + f) % 14 if vbr else 1 + did % 14
                    for f in range(n)
                ]
                ids.append(did)
                payloads.append(
                    encode_mp3_frame_stream(
                        idxs,
                        rate_idx=did % 3,
                        mono=did % 5 == 0,
                        id3_size=17 if did % 3 == 0 else None,
                        id3v1=vbr,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": ["audio"] * len(ids),
                    "payload": payloads,
                }
            )

    docs = fan_out(
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 1)
        .select("doc_id")
    )
    media = docs.mapInPandas(
        gen, schema="media_id long, kind string, payload binary"
    )
    stats = MM.mp3_stream_stats(media)
    return stats.withColumn("duration_sec", F.round("duration_sec", 6))
