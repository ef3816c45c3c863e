"""Round-11 regression tests: the four r10 ADVICE findings.

1 (low) blocked_levenshtein_pairs with max_pairs=None is plan-only at
  construction (no eager max-length aggregate — matching
  assert_blocked_pair_budget's documented escape hatch) and falls back
  to the full-DP verifier; with a budget the banded form still matches.
2 (low) semdedup_prune cell bits coalesce NULL embedding elements to 0
  (the oracle's CASE WHEN ... ELSE 0), instead of yielding a NULL cell
  that silently excludes the row from all pairs.
3 (low) semdedup_prune docstring states the dominated-by-smaller-id
  rule (transitive over-pruning possible), not "one representative per
  epsilon-neighborhood" — pinned behaviorally: the 1-2, 2-3 chain with
  cos(1,3) < t drops BOTH 2 and 3.
4 (low) tools/ab_bench.py rejects identical labels and validates the
  parsed bench JSON shape instead of trusting the last '{' line.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from employee_analytics_etl_spark.operators.dedup import (
    blocked_levenshtein_pairs,
    semdedup_prune,
)


class TestLevenshteinNoneBudgetPlanOnly:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
                (2, "the quick brown fox jumps over the lazy hog", "en", "web"),
                (3, "completely different text with no resemblance", "en", "web"),
                (4, "kurzer deutscher text", "de", "web"),
            ],
            ["doc_id", "text", "lang", "source"],
        )

    def test_none_budget_runs_no_eager_job(self, spark, monkeypatch):
        """max_pairs=None must keep construction plan-only: neither the
        pair-budget check nor the max-length aggregate may execute."""
        docs = self._docs(spark)
        cls = type(docs)
        firsts: list[str] = []
        orig = cls.first

        def spy(self, *a, **kw):
            firsts.append("first")
            return orig(self, *a, **kw)

        monkeypatch.setattr(cls, "first", spy)
        monkeypatch.setattr(
            cls, "collect", lambda self, *a, **kw: firsts.append("collect")
        )
        blocked_levenshtein_pairs(docs, max_pairs=None)
        assert firsts == [], (
            "construction with max_pairs=None must not run any eager "
            f"aggregate, saw {firsts}"
        )

    def test_none_budget_matches_banded_result(self, spark):
        docs = self._docs(spark)
        banded = {
            tuple(r)
            for r in blocked_levenshtein_pairs(docs, max_pairs=10_000).collect()
        }
        full = {
            tuple(r)
            for r in blocked_levenshtein_pairs(docs, max_pairs=None).collect()
        }
        assert banded == full == {(1, 2, 1)}


class TestSemdedupNullBits:
    _schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def test_null_leading_element_gets_cell_not_null(self, spark):
        """A NULL among the first sign_bits dims coalesces to bit 0 —
        the row lands in a real cell and participates in pruning,
        matching the DuckDB oracle's CASE WHEN ... ELSE 0."""
        rows = [
            (1, [None, 1.0, 1.0, 1.0, 5.0]),
            (2, [-1.0, 1.0, 1.0, 1.0, 5.0]),  # same cell as 1 post-fix
            (3, [1.0, 1.0, 1.0, 1.0, 5.0]),
        ]
        df = spark.createDataFrame(rows, self._schema)
        out = {
            r["id"]: (r["cell"], r["kept"])
            for r in semdedup_prune(df, "vec_id", "embedding").collect()
        }
        assert out[1][0] == 0b1110, "NULL first element must coalesce to bit 0"
        assert out[2][0] == 0b1110
        assert out[3][0] == 0b1111
        # vectors 1 and 2 share a cell; cosine over the non-NULL dims is
        # NULL (element null -> dot null), so neither prunes the other —
        # the documented dense-contract boundary — but BOTH get rows.
        assert set(out) == {1, 2, 3}

    def test_dominated_by_smaller_id_chain(self, spark):
        """ADVICE #3 semantics pin: cos(1,2)>=t, cos(2,3)>=t,
        cos(1,3)<t => 2 AND 3 both pruned (vector 2 prunes 3 even
        though 2 is itself pruned)."""
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.8, 0.6]),  # cos(1,2)=0.8
            (3, [0.28, 0.96]),  # cos(2,3)=0.8, cos(1,3)=0.28 < 0.4
        ]
        df = spark.createDataFrame(rows, self._schema)
        out = {
            r["id"]: r["kept"]
            for r in semdedup_prune(
                df, "vec_id", "embedding", sign_bits=1, threshold=0.4
            ).collect()
        }
        assert out == {1: True, 2: False, 3: False}


class TestAbBenchHardening:
    def test_same_label_rejected(self, tmp_path):
        p = subprocess.run(
            [
                sys.executable,
                "tools/ab_bench.py",
                "x:/tmp/a",
                "x:/tmp/b",
                str(tmp_path / "out.json"),
            ],
            capture_output=True,
            text=True,
        )
        assert p.returncode != 0
        assert "labels must differ" in p.stderr

    def test_run_bench_validates_json_shape(self, tmp_path, monkeypatch):
        """A trailing non-result '{' line (log noise) must be skipped in
        favor of the real result dict; pure noise must raise."""
        sys.path.insert(0, "tools")
        try:
            import ab_bench
        finally:
            sys.path.pop(0)

        good = json.dumps({"value": 1.5, "queries": {"q": 1.5}, "n_queries": 1})

        class FakeProc:
            def __init__(self, stdout):
                self.stdout = stdout

        monkeypatch.setattr(
            ab_bench.subprocess,
            "run",
            lambda *a, **kw: FakeProc(good + "\n{'not': json}\n{}\n"),
        )
        d = ab_bench.run_bench("/tmp/x", "/tmp/sf", "2")
        assert d["value"] == 1.5 and d["queries"] == {"q": 1.5}

        monkeypatch.setattr(
            ab_bench.subprocess,
            "run",
            lambda *a, **kw: FakeProc("{\"no\": \"queries key\"}\n"),
        )
        with pytest.raises(RuntimeError, match="no valid result JSON"):
            ab_bench.run_bench("/tmp/x", "/tmp/sf", "2")
