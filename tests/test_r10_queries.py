"""Round-10 regression tests: the five r9 ADVICE findings.

1 (medium) shingle_sets checkpoint is opt-out-able (cluster callers own
  the executor-loss / storage tradeoff).
2 (low) broadcast_over_generate is depth-aware: an Aggregate BELOW the
  Generate (explode of an aggregated input, broadcast of the raw
  explode output) no longer suppresses the finding.
3 (low) exact_substring_spans ships a true 16-byte binary digest
  (unhex(md5)) on the wide shuffle, not 32-char hex.
4 (low) sync_doc_counts: no stale group-1 comment, singular 'test
  collected' parses, repo root derived from __file__.
5 (low) __main__ registry import indentation — covered by flake-free
  parse in test_import_indent below.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from employee_analytics_etl_spark.operators.dedup import (
    exact_substring_spans,
    shingle_sets,
)


class TestShingleSetsCheckpointOptOut:
    def test_default_pins_once_and_false_pins_never(self, spark, monkeypatch):
        calls = []
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "b c d e")], ["doc_id", "text"]
        )
        # patch the CONCRETE class (pyspark 4's classic DataFrame
        # overrides localCheckpoint; patching the abstract
        # pyspark.sql.DataFrame would miss the dispatch)
        cls = type(df)
        orig = cls.localCheckpoint

        def spy(self, eager=True):
            calls.append(eager)
            return orig(self, eager=eager)

        monkeypatch.setattr(cls, "localCheckpoint", spy)
        shingle_sets(df, n=3)
        assert calls == [False], "default path must lazily pin exactly once"
        calls.clear()
        unpinned = shingle_sets(df, n=3, checkpoint=False)
        assert calls == [], "checkpoint=False must not touch localCheckpoint"
        # identical semantics either way
        got = {
            r["id"]: (r["shingle_set"], r["set_size"])
            for r in unpinned.collect()
        }
        assert got == {
            1: (["a b c", "b c d"], 2),
            2: (["b c d", "c d e"], 2),
        }


class TestBroadcastOverGenerateDepthAware:
    def test_generate_above_aggregate_is_still_flagged(self):
        """r9 ADVICE #2's false negative: Aggregate is a DESCENDANT of
        the explode — it bounds the explode's INPUT, not the broadcast
        row count — so the finding must fire."""
        from tools.explain_audit import broadcast_over_generate

        plan = (
            "+- BroadcastExchange HashedRelationBroadcastMode\n"
            "   +- *(2) Project [k]\n"
            "      +- Generate explode(ks), false, [k]\n"
            "         +- *(1) HashAggregate(keys=[g], functions=[collect_list(x)])\n"
            "            +- Scan parquet [g, x]\n"
        )
        hits = broadcast_over_generate(plan)
        assert len(hits) == 1 and "explode" in hits[0]

    def test_aggregate_between_exchange_and_generate_suppresses(self):
        from tools.explain_audit import broadcast_over_generate

        plan = (
            "+- BroadcastExchange HashedRelationBroadcastMode\n"
            "   +- *(2) HashAggregate(keys=[k], functions=[count(1)])\n"
            "      +- Generate explode(xs), false, [k]\n"
            "         +- Scan parquet [xs]\n"
        )
        assert broadcast_over_generate(plan) == []

    def test_aggregate_on_sibling_branch_does_not_suppress(self):
        """An Aggregate under the join's OTHER child (same exchange
        subtree via a join below the exchange) is not between the
        exchange and the Generate and must not suppress."""
        from tools.explain_audit import broadcast_over_generate

        plan = (
            "+- BroadcastExchange HashedRelationBroadcastMode\n"
            "   +- *(3) SortMergeJoin [k], [k], Inner\n"
            "      :- Generate explode(ks), false, [k]\n"
            "      :  +- Scan parquet [ks]\n"
            "      +- *(2) HashAggregate(keys=[k], functions=[count(1)])\n"
            "         +- Scan parquet [k]\n"
        )
        hits = broadcast_over_generate(plan)
        assert len(hits) == 1 and "explode" in hits[0]


class TestExactSubstringBinaryDigest:
    def test_wire_digest_is_unhexed_md5(self, spark, monkeypatch):
        """The wide shuffle's digest column is BinaryType (16 bytes),
        not 32-char hex — pin via the analyzed plan's expression tree.
        The operator's lazy localCheckpoint collapses the analyzed
        plan into a LogicalRDD, so neutralize it for inspection."""
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e g")], ["doc_id", "text"]
        )
        monkeypatch.setattr(
            type(df), "localCheckpoint", lambda self, eager=True: self
        )
        out = exact_substring_spans(df, k=4)
        analyzed = out._jdf.queryExecution().analyzed().toString()
        assert re.search(r"unhex\(md5\(", analyzed), (
            "digest must be unhex(md5(...)) — 16-byte binary on the wire"
        )
        # the empty-branch cast must also be binary, or the CASE WHEN
        # would widen the whole array back to string
        assert "array<binary>" in analyzed, analyzed[:400]
        # and the result is still exact (full brute-force parity lives
        # in test_r9_queries; this is the digest-width smoke)
        rows = {r["doc_id"]: r for r in exact_substring_spans(df, k=4).collect()}
        assert rows[1]["removed_tokens"] == 0
        assert rows[2]["dup_spans"] == 2  # "a b c d"/"b c d e" shared
        assert rows[2]["removed_tokens"] == 5


class TestSyncDocCountsHygiene:
    def test_singular_collected_form_parses(self):
        import tools.sync_doc_counts as s

        assert re.search(r"(\d+) tests? collected", "1 test collected")
        assert s.REPO_ROOT.endswith("repo") or "/" in s.REPO_ROOT
        # the module must not hardcode /root/repo as a default anywhere
        src = open(s.__file__).read()
        assert 'repo_root: str = "/root/repo"' not in src
        # the comment no longer claims a group-1 capture
        assert "group 1" not in src

    def test_test_module_derives_repo_from_file(self):
        import tests.test_doc_counts as t

        src = open(t.__file__).read()
        assert 'REPO = "/root/repo"' not in src


class TestRetrievalRankWindowsLimitBounded:
    """VERDICT r9 ask #5: the BM25/RRF rank windows must never sort a
    doc-sized input in one task. The r9 tree already ranks AFTER the
    distributed TakeOrdered top-k (window input = 20 rows); this pins
    the shape mechanically so a refactor can't move the window back
    below the limit — every WindowExec in these plans must have
    TakeOrderedAndProject as its immediate child."""

    def test_windows_sit_directly_above_takeordered(self, spark):
        from employee_analytics_etl_spark.plans import registry, registry_ext  # noqa: F401
        from tools.explain_audit import _subtree_depth

        for name in ("doc_bm25_topk", "doc_rrf_hybrid_topk"):
            df = registry.QUERIES[name](spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().executedPlan().toString()
            lines = plan.splitlines()
            windows = [i for i, l in enumerate(lines) if "Window " in l]
            for i in windows:
                d = _subtree_depth(lines[i])
                child = next(
                    (
                        m
                        for m in lines[i + 1:]
                        if any(c.isalpha() for c in m)
                        and _subtree_depth(m) > d
                    ),
                    "",
                )
                assert "TakeOrderedAndProject" in child, (
                    f"{name}: Window input is not limit-bounded:\n{child}"
                )


def test_import_indent():
    """__main__'s registry import tuple is consistently indented
    (r9 ADVICE #5) — every member line of the parenthesized import
    uses the same indent."""
    import employee_analytics_etl_spark.__main__ as m

    src = open(m.__file__).read()
    block = re.search(
        r"from \.plans import \(([^)]*)\)", src, re.S
    ).group(1)
    indents = {
        len(line) - len(line.lstrip())
        for line in block.splitlines()
        if line.strip().startswith("registry")
    }
    assert len(indents) == 1, f"mixed indents in registry import: {indents}"
