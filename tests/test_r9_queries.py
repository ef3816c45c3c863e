"""Round-9 operator tests: exact cross-document substring dedup."""

import pytest

from employee_analytics_etl_spark.operators.dedup import exact_substring_spans


def _brute_force(docs: dict[int, str], k: int) -> dict[int, dict]:
    """Reference implementation: enumerate every k-token window,
    count occurrences corpus-wide, keep the (doc_id, pos)-least
    occurrence of each duplicated window, union the cut windows'
    positions per doc."""
    toks = {d: text.split(" ") for d, text in docs.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, w in toks.items():
        for i in range(max(len(w) - k + 1, 0)):
            occ.setdefault(" ".join(w[i:i + k]), []).append((d, i))
    expected = {
        d: {
            "n_tokens": len(w),
            "n_spans": max(len(w) - k + 1, 0),
            "dup_spans": 0,
            "removed": set(),
        }
        for d, w in toks.items()
    }
    for span, places in occ.items():
        if len(places) < 2:
            continue
        canon = min(places)
        for d, i in places:
            expected[d]["dup_spans"] += 1
            if (d, i) != canon:
                expected[d]["removed"].update(range(i, i + k))
    return expected


class TestExactSubstringSpans:
    K = 4

    DOCS = {
        # 1 and 2 share the 6-token run "a b c d e f" -> three 4-token
        # windows, all duplicated; doc 1 is canonical (smaller id)
        1: "a b c d e f x y",
        2: "q a b c d e f r",
        # 3 repeats a window WITHIN itself ("p p p p" twice, overlapping
        # occurrences at pos 0..2 since p*7 has four 4-windows)
        3: "p p p p p p p",
        # 4 too short for any span
        4: "u v w",
        # 5 no duplication
        5: "g h i j k l m n",
        # 6 exact duplicate of 5 -> every window duplicated, 5 canonical
        6: "g h i j k l m n",
    }

    @pytest.fixture(scope="class")
    def result(self, spark):
        df = spark.createDataFrame(
            [(d, t) for d, t in self.DOCS.items()], ["doc_id", "text"]
        )
        rows = exact_substring_spans(df, k=self.K).collect()
        return {r["doc_id"]: r for r in rows}

    def test_matches_brute_force(self, result):
        expected = _brute_force(self.DOCS, self.K)
        assert set(result) == set(expected)
        for d, exp in expected.items():
            got = result[d]
            assert got["n_tokens"] == exp["n_tokens"], d
            assert got["n_spans"] == exp["n_spans"], d
            assert got["dup_spans"] == exp["dup_spans"], d
            assert got["removed_tokens"] == len(exp["removed"]), d
            assert got["kept_tokens"] == exp["n_tokens"] - len(exp["removed"]), d
            assert got["kept_ratio"] == pytest.approx(
                round((exp["n_tokens"] - len(exp["removed"])) / exp["n_tokens"], 6)
            ), d

    def test_canonical_occurrence_survives_whole(self, result):
        # doc 5 is the canonical copy of the 5/6 duplicate pair: every
        # one of its windows is duplicated but NOTHING is removed
        assert result[5]["dup_spans"] == 5
        assert result[5]["removed_tokens"] == 0
        assert result[5]["kept_ratio"] == 1.0
        # doc 6 loses everything
        assert result[6]["removed_tokens"] == 8
        assert result[6]["kept_tokens"] == 0
        assert result[6]["kept_ratio"] == 0.0

    def test_sub_k_documents_pass_through(self, result):
        assert result[4]["n_spans"] == 0
        assert result[4]["dup_spans"] == 0
        assert result[4]["kept_ratio"] == 1.0

    def test_within_doc_repeats_are_cut(self, result):
        # p^7: four windows of "p p p p", all identical; canonical is
        # (3, 0), occurrences at pos 1..3 are cut -> positions 1..6
        # covered, position 0 kept
        assert result[3]["dup_spans"] == 4
        assert result[3]["removed_tokens"] == 6
        assert result[3]["kept_tokens"] == 1

    def test_overlap_shared_run_positions(self, result):
        # doc 2's copy of "a b c d e f" sits at pos 1..6; all three
        # windows cut -> positions 1..6 removed, q/r kept
        assert result[2]["removed_tokens"] == 6
        assert result[2]["kept_tokens"] == 2
        # doc 1 is canonical for all three shared windows: kept whole
        assert result[1]["removed_tokens"] == 0


class TestBroadcastOverGenerateCheck:
    """r9 plan invariant: exploded tables never broadcast without an
    allowlisted bound (the hazard class the local-cluster leg exposed
    — Catalyst estimates the pre-explode relation, so the 64 MB
    threshold admits hashed relations that blow up 5-10x deserialized)."""

    def test_detector_flags_unaggregated_explode_under_broadcast(self):
        from tools.explain_audit import broadcast_over_generate

        plan = (
            "*(3) BroadcastHashJoin [shingle], [shingle], Inner\n"
            ":- *(1) Project [id]\n"
            "+- BroadcastExchange HashedRelationBroadcastMode\n"
            "   +- *(2) Project [shingle]\n"
            "      +- Generate explode(shingle_set), false, [shingle]\n"
            "         +- Scan parquet [shingle_set]\n"
        )
        hits = broadcast_over_generate(plan)
        assert len(hits) == 1 and "explode" in hits[0]

    def test_detector_accepts_aggregated_explode_and_plain_broadcast(self):
        from tools.explain_audit import broadcast_over_generate

        aggregated = (
            "+- BroadcastExchange HashedRelationBroadcastMode\n"
            "   +- *(2) HashAggregate(keys=[k], functions=[count(1)])\n"
            "      +- Generate explode(xs), false, [k]\n"
            "         +- Scan parquet [xs]\n"
        )
        plain = (
            "+- BroadcastExchange HashedRelationBroadcastMode\n"
            "   +- *(2) Project [n_nationkey]\n"
            "      +- Scan parquet [n_nationkey]\n"
            "+- Generate explode(ys), false, [y]\n"   # sibling, NOT inside
            "   +- Scan parquet [ys]\n"
        )
        assert broadcast_over_generate(aggregated) == []
        assert broadcast_over_generate(plain) == []

    def test_allowlist_names_resolve_to_registry_queries(self):
        import __spark_entry__ as e
        from tools.explain_audit import GENERATE_BROADCAST_OK

        q = e.queries()
        missing = [n for n in GENERATE_BROADCAST_OK if n not in q]
        assert not missing, missing
