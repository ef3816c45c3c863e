"""Unit tests for the round-5 continuation queries in
plans/registry_r6.py beyond the DuckDB oracle gate: hand-crafted
edge-case inputs for the funnel's strict-order semantics, and a
sequential replay of the floored-balance recursion (the closed form
B(t) = S(t) - min(0, min prefix S) must equal the literal
max(0, B + delta) walk)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestFunnelConversion:
    def _run(self, spark, rows):
        import os
        import tempfile

        from employee_analytics_etl_spark.plans import registry_r6  # noqa: F401
        from employee_analytics_etl_spark.plans.registry import QUERIES

        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        tmp = tempfile.mkdtemp(prefix="funnel_t_")
        df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["events_funnel_conversion"](spark, tmp).collect()[0]
        return out

    def test_strict_order_and_preorder_click_ignored(self, spark):
        rows = [
            # user 1: full funnel in order
            (1, ts("2024-01-01T00:00:00"), 1, "view", 1.0, "{}"),
            (2, ts("2024-01-01T01:00:00"), 1, "click", 1.0, "{}"),
            (3, ts("2024-01-01T03:00:00"), 1, "purchase", 1.0, "{}"),
            # user 2: click BEFORE the first view -> no step 2
            (4, ts("2024-01-01T00:00:00"), 2, "click", 1.0, "{}"),
            (5, ts("2024-01-01T01:00:00"), 2, "view", 1.0, "{}"),
            (6, ts("2024-01-01T02:00:00"), 2, "purchase", 1.0, "{}"),
            # user 3: view only
            (7, ts("2024-01-01T00:00:00"), 3, "view", 1.0, "{}"),
            # user 4: no view at all -> not even step 1
            (8, ts("2024-01-01T00:00:00"), 4, "purchase", 1.0, "{}"),
        ]
        r = self._run(spark, rows)
        assert r["n_users"] == 4
        assert r["n_view"] == 3
        assert r["n_view_click"] == 1
        assert r["n_view_click_purchase"] == 1
        assert r["conv_view_to_click"] == pytest.approx(1 / 3)
        assert r["avg_hours_view_to_click"] == pytest.approx(1.0)
        assert r["avg_hours_click_to_purchase"] == pytest.approx(2.0)

    def test_same_timestamp_not_after(self, spark):
        rows = [
            (1, ts("2024-01-01T00:00:00"), 1, "view", 1.0, "{}"),
            # same instant as the view: strictly-after fails
            (2, ts("2024-01-01T00:00:00"), 1, "click", 1.0, "{}"),
        ]
        r = self._run(spark, rows)
        assert r["n_view"] == 1
        assert r["n_view_click"] == 0


class TestBalanceFloorRecursion:
    def test_closed_form_equals_sequential_replay(self, spark):
        """Replay the literal per-event recursion in Python (exact
        Decimal) for every sf0.001 user and compare all five outputs
        of the closed-form query."""
        from employee_analytics_etl_spark.plans import registry_r6  # noqa: F401
        from employee_analytics_etl_spark.plans.registry import QUERIES

        got = {
            r["user_id"]: r.asDict()
            for r in QUERIES["user_value_balance_floor"](
                spark, SF_SMOKE
            ).collect()
        }
        rows = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select(
                "user_id",
                "ts",
                "event_id",
                "event_type",
                F.col("value").cast("decimal(12,2)").alias("v"),
            )
            .orderBy("user_id", "ts", "event_id")
            .collect()
        )
        from collections import defaultdict

        per_user = defaultdict(list)
        for r in rows:
            d = Decimal(r["v"])
            if r["event_type"] in ("purchase", "error"):
                d = -d
            per_user[r["user_id"]].append(d)
        assert set(per_user) == set(got)
        for uid, deltas in per_user.items():
            b = Decimal(0)
            hits = 0
            mn = None
            for d in deltas:
                b = max(Decimal(0), b + d)
                if b == 0:
                    hits += 1
                mn = b if mn is None else min(mn, b)
            g = got[uid]
            assert g["n_events"] == len(deltas)
            assert g["n_at_floor"] == hits, uid
            assert g["min_balance"] == pytest.approx(float(mn), abs=1e-9)
            assert g["final_balance"] == pytest.approx(float(b), abs=1e-9)
            assert g["raw_net"] == pytest.approx(float(sum(deltas)), abs=1e-9)
            assert g["forfeited"] == pytest.approx(
                float(b - sum(deltas)), abs=1e-9
            )
