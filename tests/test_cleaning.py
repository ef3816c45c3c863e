"""Cleaning-tier operator tests — ports of the reference unit tests
(reference scripts/test_etl.py:27-41) plus the null-semantics parity
cases SURVEY.md §2 flags (P1/P2/C4)."""

import pytest

from employee_analytics_etl_spark.operators.cleaning import (
    clean_assignments,
    clean_departments,
    clean_employees,
    clean_projects,
    clean_reviews,
)
from tests.conftest import AS_OF


@pytest.fixture(scope="module")
def emp(spark, hr):
    return clean_employees(hr["employees"], AS_OF).collect()


def by_id(rows, key="employee_id"):
    return {r[key]: r for r in rows}


class TestCleanEmployees:
    def test_inactive_removed(self, emp):
        assert 2 not in by_id(emp)  # Bob is inactive

    def test_null_status_kept(self, emp):
        # pandas parity: NaN != 'inactive' is True → row survives
        assert 9 in by_id(emp)

    def test_zero_salary_removed(self, emp):
        assert 7 not in by_id(emp)

    def test_salary_buckets(self, emp):
        rows = by_id(emp)
        assert rows[1]["salary_bucket"] == "Low"  # 40000 < 50000
        assert rows[4]["salary_bucket"] == "Medium"  # 50000 → Medium (<=80000)
        assert rows[5]["salary_bucket"] == "Medium"  # 80000 boundary
        assert rows[3]["salary_bucket"] == "High"  # 100000

    def test_fk_sentinel(self, emp):
        assert by_id(emp)[5]["department_id"] == -1

    def test_bonus_recode(self, emp):
        rows = by_id(emp)
        assert rows[1]["bonus_eligible"] == 1
        assert rows[4]["bonus_eligible"] == 0
        assert rows[8]["bonus_eligible"] is None  # unexpected 'X' → null

    def test_tenure_pinned_as_of(self, emp):
        # Alice hired 2020-01-01, as_of 2025-12-29 → 2189 days → 6.0 y
        assert by_id(emp)[1]["tenure_years"] == 6.0


class TestCleanReviews:
    @pytest.fixture(scope="class")
    def rev(self, spark, hr):
        return clean_reviews(hr["performance_reviews"]).collect()

    def test_dedup_and_range(self, rev):
        ids = {r["review_id"] for r in rev}
        assert 6 not in ids and 7 not in ids  # out-of-range filtered
        # duplicate (emp 3, 2024-06-01): only one survives
        assert len([r for r in rev if r["employee_id"] == 3]) == 1

    def test_self_review_flag(self, rev):
        flags = {r["review_id"]: r["is_self_review"] for r in rev}
        assert flags.get(3, flags.get(4)) is True  # emp 3 self-review row
        assert flags[1] is False
        assert flags[8] is False  # null reviewer → False (pandas parity)

    def test_performance_category(self, rev):
        cats = {r["review_id"]: r["performance_category"] for r in rev}
        assert cats[1] == "Excellent"  # 4.6
        assert cats[2] == "Good"  # 3.8
        assert cats[5] == "Needs Improvement"  # 2.5

    def test_latest_rating_broadcast(self, rev):
        alice = [r for r in rev if r["employee_id"] == 1]
        assert all(r["latest_rating"] == 3.8 for r in alice)  # 2025 review


class TestCleanProjects:
    @pytest.fixture(scope="class")
    def proj(self, spark, hr):
        return clean_projects(hr["projects"], AS_OF).collect()

    def test_filters(self, proj):
        ids = {r["project_id"] for r in proj}
        assert ids == {1, 2, 3}  # 4 date-order, 5 null budget, 6 negative

    def test_duration_and_daily_alloc(self, proj):
        rows = {r["project_id"]: r for r in proj}
        # ongoing project 1: 2025-01-01 → as_of 2025-12-29 = 362 days
        assert rows[1]["project_duration_days"] == 362
        assert rows[1]["daily_budget_alloc"] == round(120000.0 / 362, 2)
        # bounded project 2: 365 days
        assert rows[2]["project_duration_days"] == 365


class TestCleanAssignments:
    def test_filters(self, spark, hr):
        rows = clean_assignments(hr["project_assignments"]).collect()
        ids = {r["assignment_id"] for r in rows}
        assert 4 not in ids  # allocation 120 > 100
        assert 6 not in ids  # start > end
        assert {1, 2, 3, 5, 7} == ids


class TestCleanDepartments:
    def test_titlecase_distinct(self, spark, hr):
        rows = clean_departments(hr["departments"]).collect()
        names = {r["department_id"]: r["department_name"] for r in rows}
        assert names[101] == "Hr"
        assert names[104] == "Empty Dept"
        assert len(rows) == 4
