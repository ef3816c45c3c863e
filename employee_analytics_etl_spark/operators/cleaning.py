"""Cleaning tier: the four ``clean_*`` operators (SURVEY.md §2.2-§2.3).

Each is a pure ``DataFrame → DataFrame`` function built entirely from
Catalyst Column expressions — zero Python UDFs (the reference's three
row-wise ``.apply`` lambdas are all CASE WHEN in disguise, SURVEY.md
§2.10). Null-semantics parity with pandas is routed through the named
helpers in ``functions.expr`` so every divergence from plain ANSI SQL
is explicit.

All date-relative derivations take ``as_of`` (a ``datetime.date``)
instead of wall clock (reference scripts/transform.py:25,67,122 use
``pd.Timestamp.today()`` — nondeterministic; see SURVEY.md §7.3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expr import (
    keep_null_neq,
    null_safe_eq_bool,
    performance_category,
    salary_bucket,
    sentinel_fk,
    yn_to_int,
)


def clean_employees(df: DataFrame, as_of: dt.date) -> DataFrame:
    """P1 P2 C1 C2 C7 C8 (reference scripts/transform.py:9-31).

    - drop inactive rows (null status survives — pandas parity, P1)
    - drop zero-salary rows (null salary survives, P2)
    - FK null → −1 sentinel (C8)
    - bonus_eligible 'Y'/'N' → 1/0 (C7)
    - tenure_years = round(days/365.25, 1) from as_of (C1)
    - salary_bucket Low/Medium/High (C2 — CASE WHEN, no UDF)
    """
    as_of_lit = F.lit(as_of.isoformat()).cast("date")
    return (
        df.filter(keep_null_neq("status", "inactive"))
        .filter(keep_null_neq("salary", 0))
        .withColumn("department_id", sentinel_fk("department_id"))
        .withColumn("bonus_eligible", yn_to_int("bonus_eligible"))
        .withColumn(
            "tenure_years",
            F.round(F.datediff(as_of_lit, F.col("hire_date")) / F.lit(365.25), 1),
        )
        .withColumn("salary_bucket", salary_bucket("salary"))
    )


def clean_reviews(df: DataFrame) -> DataFrame:
    """P3 C3 C4 W1 W3 (reference scripts/transform.py:33-53).

    - keyed dedup on (employee_id, review_date) (W3) under a TOTAL
      order (review_id tiebreak): ``dropDuplicates`` keeps an
      *arbitrary* survivor when duplicate keys carry different
      rating/reviewer_id, so a recomputation after the pipeline cache
      is released could emit a different row than the one validated.
      ``row_number`` over (key, review_id) pins one survivor — the
      engine-wide determinism invariant (SURVEY.md §7.3 item 3).
    - rating range filter [1.0, 5.0] — nulls dropped, matching pandas (P3)
    - is_self_review bool with null→False parity (C4)
    - performance_category CASE WHEN (C3)
    - latest_rating broadcast to every row of the employee (W1): an
      unbounded window ordered by review_date. Deterministic because
      the dedup key equals the order key.
    """
    from pyspark.sql.window import Window

    from .dedup import keyed_dedup_first

    w = (
        Window.partitionBy("employee_id")
        .orderBy("review_date")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        keyed_dedup_first(df, ["employee_id", "review_date"], ["review_id"])
        .filter(F.col("rating").between(1.0, 5.0))
        .withColumn("is_self_review", null_safe_eq_bool("reviewer_id", "employee_id"))
        .withColumn("performance_category", performance_category("rating"))
        .withColumn("latest_rating", F.last("rating").over(w))
    )


def clean_projects(df: DataFrame, as_of: dt.date) -> DataFrame:
    """P4 P6 C5 C6 (reference scripts/transform.py:55-76).

    - positive non-null budget (P4)
    - date-order sanity: end_date null or start<=end (P6)
    - project_duration_days = datediff(coalesce(end_date, as_of), start) (C5)
    - daily_budget_alloc = round(budget/duration, 2) guard duration>0 (C6 —
      the reference's only axis=1 apply, replaced by a codegen'd CASE WHEN)
    """
    as_of_lit = F.lit(as_of.isoformat()).cast("date")
    return (
        df.filter(F.col("budget").isNotNull() & (F.col("budget") > 0))
        .filter(F.col("end_date").isNull() | (F.col("start_date") <= F.col("end_date")))
        .withColumn(
            "project_duration_days",
            F.datediff(F.coalesce(F.col("end_date"), as_of_lit), F.col("start_date")),
        )
        .withColumn(
            "daily_budget_alloc",
            F.round(
                F.when(
                    F.col("project_duration_days") > 0,
                    F.col("budget") / F.col("project_duration_days"),
                ).otherwise(0.0),
                2,
            ),
        )
    )


def clean_assignments(df: DataFrame) -> DataFrame:
    """P5 P6 (reference scripts/transform.py:78-90).

    - allocation_percentage ≤ 100 (nulls dropped — pandas parity, P5)
    - date-order sanity (P6)
    """
    return df.filter(F.col("allocation_percentage") <= 100).filter(
        F.col("end_date").isNull() | (F.col("start_date") <= F.col("end_date"))
    )


def clean_departments(df: DataFrame) -> DataFrame:
    """C10 D1 (reference scripts/main.py:77-79): title-case the name,
    whole-row distinct. ``initcap`` diverges from pandas ``str.title``
    on apostrophes/digits — identical on the reference corpus
    (SURVEY.md C11 note); documented, accepted."""
    return df.withColumn(
        "department_name", F.initcap(F.col("department_name"))
    ).distinct()
