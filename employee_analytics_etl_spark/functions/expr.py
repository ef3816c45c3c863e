"""Reusable Column-expression helpers.

Two families:

1. **Null-parity wrappers** — the reference engine (pandas) and ANSI
   SQL disagree on null semantics in a few places (SURVEY.md §2.2
   P1/P2, §2.3 C4, §2.9 V6). Each discrepancy gets a named helper so
   the choice is explicit and testable rather than scattered.

2. **Cross-engine-exact aggregation** — ``dsum``/``davg`` compute
   SUM/AVG over "money-like" doubles by casting to DECIMAL first.
   Decimal aggregation is exact integer arithmetic, so the result is
   independent of partitioning/accumulation order — Spark on 32
   partitions and the DuckDB oracle produce bit-identical doubles.
   Plain ``F.sum(double)`` would differ in the last ulps between
   engines and even between runs (shuffle order), breaking the
   driver's value-hash comparison. At 100 TB scale this also makes
   results reproducible across cluster sizes — a real property, not
   just a test convenience.

All helpers emit pure Catalyst expressions (whole-stage-codegen'd);
no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(18,2) holds ±10^16 with cent precision — enough headroom for
# per-group sums at SF well beyond the 100 TB target when values are
# money-like (the sum type widens to DECIMAL(28,2) in Spark).
_MONEY = "decimal(18,2)"


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent exact sum of a money-like double column.

    Returns DOUBLE (cast back after exact decimal summation) so the
    output schema matches the DuckDB oracle's
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Order-independent exact mean: exact decimal sum / count.

    Matches the oracle's
    ``CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) / COUNT(x)`` —
    IEEE division of identical operands is deterministic on both
    engines, so the resulting double is bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def keep_null_neq(col: str | Column, value) -> Column:
    """Pandas-parity ``!=`` that KEEPS null rows.

    pandas: ``NaN != x`` is True, so null rows survive a ``df[df.c != v]``
    filter. SQL: ``NULL != v`` is NULL → row dropped. The reference
    relies on the pandas behavior for the status/salary filters
    (reference scripts/transform.py:12-15); this helper reproduces it.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c != value) | c.isNull()


def null_safe_eq_bool(left: str | Column, right: str | Column) -> Column:
    """Equality that returns False (not NULL) when either side is null.

    pandas ``a == b`` with NaN yields False; used for ``is_self_review``
    parity (reference scripts/transform.py:43-44).
    """
    l = F.col(left) if isinstance(left, str) else left
    r = F.col(right) if isinstance(right, str) else right
    return F.coalesce(l == r, F.lit(False))


def sentinel_fk(col: str | Column, sentinel: int = -1) -> Column:
    """Missing-FK sentinel: ``coalesce(fk, -1)`` cast to long.

    Reproduces ``fillna(-1).astype(int)`` (reference
    scripts/transform.py:16-17); downstream validation exempts the
    sentinel from referential-integrity checks.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(sentinel)).cast("long")


def yn_to_int(col: str | Column) -> Column:
    """'Y'/'N' → 1/0, anything else → NULL (pandas ``map`` parity,
    reference scripts/transform.py:20-21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "Y", 1).when(c == "N", 0).otherwise(F.lit(None)).cast("int")


def bucketize(col: str | Column, bounds: list[float], labels: list[str]) -> Column:
    """Ordered threshold bucketing as a chained CASE WHEN.

    ``bounds`` are upper bounds checked in order with ``<`` for the
    first and ``<=`` thereafter is NOT assumed — callers pick exact
    semantics; this generic helper uses strict ``<`` for every bound,
    with the final label as the catch-all. For the reference's salary
    buckets (<50k Low, <=80k Medium, else High; reference
    scripts/transform.py:27-30) use ``salary_bucket`` instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for bound, label in zip(bounds, labels[:-1]):
        expr = F.when(c < bound, label) if expr is None else expr.when(c < bound, label)
    return expr.otherwise(labels[-1]) if expr is not None else F.lit(labels[-1])


def salary_bucket(col: str | Column) -> Column:
    """Reference salary bucketing: <50000 Low; <=80000 Medium; else High
    (reference scripts/transform.py:27-30). Pure CASE WHEN — no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c < 50000, "Low").when(c <= 80000, "Medium").otherwise("High")
    )


def performance_category(col: str | Column) -> Column:
    """rating ≥4.5 Excellent; ≥3.5 Good; else Needs Improvement
    (reference scripts/transform.py:47-50)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c >= 4.5, "Excellent")
        .when(c >= 3.5, "Good")
        .otherwise("Needs Improvement")
    )
