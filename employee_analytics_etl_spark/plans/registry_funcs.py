"""Function-surface registry: scalar string/date functions, exact
percentiles, semi-joins, set intersection, cube, above-average
filters, approximate distinct — rounding out the operator inventory
(SURVEY.md §2.3, §2.5, §2.8) beyond what registry.py already covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expr import dsum
from .registry import query, t


@query(
    "median_price_by_status",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def median_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). At 100 TB prefer ``percentile_approx`` — exact
    percentile needs a per-group sort; the approx variant is the
    default scale path (see approx_distinct_parts for the pattern)."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "customer_name_initcap",
    oracle="""
    SELECT c_custkey,
           array_to_string(list_transform(string_split(lower(c_name), ' '),
             x -> upper(substr(x, 1, 1)) || substr(x, 2)), ' ') AS name_ic
    FROM customer
    """,
)
def customer_name_initcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 title-case parity: Spark ``initcap`` (the reference's
    pandas ``str.title`` analogue; divergence on apostrophes/digits is
    documented in SURVEY.md C10 — identical on this corpus)."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey", F.initcap(F.col("c_name")).alias("name_ic")
    )


@query(
    "order_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
           CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
           CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR) AS ym
    FROM orders
    """,
)
def order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (C9 family). NB: Spark dayofweek is
    1=Sunday, DuckDB is 0=Sunday — the oracle maps (+1)."""
    orders = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofweek(d).alias("dow"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query(
    "string_profile",
    oracle="""
    SELECT c_custkey, upper(c_name) AS name_upper,
           CAST(length(c_name) AS INT) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           concat(c_name, '/', c_mktsegment) AS name_seg
    FROM customer
    """,
)
def string_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string-function surface (upper/length/substr/replace/
    lpad/concat) — all codegen'd."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
    )


@query(
    "cube_lineitem_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 subtotal combinations, one shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("total_qty"),
    )


@query(
    "custkeys_f_intersect_o",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def custkeys_f_intersect_o(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operator: INTERSECT (distinct semantics)."""
    orders = t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@query(
    "customers_with_open_orders_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def customers_with_open_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS): left_semi — no fanout, no duplicate rows."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "customers_above_nation_avg",
    oracle="""
    WITH na AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS nation_avg
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal, na.nation_avg
    FROM customer c JOIN na ON na.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > na.nation_avg
    """,
)
def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (above-group-average filter) as an
    agg + broadcast re-join — the distributed idiom for per-group
    comparisons."""
    customer = t(spark, sf_dir, "customer")
    na = customer.groupBy("c_nationkey").agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count("c_acctbal")).alias("nation_avg")
    )
    return (
        customer.join(F.broadcast(na), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nation_avg")
    )


# Approximate distinct (HLL) is engine-specific by construction — no
# cross-engine oracle; the exact twin column is the in-query ground
# truth and pytest asserts the approx is within HLL error of it.
@query("approx_distinct_parts")
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to its exact twin —
    the default distinct-count path at 100 TB (no exact-distinct
    expand/shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
