"""Round-5 registry additions: record-linkage workflow operators
(sorted-neighborhood blocking, Fellegi-Sunter decision scoring),
robust statistics at scale (per-group Theil-Sen trend, Poisson
bootstrap confidence intervals), and two-sided graph importance
(HITS hubs/authorities).

Registered into the same QUERIES/ORACLE dicts as plans.registry.
Import side effects: importing this module populates the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup as D
from ..operators import graph as G
from ..operators.ranking import ranked
from .registry import query, t


@query(
    "customer_sorted_neighborhood_pairs",
    oracle="""
    WITH r AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
             c_mktsegment,
             ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS rn
      FROM customer
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           CAST(b.rn - a.rn AS INT) AS rn_gap,
           CAST(b.bal - a.bal AS DOUBLE) AS bal_diff,
           a.c_mktsegment AS segment
    FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 5
    WHERE a.c_mktsegment = b.c_mktsegment
      AND b.bal - a.bal <= 5.00
    """,
)
def customer_sorted_neighborhood_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95) —
    the OTHER classical linkage candidate generator next to the
    equi-join blocking family (blocked_levenshtein/jaro): sort the
    corpus by a fuzzy key and compare only rows within a fixed window
    w of each other in rank order. Catches near-duplicates that land
    in DIFFERENT equi-blocks (e.g. a typo'd blocking key) at a
    guaranteed w·n pair budget.

    Scale shape: the global rank comes from operators.ranking.ranked
    (range-repartition + broadcast per-partition offsets — no
    single-partition WindowExec at any cardinality), and the
    "neighbors within w" join is an EQUI-join on rn_b = rn_a + i with
    i exploded from 1..w — w·n rows, shuffled once on the rank, never
    an inequality join. Verification (same segment, balance within
    5.00) runs on the joined pair, mirroring the verify step of every
    blocked linkage operator."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "c_mktsegment",
    )
    # rank on the DECIMAL-cast balance: order-equivalent to the raw
    # 2-decimal double the oracle sorts by (the cast is monotone)
    rnk, _n = ranked(
        cust, [F.col("bal").asc(), F.col("c_custkey").asc()], rn_col="rn"
    )
    a = rnk.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("bal").alias("bal_a"),
        F.col("c_mktsegment").alias("segment"),
        F.col("rn").alias("rn_a"),
    ).withColumn("rn_gap", F.explode(F.sequence(F.lit(1), F.lit(5))))
    b = rnk.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("bal").alias("bal_b"),
        F.col("c_mktsegment").alias("segment_b"),
        (F.col("rn")).alias("rn_b"),
    )
    return (
        a.withColumn("rn_b", F.col("rn_a") + F.col("rn_gap"))
        .join(b, "rn_b")
        .filter(
            (F.col("segment") == F.col("segment_b"))
            & ((F.col("bal_b") - F.col("bal_a")) <= 5.00)
        )
        .select(
            "custkey_a",
            "custkey_b",
            F.col("rn_gap").cast("int").alias("rn_gap"),
            (F.col("bal_b") - F.col("bal_a")).cast("double").alias("bal_diff"),
            "segment",
        )
    )


@query(
    "linkage_fellegi_sunter",
    oracle="""
    WITH p AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw_sim,
        a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
        CAST(a.c_acctbal AS DECIMAL(12,2)) AS bal_a,
        CAST(b.c_acctbal AS DECIMAL(12,2)) AS bal_b
      FROM customer a JOIN customer b ON a.c_nationkey = b.c_nationkey
      WHERE a.c_custkey % 25 = 0 AND b.c_custkey % 25 = 13
    ),
    s AS (
      SELECT id_a, id_b, jw_sim,
        (CASE WHEN jw_sim >= 0.95 THEN 317 ELSE -317 END
         + CASE WHEN seg_a = seg_b THEN 200 ELSE -200 END
         + CASE WHEN abs(bal_a - bal_b) <= 500.00 THEN 122 ELSE -122 END
        ) AS cents
      FROM p
    )
    SELECT id_a, id_b, jw_sim,
      CAST(cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS fs_score,
      CASE WHEN cents >= 400 THEN 'match'
           WHEN cents >= 0 THEN 'possible'
           ELSE 'non_match' END AS verdict
    FROM s
    """,
)
def linkage_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969) on top
    of the blocked Jaro-Winkler candidate generator: each pair gets an
    agreement vector over three fields (name JW ≥ 0.95, same segment,
    balance within 500.00) and a log-likelihood-ratio score — fixed
    log2(m/u) weights 3.17 / 2.00 / 1.22, positive on agreement,
    negative on disagreement — then the classic three-way decision:
    match / possible (clerical review) / non-match. This is the
    DECISION layer the pair generators (blocked_*, SNM) feed; the
    registry previously stopped at similarity scores.

    Determinism: weights live in integer CENTS so the score sum is
    exact integer arithmetic in both engines (double literals would
    accumulate left-to-right float sums; DuckDB parses 3.17 as
    DECIMAL, Spark as DOUBLE — cents sidestep the type divergence);
    the one division back to a score is a single IEEE op. The JW
    kernel is fuzz-pinned bit-for-bit against DuckDB's builtin
    (tests/test_extensions.py), which is what lets a probabilistic
    linkage pipeline carry an exact value-hash oracle.

    Scale: candidate pairs come from the nation-blocked equi-join
    (budget-guarded, see assert_blocked_pair_budget); attribute
    lookups are two joins back to the customer dim on its key."""
    cust = t(spark, sf_dir, "customer")
    pairs = D.blocked_jaro_winkler_pairs(
        cust.filter(F.col("c_custkey") % 25 == 0),
        cust.filter(F.col("c_custkey") % 25 == 13),
        text_col="c_name",
        id_col="c_custkey",
        block_cols=("c_nationkey",),
        min_sim=0.0,
    )
    attrs = cust.select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    p = pairs.join(
        attrs.select(
            F.col("c_custkey").alias("id_a"),
            F.col("bal").alias("bal_a"),
            F.col("seg").alias("seg_a"),
        ),
        "id_a",
    ).join(
        attrs.select(
            F.col("c_custkey").alias("id_b"),
            F.col("bal").alias("bal_b"),
            F.col("seg").alias("seg_b"),
        ),
        "id_b",
    )
    cents = (
        F.when(F.col("jw_sim") >= 0.95, 317).otherwise(-317)
        + F.when(F.col("seg_a") == F.col("seg_b"), 200).otherwise(-200)
        + F.when(
            F.abs(F.col("bal_a") - F.col("bal_b")) <= 500.00, 122
        ).otherwise(-122)
    )
    return p.withColumn("cents", cents).select(
        "id_a",
        "id_b",
        "jw_sim",
        (F.col("cents").cast("double") / F.lit(100.0).cast("double")).alias(
            "fs_score"
        ),
        F.when(F.col("cents") >= 400, "match")
        .when(F.col("cents") >= 0, "possible")
        .otherwise("non_match")
        .alias("verdict"),
    )


@query(
    "events_theil_sen_trend",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS h,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE), hour(ts)
    ),
    slopes AS (
      SELECT a.event_type, a.day, a.h AS h_a, b.h AS h_b,
        (b.v - a.v) / (b.h - a.h) AS slope
      FROM hourly a
      JOIN hourly b ON b.event_type = a.event_type AND b.day = a.day
                   AND b.h > a.h
    ),
    r AS (
      SELECT event_type, day, slope,
        ROW_NUMBER() OVER (PARTITION BY event_type, day
                           ORDER BY slope, h_a, h_b) AS rn,
        COUNT(*) OVER (PARTITION BY event_type, day) AS n
      FROM slopes
    )
    SELECT event_type, day, CAST(MAX(n) AS BIGINT) AS n_pairs,
      round(AVG(slope), 9) AS ts_slope
    FROM r
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY event_type, day
    """,
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per (event_type, day): the
    slope is the MEDIAN of all pairwise slopes between the day's
    hourly totals — a 29.3%-breakdown-point alternative to the OLS
    trend (events_value_trend_ols), immune to the single-hour spikes
    that swing least-squares.

    Scale shape: the corpus aggregates once to the hourly grid
    (calendar-bounded: ≤ 24 rows per (type, day) at ANY SF — the
    pairwise "quadratic" stage is ≤ C(24,2)=276 rows per group,
    a constant), so the self-join and the per-group median window both
    run on bounded-cardinality groups. The median is positional
    (row_number under a total order; even counts average the two
    middle values — two-operand AVG is order-free), matching the
    engine's exact-percentile discipline."""
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
        .localCheckpoint(eager=False)  # self-joined below: build once
    )
    a = hourly.select(
        "event_type", "day", F.col("h").alias("h_a"), F.col("v").alias("v_a")
    )
    b = hourly.select(
        "event_type", "day", F.col("h").alias("h_b"), F.col("v").alias("v_b")
    )
    slopes = (
        a.join(b, ["event_type", "day"])
        .filter(F.col("h_b") > F.col("h_a"))
        .select(
            "event_type",
            "day",
            "h_a",
            "h_b",
            ((F.col("v_b") - F.col("v_a")) / (F.col("h_b") - F.col("h_a"))).alias(
                "slope"
            ),
        )
    )
    w = Window.partitionBy("event_type", "day").orderBy("slope", "h_a", "h_b")
    r = slopes.select(
        "event_type",
        "day",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type", "day")).alias("n"),
    )
    return (
        r.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type", "day")
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            F.round(F.avg("slope"), 9).alias("ts_slope"),
        )
    )


@query(
    "graph_hits_scores",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (SELECT DISTINCT src, 1.0 AS h FROM e0),
    a1r AS (
      SELECT e.dst, CAST(SUM(CAST(h.h AS DECIMAL(28,15))) AS DOUBLE) AS raw
      FROM e0 e JOIN h0 h ON h.src = e.src GROUP BY e.dst
    ),
    a1 AS (
      SELECT dst, raw / (SELECT CAST(SUM(CAST(raw AS DECIMAL(28,15)))
                                 AS DOUBLE) FROM a1r) AS a
      FROM a1r
    ),
    h1r AS (
      SELECT e.src, CAST(SUM(CAST(a.a AS DECIMAL(28,15))) AS DOUBLE) AS raw
      FROM e0 e JOIN a1 a ON a.dst = e.dst GROUP BY e.src
    ),
    h1 AS (
      SELECT src, raw / (SELECT CAST(SUM(CAST(raw AS DECIMAL(28,15)))
                                 AS DOUBLE) FROM h1r) AS h
      FROM h1r
    ),
    a2r AS (
      SELECT e.dst, CAST(SUM(CAST(h.h AS DECIMAL(28,15))) AS DOUBLE) AS raw
      FROM e0 e JOIN h1 h ON h.src = e.src GROUP BY e.dst
    ),
    a2 AS (
      SELECT dst, raw / (SELECT CAST(SUM(CAST(raw AS DECIMAL(28,15)))
                                 AS DOUBLE) FROM a2r) AS a
      FROM a2r
    ),
    h2r AS (
      SELECT e.src, CAST(SUM(CAST(a.a AS DECIMAL(28,15))) AS DOUBLE) AS raw
      FROM e0 e JOIN a2 a ON a.dst = e.dst GROUP BY e.src
    ),
    h2 AS (
      SELECT src, raw / (SELECT CAST(SUM(CAST(raw AS DECIMAL(28,15)))
                                 AS DOUBLE) FROM h2r) AS h
      FROM h2r
    )
    SELECT 'hub' AS role, CAST(src AS BIGINT) AS node,
           round(h, 12) AS score FROM h2
    UNION ALL
    SELECT 'authority' AS role, CAST(dst AS BIGINT) AS node,
           round(a, 12) AS score FROM a2
    """,
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators.graph.hits) over the
    directed customer→supplier trade graph: a customer is a strong hub
    if it buys from strong suppliers, a supplier a strong authority if
    strong customers buy from it — the two-sided importance signal
    PageRank's single score collapses (graph_pagerank_suppliers ranks
    the SAME graph one-dimensionally; together they bracket the graph
    family's centrality coverage).

    EXACT oracle for the mutually-recursive iteration, by the pagerank
    recipe: every per-node sum and both L1 normalization totals run
    over DECIMAL(28,15)-cast terms (order-independent), each
    normalization is one IEEE division, and the oracle unrolls 2 full
    iterations (4 half-steps) as chained CTEs, snapping output to 12
    decimals. Per half-step: ONE equi-join + ONE aggregate + a 1-row
    scalar broadcast — no cartesian products, no driver adjacency."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    hubs, auths = G.hits(edges, iters=2)
    return hubs.select(
        F.lit("hub").alias("role"),
        F.col("node").cast("long").alias("node"),
        F.round("hub", 12).alias("score"),
    ).unionByName(
        auths.select(
            F.lit("authority").alias("role"),
            F.col("node").cast("long").alias("node"),
            F.round("authority", 12).alias("score"),
        )
    )


# Poisson(1) CDF cut points (cumulative e^{-1}/k! for k = 0..7); the
# repr round-trips identically to the nearest double in both engines.
_POISSON_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]

_POISSON_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    + " ELSE 8 END"
)


@query(
    "orders_bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             u.b AS b,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '_'
                                      || CAST(u.b AS VARCHAR)), 1, 15))
                  AS BIGINT) / 1152921504606846976.0 AS u
      FROM orders, UNNEST(range(0, 24)) AS u(b)
    ),
    w AS (SELECT b, price, {_POISSON_CASE_SQL} AS w FROM reps),
    means AS (
      SELECT b, CAST(SUM(w * price) AS DOUBLE)
                / CAST(SUM(w) AS DOUBLE) AS m
      FROM w GROUP BY b
    ),
    r AS (
      SELECT b, m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means
    )
    SELECT CAST(24 AS INT) AS n_replicates,
      round(CAST((SELECT CAST(SUM(CAST(m AS DECIMAL(28,12))) AS DOUBLE)
                  FROM means) AS DOUBLE) / CAST(24.0 AS DOUBLE), 6)
        AS boot_mean,
      (SELECT m FROM r WHERE rn = 2) AS ci_low,
      (SELECT m FROM r WHERE rn = 23) AS ci_high,
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
              / COUNT(o_totalprice) FROM orders) AS sample_mean
    """,
)
def orders_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google 2012 — "Estimating
    uncertainty for massive data streams") of the mean order price:
    each of 24 replicates reweights every row by an independent
    Poisson(1) draw instead of resampling n-of-n (which would need a
    global shuffle per replicate); replicate means then give the
    percentile CI. THE way to put error bars on a statistic at 100 TB:
    one scan computes all replicates, no resampled copies ever exist.

    Determinism: the Poisson draw inverts the CDF on an md5-derived
    60-bit uniform per (row, replicate) — the doc_train_split
    derandomization — against literal cut points that round-trip to
    identical doubles in both engines; replicate means are exact
    DECIMAL sums divided once; the replicate-mean average is
    DECIMAL-snapped. The 24-row rank window is constant-bounded
    (GLOBAL_WINDOW_OK).

    Scale: explode(0..23) fans each row to its replicates SCAN-SIDE
    (24× rows into a 24-group partial aggregate — map-side combined,
    so the shuffle carries 24·P rows, not 24·n)."""
    orders = t(spark, sf_dir, "orders")
    u = (
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(o_orderkey AS STRING), '_', "
            "CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        / F.lit(1152921504606846976.0)
    )
    w_col = F.lit(8)
    for k in range(len(_POISSON_CDF) - 1, -1, -1):
        w_col = F.when(F.col("u") < F.lit(_POISSON_CDF[k]), k).otherwise(w_col)
    reps = (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        )
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(23))))
        .withColumn("u", u)
        .withColumn("w", w_col)
    )
    means = reps.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("price")).cast("double")
            / F.sum("w").cast("double")
        ).alias("m")
    )
    r = means.select(
        "b", "m", F.row_number().over(Window.orderBy("m", "b")).alias("rn")
    )
    boot_mean = means.agg(
        F.round(
            F.sum(F.col("m").cast("decimal(28,12)")).cast("double")
            / F.lit(24.0).cast("double"),
            6,
        ).alias("boot_mean")
    )
    ci = r.agg(
        F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_low"),
        F.max(F.when(F.col("rn") == 23, F.col("m"))).alias("ci_high"),
    )
    sample = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
            / F.count("o_totalprice")
        ).alias("sample_mean")
    )
    return (
        boot_mean.crossJoin(ci)
        .crossJoin(sample)
        .select(
            F.lit(24).cast("int").alias("n_replicates"),
            "boot_mean",
            "ci_low",
            "ci_high",
            "sample_mean",
        )
    )
