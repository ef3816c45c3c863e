"""Round-5 continuation registry: interval-overlap temporal join,
cross-source distribution divergence, positional skip-gram
co-occurrence — families that widen the temporal-join and
corpus-comparison tiers.

Registered into the same QUERIES/ORACLE dicts as plans.registry.
Import side effects: importing this module populates the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, t

EPOCH = "1970-01-01"


@query(
    "order_ship_window_overlap",
    oracle="""
    WITH lw AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS ls,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               + 30 AS le
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND CAST(o_orderdate AS DATE)
            BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
    ),
    rw AS (
      SELECT l_orderkey,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS rs,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               + 3 + l_suppkey % 12 AS re
      FROM lineitem
      WHERE l_returnflag = 'R'
        AND CAST(l_shipdate AS DATE)
            BETWEEN DATE '1994-12-01' AND DATE '1995-03-31'
    )
    SELECT lw.o_orderkey, lw.o_orderdate,
           CAST(COUNT(rw.l_orderkey) AS BIGINT) AS n_returns_in_flight,
           CAST(COALESCE(MAX(LEAST(le, re) - GREATEST(ls, rs) + 1), 0)
                AS INT) AS max_overlap_days
    FROM lw LEFT JOIN rw
      ON rw.rs <= lw.le AND lw.ls <= rw.re
     AND rw.l_orderkey <> lw.o_orderkey
    GROUP BY lw.o_orderkey, lw.o_orderdate
    """,
)
def order_ship_window_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per urgent January-1995 order: how many RETURN shipments (of
    OTHER orders) had their ship→receipt window in flight during this
    order's 30-day fulfillment window — the "congestion while my order
    was open" temporal-overlap signal (returns processing competes
    with outbound fulfillment).

    Scale shape: ``interval_overlap_join`` — both interval sets
    explode to 32-day buckets (≤ 2 buckets/row here) and EQUI-join on
    the bucket id with first-shared-bucket pair dedup, so the overlap
    predicate never plans a nested-loop join at any cardinality. The
    count is zero-preserving: the overlap join is inner, then the
    per-order counts broadcast-join back onto the (filtered, small)
    left slice. Day arithmetic is integer datediff — exact in both
    engines."""
    from ..operators.windows import interval_overlap_join

    lw = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.col("o_orderdate").between("1995-01-01", "1995-01-31")
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            F.datediff("o_orderdate", F.lit(EPOCH)).alias("ls"),
            (F.datediff("o_orderdate", F.lit(EPOCH)) + 30).alias("le"),
        )
    )
    rw = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_suppkey",
            "l_returnflag",
            F.col("l_shipdate").cast("date").alias("shipd"),
        )
        .filter(
            (F.col("l_returnflag") == "R")
            & F.col("shipd").between("1994-12-01", "1995-03-31")
        )
        .select(
            "l_orderkey",
            F.datediff("shipd", F.lit(EPOCH)).alias("rs"),
            (
                F.datediff("shipd", F.lit(EPOCH))
                + 3
                + F.col("l_suppkey") % 12
            ).alias("re"),
        )
    )
    pairs = interval_overlap_join(
        lw, rw, "ls", "le", "rs", "re", bucket_width=32
    ).filter(F.col("l_orderkey") != F.col("o_orderkey"))
    per_order = pairs.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.max(
            F.least("le", "re") - F.greatest("ls", "rs") + 1
        ).alias("_mx"),
    )
    return lw.join(F.broadcast(per_order), "o_orderkey", "left").select(
        "o_orderkey",
        "o_orderdate",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias(
            "n_returns_in_flight"
        ),
        F.coalesce(F.col("_mx"), F.lit(0)).cast("int").alias(
            "max_overlap_days"
        ),
    )


@query(
    "source_token_js_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, u.tok FROM documents,
        UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS u(tok)
    ),
    c AS (SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
    n AS (SELECT source, SUM(cnt) AS n FROM c GROUP BY 1),
    p AS (
      SELECT c.source, c.tok,
             CAST(CAST(cnt AS DOUBLE) / n.n AS DECIMAL(28,12)) AS p
      FROM c JOIN n ON n.source = c.source
    ),
    srcs AS (SELECT DISTINCT source FROM c),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    grid AS (
      SELECT DISTINCT sa, sb, tok FROM (
        SELECT pr.sa, pr.sb, p.tok FROM p JOIN pairs pr ON pr.sa = p.source
        UNION ALL
        SELECT pr.sa, pr.sb, p.tok FROM p JOIN pairs pr ON pr.sb = p.source
      )
    ),
    j AS (
      SELECT g.sa, g.sb,
             CAST(COALESCE(pa.p, 0) AS DOUBLE) AS pa,
             CAST(COALESCE(pb.p, 0) AS DOUBLE) AS pb
      FROM grid g
      LEFT JOIN p pa ON pa.source = g.sa AND pa.tok = g.tok
      LEFT JOIN p pb ON pb.source = g.sb AND pb.tok = g.tok
    ),
    terms AS (
      SELECT sa, sb, (pa > 0 AND pb > 0) AS shared,
        CAST(
          CASE WHEN pa > 0
               THEN 0.5 * pa * ln(2.0 * pa / (pa + pb)) ELSE 0 END
        + CASE WHEN pb > 0
               THEN 0.5 * pb * ln(2.0 * pb / (pa + pb)) ELSE 0 END
          AS DECIMAL(28,12)) AS term
      FROM j
    )
    SELECT sa AS source_a, sb AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_union_tokens,
           CAST(SUM(CASE WHEN shared THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_tokens,
           CAST(ROUND(SUM(term), 9) AS DOUBLE) AS jsd_nats
    FROM terms GROUP BY sa, sb
    """,
)
def source_token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of per-source
    unigram distributions — the bounded, symmetric corpus-comparison
    metric (0 = identical mixtures, ln 2 = disjoint vocabularies) that
    complements source_overlap_matrix's shingle Jaccard (surface
    overlap) and doc_token_entropy_by_source (per-source diversity):
    JSD drives source mixture re-weighting and "is this new crawl
    actually new data" checks.

    Scale shape: per-source token probabilities are exact-count IEEE
    divisions snapped to DECIMAL(28,12) (order-independent sums, the
    entropy/PSI idiom); the source-pair list comes from the
    constant-cardinality sorted collect_list pair-explode (never a
    cross join); the union-token grid is TWO broadcast equi-joins of
    the probability table against the tiny pair list (one per side —
    an OR join key would plan a nested loop) + a distinct, and both
    probability lookups are shuffle hash joins on (source, token).
    Every per-token JSD term — zero-sides contribute only the present
    side's ½·p·ln 2 via the engine's own ln(2·p/p) — is snapped to
    DECIMAL(28,12) before the per-pair sum, so the reduction is exact
    and engine-identical."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '([a-z0-9]+)', 1)")
        ).alias("tok"),
    )
    # c/p each feed several joins below — checkpoint so the
    # tokenize+count subtree runs ONCE, not once per consumer
    c = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    n = c.groupBy("source").agg(F.sum("cnt").alias("n"))
    p = (
        c.join(F.broadcast(n), "source")
        .select(
            "source",
            "tok",
            (F.col("cnt").cast("double") / F.col("n"))
            .cast("decimal(28,12)")
            .alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))"
    )
    pairs = (
        c.select("source")
        .distinct()
        .agg(F.array_sort(F.collect_list("source")).alias("ids"))
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .select(F.col("pr.a").alias("sa"), F.col("pr.b").alias("sb"))
    )
    grid = (
        p.join(F.broadcast(pairs), F.col("source") == F.col("sa"))
        .select("sa", "sb", "tok")
        .unionByName(
            p.join(F.broadcast(pairs), F.col("source") == F.col("sb")).select(
                "sa", "sb", "tok"
            )
        )
        .distinct()
    )
    pa_t = p.select(
        F.col("source").alias("_sa"), F.col("tok").alias("_ta"),
        F.col("p").alias("_pa"),
    )
    pb_t = p.select(
        F.col("source").alias("_sb"), F.col("tok").alias("_tb"),
        F.col("p").alias("_pb"),
    )
    j = (
        grid.join(
            pa_t,
            (F.col("sa") == F.col("_sa")) & (F.col("tok") == F.col("_ta")),
            "left",
        )
        .join(
            pb_t,
            (F.col("sb") == F.col("_sb")) & (F.col("tok") == F.col("_tb")),
            "left",
        )
        .select(
            "sa",
            "sb",
            F.coalesce(F.col("_pa"), F.lit(0)).cast("double").alias("pa"),
            F.coalesce(F.col("_pb"), F.lit(0)).cast("double").alias("pb"),
        )
    )
    pa, pb = F.col("pa"), F.col("pb")
    term = (
        F.when(pa > 0, F.lit(0.5) * pa * F.log(F.lit(2.0) * pa / (pa + pb)))
        .otherwise(F.lit(0.0))
        + F.when(pb > 0, F.lit(0.5) * pb * F.log(F.lit(2.0) * pb / (pa + pb)))
        .otherwise(F.lit(0.0))
    ).cast("decimal(28,12)")
    return (
        j.select(
            "sa",
            "sb",
            ((pa > 0) & (pb > 0)).alias("shared"),
            term.alias("term"),
        )
        .groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union_tokens"),
            F.sum(F.col("shared").cast("int")).cast("long").alias(
                "n_shared_tokens"
            ),
            F.round(F.sum("term"), 9).cast("double").alias("jsd_nats"),
        )
    )


@query(
    "token_skipgram_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      FROM documents
    ),
    pos AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS i, tk[CAST(u.i AS BIGINT)] AS tok
      FROM toks, UNNEST(range(1, len(tk) + 1)) AS u(i)
    ),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b
      FROM pos a JOIN pos b
        ON b.doc_id = a.doc_id AND (b.i = a.i + 1 OR b.i = a.i + 2)
    )
    SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_cooccur
    FROM pairs GROUP BY 1, 2
    ORDER BY n_cooccur DESC, tok_a, tok_b LIMIT 50
    """,
)
def token_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 positional skip-gram pairs (window +1/+2, directed) over
    the corpus — the word2vec/GloVe training-pair extraction step, and
    the POSITIONAL companion to token_pmi_collocations' document-level
    co-occurrence: "mount everest" scores here even if both tokens
    appear in every document.

    Scale shape: pair generation is PURELY MAP-SIDE — a transform over
    each document's token array emits (token, token@+1), (token, +2)
    structs via try_element_at (null-safe at the tail), so there is NO
    positional self-join and no shuffle until the (tok_a, tok_b)
    groupBy, which combines map-side. Top-50 under (count desc, tok_a,
    tok_b) is TakeOrdered — no global sort. The oracle generates the
    same pairs by an explicit positional self-join; matching it proves
    the array-walk emits exactly the window pairs."""
    docs = t(spark, sf_dir, "documents")
    pair_expr = (
        "flatten(transform(tk, (x, i) -> "
        "filter(array("
        "struct(x AS a, try_element_at(tk, i + 2) AS b), "
        "struct(x AS a, try_element_at(tk, i + 3) AS b)"
        "), s -> s.b IS NOT NULL)))"
    )
    return (
        docs.select(
            F.expr(
                "regexp_extract_all(lower(text), '([a-z0-9]+)', 1)"
            ).alias("tk")
        )
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .groupBy(
            F.col("pr.a").alias("tok_a"), F.col("pr.b").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_cooccur"))
        .orderBy(
            F.col("n_cooccur").desc(),
            F.col("tok_a").asc(),
            F.col("tok_b").asc(),
        )
        .limit(50)
    )
