"""Dominance, sequence, allocation and concentration analytics —
operator families a warehouse-grade engine ships that are not
reducible to the join/agg/window queries elsewhere in the registry
[PK]:

  * q_skyline       — Pareto frontier (skyline) of parts on
                      (price min, size max), via the canonical
                      two-phase distributed skyline plan;
  * q_seq_pattern   — MATCH_RECOGNIZE-style regex over per-user event
                      sequences (funnel generalized to arbitrary
                      patterns);
  * q_alloc_prorata — largest-remainder proportional allocation
                      (billing/settlement: spread an order total across
                      its lines so cents sum back exactly);
  * q_pareto_8020   — revenue-concentration cut (how many top
                      customers cover 80% of each segment).

All are pure-SQL/JVM plans with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t


@register(
    "q_skyline",
    oracle="""
    WITH p AS (
        SELECT p_partkey,
               CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_c,
               p_size
        FROM part
    )
    SELECT q.p_partkey, q.price_c, q.p_size
    FROM p q
    WHERE NOT EXISTS (
        SELECT 1 FROM p o
        WHERE o.price_c <= q.price_c AND o.p_size >= q.p_size
          AND (o.price_c < q.price_c OR o.p_size > q.p_size)
    )
    """,
    tags=("F", "E3", "composite"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on (cheaper,
    bigger) — the multi-objective shortlist operator (Börzsönyi's
    SKYLINE OF [PK]). The oracle is the O(n²) NOT-EXISTS definition;
    the Spark plan is the scale formulation:

    1. distinct (price, size) pairs (one shuffle — dominance only
       depends on the pair, so |pairs| << |rows| dedups first);
    2. LOCAL skyline per partition: sort (price asc, size desc) and
       keep rows whose size exceeds the running max of all strictly
       preceding rows — over DISTINCT pairs this running-max test is
       exactly non-dominance, and a global skyline point is a local
       skyline point under ANY partitioning, so phase 2's input is a
       small superset of the answer;
    3. GLOBAL skyline of the union of local skylines — same test on
       one partition, bounded by the candidate set (frontier-sized,
       not data-sized);
    4. broadcast the frontier pairs back to recover every part that
       carries a frontier (price, size) — ties on both dims are all
       non-dominated and all returned.
    """
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)").alias("price_c"),
        "p_size",
    )
    pairs = p.select("price_c", "p_size").distinct()

    def undominated(df: DataFrame, *partition_cols: str) -> DataFrame:
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(F.asc("price_c"), F.desc("p_size"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("__prev_max", F.max("p_size").over(w))
            .filter(
                F.col("__prev_max").isNull()
                | (F.col("__prev_max") < F.col("p_size"))
            )
            .drop("__prev_max")
        )

    local = undominated(pairs.withColumn("__pid", F.spark_partition_id()), "__pid").drop(
        "__pid"
    )
    # the candidate union is frontier-sized: the single-partition
    # window here scans |local skylines|, never |data|
    frontier = undominated(local.withColumn("__g", F.lit(0)), "__g").drop("__g")
    return p.join(F.broadcast(frontier), ["price_c", "p_size"]).select(
        "p_partkey", "price_c", "p_size"
    )


@register(
    "q_seq_pattern",
    oracle="""
    WITH j AS (
        SELECT user_id,
               string_agg(upper(substring(event_type, 1, 1)), ''
                          ORDER BY ts, event_id) AS journey,
               COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(strpos(journey, 'S') AS BIGINT) AS sig_pos,
           CAST(length(journey) - length(replace(journey, 'P', ''))
                AS BIGINT) AS n_purch
    FROM j
    WHERE regexp_matches(journey, 'S.*P.*P')
    """,
    tags=("composite", "D8", "H2"),
)
def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: each user's
    event history becomes an ordered symbol string (one char per
    event: S=signup, P=purchase, …), and a regex selects users whose
    JOURNEY matches — here 'S.*P.*P', signup later followed by two or
    more purchases (q_funnel generalized: any regular pattern, not one
    fixed A→B→C). The symbol encoding is the classic trick that turns
    arbitrary sequence predicates into one regexp over a per-key
    aggregate — one shuffle on user_id, then regex on strings of
    per-user length; no self-joins per step, no iteration. Order ties
    break on event_id in both engines, so the string is deterministic."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.upper(F.substring("event_type", 1, 1)).alias("sym"),
    )
    j = ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, sym)))"
            ", x -> x.sym), '')"
        ).alias("journey"),
        F.count("*").alias("n_events"),
    )
    return j.filter(F.col("journey").rlike("S.*P.*P")).select(
        "user_id",
        "n_events",
        F.expr("CAST(instr(journey, 'S') AS BIGINT)").alias("sig_pos"),
        F.expr(
            "CAST(length(journey) - length(replace(journey, 'P', '')) AS BIGINT)"
        ).alias("n_purch"),
    )


@register(
    "q_alloc_prorata",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty
        FROM lineitem WHERE l_orderkey % 5 = 0
    ),
    o AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_c
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    sh AS (
        SELECT l.l_orderkey, l.l_linenumber, o.total_c,
               SUM(l.qty) OVER (PARTITION BY l.l_orderkey) AS sumq,
               o.total_c * l.qty AS share_num
        FROM li l JOIN o ON o.o_orderkey = l.l_orderkey
    ),
    b AS (
        SELECT *,
               CAST(FLOOR(share_num / sumq) AS BIGINT) AS base,
               share_num - CAST(FLOOR(share_num / sumq) AS BIGINT) * sumq
                   AS rem
        FROM sh
    ),
    d AS (
        SELECT *,
               total_c - SUM(base) OVER (PARTITION BY l_orderkey) AS deficit,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY rem DESC, l_linenumber) AS rk
        FROM b
    )
    SELECT l_orderkey, l_linenumber,
           base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS alloc_c
    FROM d
    """,
    tags=("composite", "E1", "C1"),
)
def q_alloc_prorata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proportional allocation (Hamilton method
    [PK]) — the billing/settlement operator: spread each order's total
    (in cents) across its line items proportional to quantity such
    that the integer allocations SUM BACK EXACTLY to the total. Floor
    shares first, then hand the leftover cents to the largest
    fractional remainders (ties broken by line number). Everything is
    integer arithmetic on (total·qty, Σqty) — the float division only
    feeds a FLOOR on values < 2^53, identical in both engines. Plan:
    both window passes partition on l_orderkey, so the whole operator
    is ONE shuffle of lineitem plus a co-keyed join with orders —
    at 100 TB both sides bucket by orderkey and no window sees more
    than one order. The %5 key sample bounds the compared output."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("qty"),
        )
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("total_c"),
        )
    )
    wo = Window.partitionBy("l_orderkey")
    sh = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("sumq", F.sum("qty").over(wo))
        .withColumn("share_num", F.col("total_c") * F.col("qty"))
    )
    b = sh.withColumn(
        "base", F.expr("CAST(FLOOR(share_num / sumq) AS BIGINT)")
    ).withColumn("rem", F.col("share_num") - F.col("base") * F.col("sumq"))
    d = b.withColumn(
        "deficit", F.col("total_c") - F.sum("base").over(wo)
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("rem"), F.asc("l_linenumber")
            )
        ),
    )
    return d.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("base") + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)).alias(
            "alloc_c"
        ),
    )


@register(
    "q_pareto_8020",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_custkey
    ),
    ranked AS (
        SELECT segment, cents,
               SUM(cents) OVER (PARTITION BY segment
                                ORDER BY cents DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum_cents,
               SUM(cents) OVER (PARTITION BY segment) AS total_cents,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY cents DESC, o_custkey) AS rk,
               COUNT(*) OVER (PARTITION BY segment) AS n_cust
        FROM per_cust
    )
    SELECT segment,
           CAST(MIN(rk) AS BIGINT) AS cust_to_80pct,
           CAST(MIN(n_cust) AS BIGINT) AS n_customers
    FROM ranked
    WHERE cum_cents * 5 >= total_cents * 4
    GROUP BY segment
    """,
    tags=("composite", "E1", "D1"),
)
def q_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration cut (the 80/20 question): per market
    segment, how many top customers it takes to cover 80% of revenue —
    rank customers by revenue desc, running share over the ranked
    order, first rank whose cumulative share reaches 4/5. The
    threshold compares in pure integers (cum·5 ≥ total·4 — no float
    share to disagree over at the boundary); ties in revenue break on
    custkey so the rank is total. Plan: one orderkey-keyed aggregate,
    then ALL four windows share a single (segment) partitioning — one
    customer-level shuffle regardless of how many statistics ride
    along."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    by_rev = Window.partitionBy("segment").orderBy(
        F.desc("cents"), F.asc("o_custkey")
    )
    whole = Window.partitionBy("segment")
    ranked = per_cust.select(
        "segment",
        "cents",
        F.sum("cents")
        .over(by_rev.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_cents"),
        F.sum("cents").over(whole).alias("total_cents"),
        F.row_number().over(by_rev).alias("rk"),
        F.count("*").over(whole).alias("n_cust"),
    )
    return (
        ranked.filter(F.col("cum_cents") * 5 >= F.col("total_cents") * 4)
        .groupBy("segment")
        .agg(
            F.min("rk").cast("bigint").alias("cust_to_80pct"),
            F.min("n_cust").cast("bigint").alias("n_customers"),
        )
    )
