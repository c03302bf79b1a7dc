"""C1–C9: the join family (SURVEY.md §2-C).

Reference analog: pandas ``merge`` on tile id for evaluation and the
2010-vs-2016 change-detection self-join [PK]. Here each shape maps to a
Catalyst join strategy chosen deliberately:

* facts ⋈ facts → sort-merge (shuffle on key, AQE-coalesced);
* fact ⋈ small dim → broadcast hash (explicit ``F.broadcast`` hint);
* semi/anti → dedicated join types (never a distinct-after-inner);
* range/theta → bucket-prefilter + BNLJ only within buckets at scale;
* as-of → union + window (zero theta join), the scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localframe import local_df
from ..registry import register
from ..sources.tables import t


@register(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("C1",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer (predictions⋈truth analog)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 6) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("C2", "D1"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dim chain (customer→nation→region). The label
    taxonomy lookup of the reference [PK] — dims stay broadcast at any
    scale because region/nation are fixed-size."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 6).alias("total_acctbal"),
        )
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(o.n_orders, 0) AS n_orders,
           ROUND(COALESCE(o.total_spend, 0.0), 6) AS total_spend
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS total_spend
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("C3",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders. Aggregate-
    before-join: the fact table is reduced to one row per key *before*
    the join — the 100-TB-safe formulation."""
    c = t(spark, sf_dir, "customer")
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total_spend"))
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("total_spend", F.lit(0.0)), 6).alias("total_spend"),
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("C4",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — EXISTS without duplicating the left side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
    """,
    tags=("C5",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the reference's 'tiles scored in one year but
    absent the other' set difference [PK≈]. The probe side is orders
    FILTERED to final status: every fixture customer has some order,
    so the unfiltered anti-join was a vacuous empty-vs-empty oracle
    match (r6-verdict pattern); against 'F' orders the result is
    non-empty at every SF and the anti-join semantics are actually
    exercised."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_self",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(o_orderkey) AS first_key,
               MAX(o_orderkey) AS last_key
        FROM orders GROUP BY o_custkey
    )
    SELECT f.o_custkey,
           a.o_totalprice AS first_price,
           b.o_totalprice AS last_price,
           ROUND(b.o_totalprice - a.o_totalprice, 6) AS price_delta
    FROM firsts f
    JOIN orders a ON a.o_orderkey = f.first_key
    JOIN orders b ON b.o_orderkey = f.last_key
    """,
    tags=("C6",),
)
def q_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: first vs last order per customer — the 2010-vs-2016
    prediction-snapshot comparison [PK] on one table with two aliases."""
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("first_key"), F.max("o_orderkey").alias("last_key")
    )
    a = o.alias("a")
    b = o.alias("b")
    return (
        firsts.join(a, F.col("a.o_orderkey") == F.col("first_key"))
        .join(b, F.col("b.o_orderkey") == F.col("last_key"))
        .select(
            firsts.o_custkey,
            F.col("a.o_totalprice").alias("first_price"),
            F.col("b.o_totalprice").alias("last_price"),
            F.round(F.col("b.o_totalprice") - F.col("a.o_totalprice"), 6).alias("price_delta"),
        )
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    tags=("C7",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (guarded to small dims; the basis of brute-force kNN)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_range",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('small', 0.0, 1000.0), ('mid', 1000.0, 1400.0), ('large', 1400.0, 1e9)
    )
    SELECT b.band, COUNT(*) AS n_parts, ROUND(AVG(p.p_retailprice), 6) AS avg_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    tags=("C8",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: parts into price bands. The band table is tiny →
    broadcast nested loop, the right plan; at scale band membership of a
    huge probe side stays a broadcast BNLJ (O(n·bands))."""
    p = t(spark, sf_dir, "part")
    bands = local_df(
        spark,
        [("small", 0.0, 1000.0), ("mid", 1000.0, 1400.0), ("large", 1400.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
    )


@register(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id,
                      CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, value,
                      CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           MAX(c.tsec) AS last_click_sec
    FROM p JOIN c ON c.user_id = p.user_id AND c.tsec <= p.tsec
    GROUP BY p.event_id, p.user_id
    """,
    tags=("C9",),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it.

    Implemented WITHOUT a theta join: union both sides tagged, one window
    sorted by time carries the last click forward (last ignorenulls).
    One shuffle on user_id instead of an O(clicks×purchases) nested loop —
    this is the formulation that survives 100 TB. Oracle uses the naive
    greatest-match SQL (fine for DuckDB at sf0.01).

    Timestamps are second-truncated on both sides (fixture ts is ns;
    Spark µs vs DuckDB ns would otherwise diverge — SURVEY §7 risk 1).
    """
    ev = t(spark, sf_dir, "events")
    tsec = F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("tsec")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", tsec)
    c = ev.filter(F.col("event_type") == "click").select("user_id", tsec)
    unioned = p.withColumn("click_sec", F.lit(None).cast("long")).unionByName(
        c.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "tsec",
            F.col("tsec").alias("click_sec"),
        )
    )
    # Clicks sort before purchases at the same tsec (is_purchase=0 first)
    # so a same-second click matches `<=`.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("tsec"), F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_click_sec", F.last("click_sec", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull() & F.col("last_click_sec").isNotNull())
        .select("event_id", "user_id", "last_click_sec")
    )


@register(
    "q_fuzzy_join",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    tags=("C", "H12", "K"),
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (edit-distance) self-join — the entity-resolution
    primitive: candidate pairs come from an EQUI-join on a blocking key
    (the product-name noun), and the expensive levenshtein runs on
    candidates only. Same block→verify architecture as the LSH dedup
    paths: never all-pairs. Matching runs on the DISTINCT name domain
    (64 values), not the 2k-row table — dedupe before matching, then
    propagate, the standard ER pipeline shape. All-integer distance, so
    exact across engines."""
    names = t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (
                F.split_part(F.col("name_a"), F.lit(" "), F.lit(2))
                == F.split_part(F.col("name_b"), F.lit(" "), F.lit(2))
            )
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 2)
    )


@register(
    "q_join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT event_id, event_type, epoch_us(ts) AS s,
               epoch_us(ts) + (1 + event_id % 30) * 60000000 AS e
        FROM events
    ),
    a AS (SELECT * FROM iv WHERE event_id % 2 = 0),
    b AS (SELECT * FROM iv WHERE event_id % 2 = 1)
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.event_type,
           LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_us
    FROM a JOIN b
      ON a.event_type = b.event_type AND a.s < b.e AND b.s < a.e
    """,
    tags=("C8", "composite", "timeseries"),
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP JOIN — the temporal-join workhorse (maintenance
    windows × incidents, sessions × campaigns): every pair of
    overlapping intervals across two sets, with the exact overlap in
    microseconds. The oracle is the naive range join; the Spark plan is
    the scale formulation — bin-and-equi-join:

    1. each interval [s, e) explodes into the HOUR buckets it touches
       (sequence on integer hours — bounded fanout: duration ≤ 30 min
       means ≤ 2 buckets per interval);
    2. candidates come from an EQUI-join on (event_type, hour bucket) —
       hash-partitioned, co-located, never a BNLJ over the cross
       product (the q_join_range theta shape made scalable);
    3. the overlap predicate verifies candidates, and each surviving
       pair is emitted ONLY in the bucket containing its overlap start
       (hr = greatest(a.s, b.s) div 1h) — the canonical-bucket trick
       that replaces a pair-distinct shuffle with a free filter;
    4. overlap_us = least(e) − greatest(s), pure integer micros.

    At 100 TB the bucket width tunes to the duration distribution
    (buckets ≈ median duration keep fanout ≈ 2 and candidates tight);
    skewed hot hours split by (bucket, salt) exactly like the salted
    join."""
    hour_us = 3_600_000_000
    iv = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + (1 + F.col("event_id") % 30) * 60_000_000).alias("e"),
    )
    binned = iv.withColumn(
        "hr",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {hour_us}"),
                F.expr(f"(e - 1) DIV {hour_us}"),
            )
        ),
    )
    a = binned.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("a_id"),
        "event_type",
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
        "hr",
    )
    b = binned.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_type"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
        F.col("hr").alias("b_hr"),
    )
    pairs = (
        a.join(b, (a.event_type == b.b_type) & (a.hr == b.b_hr))
        .filter(
            (F.col("a_s") < F.col("b_e"))
            & (F.col("b_s") < F.col("a_e"))
            # canonical bucket: count the pair only where its overlap starts
            & (
                F.expr(f"greatest(a_s, b_s) DIV {hour_us}") == F.col("hr")
            )
        )
    )
    return pairs.select(
        "a_id",
        "b_id",
        "event_type",
        (F.least("a_e", "b_e") - F.greatest("a_s", "b_s")).alias("overlap_us"),
    )


@register(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
        SELECT NULLIF(user_id % 5, 4) AS grp_key,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(o_custkey % 5, 4) AS grp_key,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT a.grp_key AS grp_key, n_events, n_orders
    FROM a JOIN b ON a.grp_key IS NOT DISTINCT FROM b.grp_key
    """,
    tags=("C1", "B4"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (`<=>` ≡ IS NOT DISTINCT FROM): the
    join a plain equi-join silently drops — NULL keys match NULL keys
    (here the sentinel bucket NULLIF(x % 5, 4) on both sides), which
    is what correct dimension joins over nullable business keys
    need. Spark plans `<=>` as a HASH join (the null-safe comparator
    is hashable), NOT a nested loop — the plan lint's no-BNLJ rule
    still holds, which is itself the point: null-safe does not cost
    the equi-join plan."""
    a = (
        t(spark, sf_dir, "events")
        .groupBy(F.nullif(F.col("user_id") % 5, F.lit(4)).alias("grp_key"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    b = (
        t(spark, sf_dir, "orders")
        .groupBy(F.nullif(F.col("o_custkey") % 5, F.lit(4)).alias("grp_key"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    return a.join(b, a["grp_key"].eqNullSafe(b["grp_key"])).select(
        a["grp_key"].alias("grp_key"), "n_events", "n_orders"
    )


@register(
    "q_join_not_in_nulls",
    oracle="""
    WITH ok AS (SELECT o_custkey FROM orders),
         okn AS (SELECT o_custkey FROM orders
                 UNION ALL SELECT NULL),
         t1 AS (SELECT COUNT(*) AS n FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM okn)),
         t2 AS (SELECT COUNT(*) AS n FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM okn o
                                  WHERE o.o_custkey = c.c_custkey)),
         t3 AS (SELECT COUNT(*) AS n FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM ok))
    SELECT CAST(t1.n AS BIGINT) AS n_not_in_with_null,
           CAST(t2.n AS BIGINT) AS n_not_exists,
           CAST(t3.n AS BIGINT) AS n_not_in_clean
    FROM t1, t2, t3
    """,
    tags=("C5", "SQL"),
)
def q_join_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN / NOT EXISTS three-valued-logic trap, pinned as a
    correctness contract: against a subquery containing one NULL,
    `NOT IN` returns ZERO rows (x <> NULL is UNKNOWN, so no row ever
    satisfies the predicate — ANSI semantics both engines implement),
    while `NOT EXISTS` with an equality correlate ignores the NULL and
    returns the true anti-join count; the clean-list NOT IN agrees
    with NOT EXISTS. Every data team hits this once — here the engine
    pair is proven to agree on all three counts. Scale note: a
    nullable NOT IN compiles to a NULL-AWARE anti join, which Spark
    can only execute broadcast (BroadcastNestedLoop for the general
    case) — at 100 TB rewrite to NOT EXISTS / left_anti, which plans
    as a shuffled hash anti join; this query documents WHY the rewrite
    is semantics-preserving exactly when the subquery column is
    non-null."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("__nin_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("__nin_orders")
    return spark.sql(
        """
        WITH ok AS (SELECT o_custkey FROM __nin_orders),
             okn AS (SELECT o_custkey FROM __nin_orders
                     UNION ALL SELECT CAST(NULL AS BIGINT)),
             t1 AS (SELECT COUNT(*) AS n FROM __nin_customer
                    WHERE c_custkey NOT IN (SELECT o_custkey FROM okn)),
             t2 AS (SELECT COUNT(*) AS n FROM __nin_customer c
                    WHERE NOT EXISTS (SELECT 1 FROM okn o
                                      WHERE o.o_custkey = c.c_custkey)),
             t3 AS (SELECT COUNT(*) AS n FROM __nin_customer
                    WHERE c_custkey NOT IN (SELECT o_custkey FROM ok))
        SELECT t1.n AS n_not_in_with_null,
               t2.n AS n_not_exists,
               t3.n AS n_not_in_clean
        FROM t1, t2, t3
        """
    )
