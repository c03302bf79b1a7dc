"""F1–F4: sort / limit / top-k (SURVEY.md §2-F).

Scale notes: global orderBy is a range-partitioned sort (sampled
boundaries, fully parallel); orderBy+limit fuses into
TakeOrderedAndProject (per-partition heap of k, tiny driver merge —
O(k) memory at any scale); per-group top-k is a ranking window +
filter, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t


@register(
    "q_sort",
    oracle="""
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 6) AS acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
    tags=("F1",),
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (driver compare is order-insensitive, but the plan
    exercises the range-partitioned sort path)."""
    return (
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 6).alias("acctbal"))
        .orderBy(F.desc("acctbal"), F.asc("s_suppkey"))
    )


@register(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("F2",),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject. Unique tiebreak (orderkey)
    makes the top-20 set deterministic across engines."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
    tags=("F3",),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per segment (k-most-confident-tiles-
    per-class analog [PK])."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register("q_freq_items", oracle=None, tags=("F4", "rows-only"))
def q_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.freqItems: single-pass heavy-hitter sketch (Karp et al.) —
    the constant-memory alternative to groupBy-count-sort when only
    items above a support threshold matter. Approximate (may include
    false positives) ⇒ rows-only; the no-false-negatives guarantee is
    asserted in tests/test_approx.py."""
    ev = t(spark, sf_dir, "events")
    freq = ev.freqItems(["event_type", "user_id"], support=0.1)
    return freq.select(
        F.array_join(
            F.sort_array(F.col("event_type_freqItems")), ","
        ).alias("frequent_types"),
        F.size(F.col("user_id_freqItems")).alias("n_frequent_users"),
    )


@register(
    "q_topk_freq",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 3
    """,
    tags=("F4",),
)
def q_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: agg-then-topk — the aggregation shrinks the data
    to |domain| rows before the top-k, so this is 100-TB safe."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(3)
    )


@register(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, c2.c_custkey, c2.acctbal_cents
    FROM nation n, LATERAL (
        SELECT c_custkey,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2) c2
    """,
    tags=("F3", "C8"),
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via a correlated LATERAL subquery
    (DataFrame.lateralJoin, Spark 4) — the SQL-native alternative to
    the window+filter idiom of q_topk_per_group: for each nation, its
    two richest customers. Catalyst decorrelates the LIMITed subquery
    into a ranked join (DomainJoin → window), so the plan is still one
    shuffle — no per-outer-row re-execution. Money compared in integer
    cents for cross-engine exactness."""
    nat = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    sub = (
        cust.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(2)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("acctbal_cents"),
        )
    )
    return nat.lateralJoin(sub).select("n_name", "c_custkey", "acctbal_cents")
