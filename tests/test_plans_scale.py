"""Physical-plan assertions for the scale-technique library
(plans/scale.py): each technique must actually change the plan the way
it claims, not just return correct values."""

from __future__ import annotations

import pyspark.sql.functions as F

from embarrassingly_parallel_image_classification_spark import registry
from embarrassingly_parallel_image_classification_spark.plans import scale
from embarrassingly_parallel_image_classification_spark.sources.tables import t
from tests.conftest import SF_T2
from tests.test_plans import explain_str


def test_bucketed_join_has_no_exchange_or_sort(spark):
    """Both sides pre-bucketed+sorted by the join key → SMJ with zero
    Exchange and zero Sort in the final plan."""
    registry.queries()["q_scale_bucketed_join"](spark, SF_T2).collect()  # ensure tables
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    tag = "sf0_01"
    li = spark.table(f"lineitem_b_{tag}")
    o = spark.table(f"orders_b_{tag}")
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    plan = explain_str(joined)
    tree = plan.split("== Physical Plan ==")[1].split("(1) ")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in tree, f"bucketed join still shuffles:\n{tree}"
    assert "Sort" not in tree.replace("SortMergeJoin", "SMJ"), (
        f"bucketed join still sorts:\n{tree}"
    )


def test_bloom_filter_prunes_fact_rows(spark):
    """The Bloom pre-filter must actually reduce the fact side: probe
    the filter alone and check its selectivity against the true match
    set (false-positive rate well under 5%)."""
    li = t(spark, SF_T2, "lineitem")
    urgent = t(spark, SF_T2, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    words = scale.build_bloom(urgent, "o_orderkey")
    kept = li.filter(scale.bloom_might_contain(words, F.col("l_orderkey"))).count()
    true_matches = li.join(
        urgent.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    ).count()
    total = li.count()
    assert kept >= true_matches  # no false negatives — Bloom guarantee
    fp = (kept - true_matches) / max(total - true_matches, 1)
    assert fp < 0.05, f"bloom false-positive rate {fp:.3f} too high"
    assert kept < total * 0.5, "bloom filter pruned almost nothing"


def test_bloom_probe_is_jvm_side(spark):
    """The membership test must compile to Catalyst expressions (no
    Python eval nodes) so it runs inside codegen at the scan."""
    li = t(spark, SF_T2, "lineitem")
    urgent = t(spark, SF_T2, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    words = scale.build_bloom(urgent, "o_orderkey")
    pruned = li.filter(scale.bloom_might_contain(words, F.col("l_orderkey")))
    plan = explain_str(pruned)
    assert "EvalPython" not in plan
    assert "Filter" in plan


def test_salted_join_row_count_matches_plain(spark):
    o = t(spark, SF_T2, "orders").withColumnRenamed("o_custkey", "join_key")
    c = t(spark, SF_T2, "customer").withColumnRenamed("c_custkey", "join_key")
    assert scale.salted_join(o, c, "join_key").count() == o.join(c, "join_key").count()
