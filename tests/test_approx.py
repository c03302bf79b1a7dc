"""Error bounds for the approximate operators (the 100-TB variants of
exact aggregates): approx must land within its documented tolerance of
the exact answer, or the scale path is silently lying."""

from __future__ import annotations

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.sources.tables import t
from tests.conftest import SF_T2


def test_approx_count_distinct_within_rsd(spark):
    li = t(spark, SF_T2, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err < 0.06, f"{r['l_returnflag']}: rel err {rel_err:.3f} (3×rsd bound)"


def test_hll_sketch_union_estimate_close_to_exact(spark):
    from embarrassingly_parallel_image_classification_spark import registry

    row = registry.queries()["q_agg_hll_sketch"](spark, SF_T2).collect()[0]
    exact = t(spark, SF_T2, "lineitem").select("l_orderkey").distinct().count()
    assert abs(row["est_total"] - exact) / exact < 0.05


def test_freq_items_contains_all_true_heavy_hitters(spark):
    """freqItems(support=s) guarantees no false NEGATIVES: every value
    with true frequency ≥ s must appear (false positives are allowed)."""
    ev = t(spark, SF_T2, "events")
    n = ev.count()
    freq = ev.freqItems(["event_type"], support=0.1).collect()[0]["event_type_freqItems"]
    true_heavy = [
        r["event_type"]
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] / n >= 0.1
    ]
    assert set(true_heavy) <= set(freq)


def test_approx_percentile_close_to_exact(spark):
    li = t(spark, SF_T2, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01
