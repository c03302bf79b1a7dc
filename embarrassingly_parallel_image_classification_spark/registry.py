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
    # ANSI SQL for DuckDB, a zero-arg callable returning it (resolved
    # when oracle_sql() is called — for oracles that embed runtime
    # state like a pid-scoped scratch path), or None => rows-only check
    oracle: Optional[str | Callable[[], str]]
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
    """Oracle SQL per query; callable oracles resolve NOW (i.e. in the
    process and at the time the driver asks, not at import)."""
    return {
        n: (s.oracle() if callable(s.oracle) else s.oracle)
        for n, s in specs().items()
        if s.oracle is not None
    }


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
# driver's verified prefix (50 slots observed in rounds 1-8).
# ROUND-9 WINDOW (r8 verdict item 1; tuple from scripts/next_window.py,
# generated ONCE at round-9 open): the 12 never-driver-verified late-r8
# registrations (all judge-verified EXACT in the r8 verdict session) +
# 38 rotation slots re-proving the OLDEST standing driver evidence
# (r1-era greens) against today's code — the r7-item-6 rolling
# re-verification policy. Queries registered during round 9 land after
# slot 50 in registration order and form round 10's never-verified head.
_DRIVER_PRIORITY = (
    "q_agg_quantile_select",
    "q_agg_group_median_select",
    "q_feat_target_kfold",
    "q_pipeline_features",
    "q_feat_robust_scale",
    "q_train_linreg_gd",
    "q_scan_file_metadata",
    "q_stream_feature_serve",
    "q_sql_group_by_all",
    "q_pipeline_entity_resolution",
    "q_lake_snapshot_diff",
    "q_lake_replicate",
    "q_tpch_q9",
    "q_stream_tumbling",
    "q_dedup_ngram_jaccard",
    "q_window_firstlast",
    "q_join_asof",
    "q_text_chunking",
    "q_agg_basic",
    "q_knn_exact",
    "q_project",
    "q_filter",
    "q_case_when",
    "q_null_handling",
    "q_distinct",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_self",
    "q_join_cross",
    "q_join_range",
    "q_agg_global",
    "q_agg_conditional",
    "q_agg_distinct",
    "q_pivot_confusion",
    "q_agg_rollup",
    "q_agg_collect",
    "q_agg_percentile",
    "q_agg_stats",
    "q_agg_minby",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_unpivot",
    "q_window_rank",
    "q_window_lag",
    "q_window_running",
    "q_window_ntile",
    "q_sort",
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
        "operators.analytics",
        "operators.stats",
        "operators.graph",
        "operators.setops",
        "functions.scalar",
        "functions.vectors",
        "ml.inference",
        "ml.udfs",
        "ml.knn",
        "ml.dedup",
        "ml.cluster",
        "ml.text",
        "ml.corpus",
        "ml.cleaning",
        "ml.curation",
        "ml.features",
        "ml.training",
        "ml.multimodal",
        "sources.formats",
        "sources.custom",
        "streaming.queries",
        "plans.tpch",
        "plans.tpch2",
        "plans.scale",
        "plans.pipeline",
        "plans.lakehouse",
        "pandas_api",
)
# NOTE: module-load errors propagate — a missing/broken module must fail
# loudly, never silently shrink the registry (a swallowed import error
# here would just make the driver run fewer correctness checks).
