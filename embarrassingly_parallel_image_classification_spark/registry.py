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
# driver's verified prefix (50 slots observed in rounds 1-9).
# ROUND-12 WINDOW (r11 verdict item 1; tuple from scripts/next_window.py,
# generated ONCE at round-12 open): 50 of the 61 never-driver-verified
# round-11-session-2 registrations, in registration order (11 overflow
# and lead the round-13 rotation: q_text_kwic, q_text_phrase_search,
# q_train_tree_depth2/3, q_train_perceptron, q_scan_text,
# q_sql_execute_immediate/udf_lateral/exec_into/collation/lateral_alias).
# No rotation/canary or rows-only slots this round — never-verified
# oracle queries always fill the window first (next_window.py rule 1).
_DRIVER_PRIORITY = (
    "q_agg_kmv_distinct",
    "q_timeseries_holt_winters",
    "q_timeseries_decompose",
    "q_timeseries_croston",
    "q_stats_cochran_q",
    "q_stats_jonckheere",
    "q_stats_friedman",
    "q_ts_ljung_box",
    "q_stats_brown_forsythe",
    "q_ts_granger",
    "q_stats_dunn",
    "q_stats_tukey",
    "q_stats_games_howell",
    "q_stats_mann_kendall",
    "q_stats_jarque_bera",
    "q_stats_cramer_von_mises",
    "q_stats_mood_median",
    "q_stats_ansari_bradley",
    "q_stats_lepage",
    "q_stats_cochran_armitage",
    "q_stats_cmh",
    "q_stats_page_trend",
    "q_stats_seasonal_mk",
    "q_stats_prop_ztest",
    "q_stats_mh_odds",
    "q_stats_kendall_w",
    "q_stats_cohen_kappa",
    "q_stats_cronbach_alpha",
    "q_stats_brunner_munzel",
    "q_stats_eta_squared",
    "q_stats_partial_corr",
    "q_stats_point_biserial",
    "q_stats_durbin_watson",
    "q_stats_turning_points",
    "q_stats_mahalanobis",
    "q_ab_power",
    "q_agg_trimmed_mean",
    "q_graph_clustering_coeff",
    "q_graph_assortativity",
    "q_graph_kcore",
    "q_graph_reciprocity",
    "q_fn_try_arithmetic",
    "q_fn_luhn",
    "q_eval_brier",
    "q_knn_hamming_postdedup",
    "q_knn_sq8",
    "q_knn_self_join",
    "q_text_winnowing",
    "q_text_symspell",
    "q_dedup_minhash_affine",
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
