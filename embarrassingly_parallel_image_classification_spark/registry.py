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
# driver's verified prefix (50 slots observed in rounds 1–4).
# ROUND-5 WINDOW (per the round-4 verdict's top item): after four
# rounds, 131 distinct queries have driver-verified green rows; exactly
# 42 oracle-backed queries have NEVER had one (all local-green under
# scripts/drive_contract.py + tests/test_oracle_parity.py). This window
# pins all 42, closing the evidence gap to 173/173 oracle-backed
# queries driver-verified at least once, plus 8 cross-family canaries
# (each green in r1–r4) guarding against regression drift in the
# families whose code changed this round (graph persist fix, dedup
# rational bounds, pandas-api fixed-point sums).
_DRIVER_PRIORITY = (
    # 1. The 42 never-driver-verified oracle-backed queries.
    # TPC-H stragglers
    "q_tpch_q11",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q20",
    # function-family tail
    "q_fn_string_ext",
    "q_fn_bitwise",
    "q_fn_editdist",
    "q_fn_binary",
    "q_fn_try_safe",
    "q_variant_extract",
    "q_sql_portable",
    # sampling / aggregates / quality
    "q_sample_mixture",
    "q_agg_histogram",
    "q_agg_countmin",
    "q_observe_metrics",
    "q_quality_expectations",
    "q_scale_zorder",
    "q_scale_compaction",
    # ML / inference / embeddings
    "q_embed_centroids",
    "q_infer_batch_pbu",
    "q_infer_eval",
    "q_udf_classic",
    "q_udf_map_arrow",
    "q_knn_exact_pandas",
    # dedup portable tiers + embedding pairs
    "q_dedup_minhash_portable",
    "q_dedup_simhash_portable",
    "q_dedup_embedding",
    # text-pipeline tail
    "q_text_langid",
    "q_text_cdc_chunks",
    "q_text_packing",
    "q_text_redact",
    "q_text_feature_hash",
    # multimodal
    "q_multimodal_features",
    "q_multimodal_frames",
    # sources / sinks
    "q_scan_xml",
    "q_stream_custom_source",
    "q_sink_custom_writer",
    "q_stream_custom_sink",
    # streaming tail
    "q_stream_session_dynamic",
    "q_stream_stateful",
    "q_stream_outer_join",
    # pandas-API tail
    "q_ps_cumsum",
    # 2. Cross-family canaries, all driver-green in r1–r4, re-proving
    #    this round's code changes (graph, dedup, pandas-api) and one
    #    healthy representative per major family.
    "q_graph_pagerank",       # persist→localCheckpoint fix (this round)
    "q_dedup_ngram_jaccard",  # rational prefix bounds (this round)
    "q_ps_groupby",           # fixed-point avg (this round)
    "q_ps_pipeline",          # fixed-point revenue (this round)
    "q_tpch_q9",              # TPC-H family canary
    "q_stream_tumbling",      # streaming family canary
    "q_window_firstlast",     # window family canary
    "q_join_asof",            # join/events family canary
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
        "ml.corpus",
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
