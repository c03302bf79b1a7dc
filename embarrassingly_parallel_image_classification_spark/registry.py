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
# driver's verified prefix (50 slots observed in rounds 1–5).
# ROUND-6 WINDOW (r5 verdict item 2 + this round's additions): first
# the 28 oracle-backed queries that had NEVER had a driver row after
# five rounds (the round-5 additions: lakehouse L1–L4, corpus pack,
# eval metrics, many-models/streaming inference, OHLC/trend/anomaly,
# arrow writer/UDF, scripting, provenance, chained agg, pretrain
# pipeline), then every round-6 oracle-backed addition (EWMA pair,
# ensemble, incremental dedup, multi-table txn, skyline/seq-pattern/
# allocation/TWAP pair/zorder/erase/rolling-median/MAD/MV-routing/
# TABLE-arg UDTF/negative mining+sampling/peak concurrency), then the
# cross-family canaries — new-coverage slots outrank re-verification
# when the 50-slot window is tight; canaries past slot 50 simply wait
# for round 7's rotation.
_DRIVER_PRIORITY = (
    # 1. The 28 never-driver-verified oracle-backed queries.
    # embeddings / timeseries / eval
    "q_embed_centroids",      # round-5 red: reshaped to long form (r6)
    "q_timeseries_ohlc",
    "q_timeseries_trend",
    "q_timeseries_ewma",      # new in r6 (exact dyadic EWMA)
    "q_anomaly_3sigma",
    "q_eval_auc",
    "q_eval_calibration",
    # inference tail
    "q_infer_many_models",
    "q_infer_ensemble",       # new in r6 (subspace ensemble + vote)
    "q_udf_arrow_native",
    # corpus retrieval pack
    "q_text_inverted_index",  # postings now array_join'd (r6)
    "q_text_bm25",
    "q_text_bpe_pairs",
    "q_corpus_shuffle",
    "q_text_boilerplate",
    # sources / sinks / SQL tail
    "q_scan_provenance",
    "q_sink_arrow_writer",
    "q_stream_chained_agg",
    "q_stream_ewma",          # new in r6 (stateful exact-EWMA twin)
    "q_stream_infer",
    "q_sql_scripting",
    "q_pipeline_pretrain",
    # lakehouse layer (round-5 addition, all oracle-backed)
    "q_lake_snapshots",
    "q_lake_overwrite_travel",
    "q_lake_merge",
    "q_lake_changes",
    "q_lake_stream_ingest",
    "q_lake_incremental_agg",
    "q_lake_delete_mor",
    "q_lake_schema_evolution",
    "q_lake_stream_source",
    "q_lake_multi_table_txn",  # new in r6 (atomic catalog commit)
    "q_dedup_incremental",     # new in r6 (batch-vs-corpus screen)
    # round-6 additions (no driver row yet, all oracle-backed)
    "q_skyline",               # Pareto frontier (two-phase distributed)
    "q_seq_pattern",           # MATCH_RECOGNIZE-style journey regex
    "q_alloc_prorata",         # largest-remainder allocation
    "q_timeseries_twap",       # time-weighted average (exact rational)
    "q_stream_twap",           # stateful streaming twin, same oracle
    "q_lake_zorder",           # OPTIMIZE ZORDER + multi-col pruning
    "q_lake_erase",            # GDPR cross-history erasure
    "q_window_rolling_median", # exact rolling order statistics
    "q_anomaly_mad",           # robust median/MAD outlier screen
    "q_mv_routing",            # aggregate-navigator MV rewrite
    "q_udtf_table_arg",        # TABLE-arg UDTF (partitioned+ordered)
    "q_mine_hard_negatives",   # contrastive hard-negative mining
    "q_sample_negatives",      # deterministic negative sampling
    "q_concurrency_peak",      # sweep-line peak occupancy
    "q_pareto_8020",           # revenue-concentration cut
    "q_markov_transitions",    # event-journey transition matrix
    "q_rfm_segments",          # RFM quartile segmentation
    "q_ab_test",               # exact integer two-sample test
    "q_bitmap_audience",       # bitmap-word audience overlap
    "q_changepoint_cusum",     # exact CUSUM split point
    "q_eval_lift",             # decile gains/lift table
    "q_join_interval_overlap", # bin-joined interval overlap
    "q_dedup_containment",     # probe-prefix containment screen
    "q_stream_topk",           # stateful streaming leaderboard
    "q_lake_clone",            # zero-copy shallow clone fork
    "q_grid_hotspots",         # 3x3 stencil density hotspots
    "q_funnel_window",         # 24h-attribution conversion funnel
    "q_graph_shortest_path",   # Bellman-Ford weighted SSSP
    "q_lake_stream_merge",     # streaming versioned CDC apply
    "q_agg_equidepth",         # two-phase-rank quantile binning
    "q_streaks",               # gaps-and-islands day streaks
    "q_period_over_period",    # WoW delta report
    "q_timeseries_xcorr",      # cross-series Pearson (exact stats)
    "q_attribution_lasttouch", # join-free last-touch attribution
    "q_window_drawdown",       # exact max drawdown per series
    "q_agg_mode",              # deterministic per-group mode
    "q_stream_bitmap_audience",  # semilattice bit_or streaming twin
    "q_lake_restore",          # roll-forward RESTORE commit
    "q_lake_write_quarantine", # dead-letter write enforcement
    "q_window_normalize",      # rolling z-score + minmax features
    "q_market_basket",         # association rules (conf/lift exact)
    "q_udtf_dynamic_schema",   # analyze()-typed polymorphic UDTF
    "q_scan_pushdown_source",  # Python DS pushFilters end to end
    "q_lake_incremental_join", # delta-join IVM over two tables
    "q_dedup_substring",       # exact duplicated-substring spans
    "q_quality_drift",         # integer TVD drift audit
    "q_text_collocations",     # integer-lift PMI collocations
    "q_clean_winsorize",       # exact rank-based p05/p95 clipping
    "q_split_kfold",           # portable md5 K-fold + strat audit
    "q_quality_ref_integrity", # FK orphan audit over the star schema
    "q_text_rarity",           # mean inverse-df rarity scoring
    "q_lake_partition_evolution",  # month→day spec evolution + pruning
    "q_stream_drift",          # streaming twin of the drift monitor
    "q_join_spatial_radius",   # grid-bucketed radius self-join
    "q_agg_weighted_median",   # exact cumulative-weight median
    "q_window_cume_nth",       # integer cume_dist + nth_value
    "q_multimodal_dup_frames", # cross-media duplicate-frame dedup
    "q_lake_branch_merge",     # branch + fast-forward merge
    "q_timeseries_seasonal",   # exact hour-of-day seasonal index
    "q_agg_listagg",           # ordered LISTAGG / STRING_AGG
    "q_fn_interval",           # calendar-interval arithmetic
    "q_agg_bool",              # BOOL_AND/BOOL_OR constraint aggs
    "q_udf_window_agg",        # pandas UDAF over a bounded window
    "q_lake_merge_when",       # WHEN-clause MERGE (update/delete/insert)
    "q_scan_merge_schema",     # mergeSchema drift-at-the-scan read
    "q_infer_quantized",       # int8-quantized integer-kernel serving
    "q_eval_pr_curve",         # exact thinned precision-recall curve
    "q_join_null_safe",        # <=> null-safe equality hash join
    "q_fn_format",             # printf/date_format report surface
    "q_lake_column_rename",    # column-mapping rename, zero rewrite
    "q_fn_url",                # parse_url host/path/query census
    "q_fn_collation",          # Spark 4 case-insensitive collation
    "q_sql_pipe",              # SQL |> pipe-syntax front end
    "q_union_by_name",         # schema-aligning union w/ missing cols
    "q_reshape_transpose",     # DataFrame.transpose presentation flip
    "q_text_perplexity",       # unigram-LM cross-entropy junk filter
    "q_geo_geohash",           # base32 Morton geohash density census
    "q_agg_approx_topk",       # mergeable heavy-hitters sketch (exact)
    "q_attribution_linear",    # largest-remainder multi-touch credit
    "q_ps_rolling",            # pandas-API rolling window (min_periods)
    "q_lake_default_column",   # scoped initial-default column add
    "q_fn_timezone",           # explicit-zone local-day rollup
    "q_sql_udf",               # SQL scalar + table UDFs (inlined)
    "q_scan_csv_corrupt",      # PERMISSIVE corrupt-record audit
    "q_lake_stream_fanout",    # exactly-once 2-table atomic fan-out
    "q_window_rolling_slope",  # exact rolling OLS slope, one sort
    "q_join_not_in_nulls",     # NOT IN vs NOT EXISTS 3VL contract
    "q_sink_dynamic_overwrite",  # partition-scoped idempotent reload
    "q_lake_null_pruning",     # nullCount file skipping (IS NOT NULL)
    # 2. Cross-family canaries, all driver-green in r1–r5 — behind the
    #    never-verified additions: new-coverage slots outrank
    #    re-verification when the 50-slot window is tight.
    "q_tpch_q9",              # TPC-H family canary
    "q_stream_tumbling",      # streaming family canary
    "q_dedup_ngram_jaccard",  # dedup family canary
    "q_window_firstlast",     # window family canary
    "q_join_asof",            # join/events family canary
    "q_text_chunking",        # text family canary
    "q_agg_basic",            # aggregate family canary
    "q_knn_exact",            # knn family canary
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
