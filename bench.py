"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query executes to a no-op sink so we
measure full plan execution (scan → shuffle → sink) without driver
collect overhead. Prints:

    {"metric": "total_runtime", "value": <sum sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from embarrassingly_parallel_image_classification_spark import registry
from embarrassingly_parallel_image_classification_spark.session import get_spark

# One per operator family: scan+agg, joins, windows, topk, Arrow
# inference, vector search, dedup (exact + LSH), text, JSON, streaming.
HEADLINE = [
    "q_agg_basic",
    "q_agg_rollup",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_asof",
    "q_window_rank",
    "q_window_running",
    "q_topk_per_group",
    "q_infer_batch",
    "q_knn_exact",
    "q_knn_ivf",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_text_wordcount",
    "q_text_quality",
    "q_json_extract",
    "q_udf_grouped_agg",
    "q_stream_tumbling",
    "q_tpch_q1",
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q21",
    "q_scale_bloom_prune",
    "q_sessionize",
    "q_graph_pagerank",
    "q_embed_centroids",
    "q_multimodal_frames",
    # round-2 session-4 additions: LLM-corpus prep + time-series windows
    "q_text_chunking",
    "q_text_packing",
    "q_window_time_range",
    "q_lateral_topn",
    # round-4 additions: CDC chunking + weighted sampling (both cheap;
    # the heavy new dedup paths are profiled in BASELINE.md instead so
    # the headline total stays comparable round-over-round)
    "q_text_cdc_chunks",
    "q_sample_weighted",
    # round-5 additions: corpus retrieval / tokenizer-prep pack (each
    # ≤2.3 s warm at sf0.1; the 33-query subset above stays the
    # round-over-round comparison basis — see BASELINE.md)
    "q_text_inverted_index",
    "q_text_bm25",
    "q_text_bpe_pairs",
    "q_corpus_shuffle",
    "q_text_boilerplate",
    # round-6 additions (r5 verdict item 5): one line per round-5
    # family — lakehouse DML, exact eval metrics, per-tenant inference,
    # PQ-compressed ANN (search timed; PQ/IVF builds are untimed warmup
    # like the IVF index)
    "q_lake_merge",
    "q_eval_auc",
    "q_infer_many_models",
    "q_knn_pq",
    "q_knn_ivfpq",
    # round-6 new operators (exact EWMA 0.74 s, incremental two-corpus
    # dedup screen 2.1 s, subspace-ensemble vote — all warm at sf0.1)
    "q_timeseries_ewma",
    "q_dedup_incremental",
    "q_infer_ensemble",
    # round-6 analytics additions: dominance / sequence / allocation /
    # time-weighted bars + the z-ordered lakehouse rewrite
    "q_skyline",
    "q_seq_pattern",
    "q_alloc_prorata",
    "q_timeseries_twap",
    "q_lake_zorder",
    # round-6 continuation: robust stats, occupancy, concentration,
    # contrastive prep, MV routing (all sub-second at sf0.1)
    "q_window_rolling_median",
    "q_anomaly_mad",
    "q_concurrency_peak",
    "q_pareto_8020",
    "q_mine_hard_negatives",
    "q_mv_routing",
    # round-6 session-2 additions: behavioral/statistical analytics,
    # distributed-rank, interval join, containment dedup, SSSP
    "q_markov_transitions",
    "q_ab_test",
    "q_bitmap_audience",
    "q_eval_lift",
    "q_join_interval_overlap",
    "q_dedup_containment",
    "q_changepoint_cusum",
    "q_agg_equidepth",
    "q_streaks",
    "q_graph_shortest_path",
    "q_window_normalize",
    "q_market_basket",
    # round-6 session-3 additions: exact-substring dedup spans (the
    # heaviest new line — gram inversion over the whole corpus),
    # drift audit, PMI collocations, winsorize, rarity (all cheap)
    "q_dedup_substring",
    "q_quality_drift",
    "q_text_collocations",
    "q_clean_winsorize",
    "q_text_rarity",
    # session-3 continuation: spatial radius join (grid-bucketed —
    # verifies ~400k true pairs at sf0.1), weighted median, cume/nth
    "q_join_spatial_radius",
    "q_agg_weighted_median",
    "q_window_cume_nth",
    "q_knn_ivfpq_residual",
    # session-3 tail: exact seasonal index, int8-quantized serving
    "q_timeseries_seasonal",
    "q_infer_quantized",
    # session-4 additions: perplexity filter (full-corpus LM), geohash
    # census, rolling OLS slope, linear attribution, timezone rollup,
    # corrupt-CSV audit, one metadata-evolution lakehouse line
    "q_text_perplexity",
    "q_geo_geohash",
    "q_window_rolling_slope",
    "q_attribution_linear",
    "q_fn_timezone",
    "q_scan_csv_corrupt",
    "q_lake_column_rename",
    # session-5 additions: exact integer KMeans (2 Lloyd iterations —
    # the per-iteration broadcast+shuffle kernel is the timed object),
    # temperature mixture rates, Heaps-law vocab curve, deterministic
    # label propagation over the strong-tie graph
    "q_cluster_kmeans",
    "q_mix_temperature",
    "q_text_vocab_growth",
    "q_graph_label_prop",
    "q_embed_covariance",
    "q_scale_skew_audit",
    "q_privacy_k_anon",
    "q_reconcile_checksum",
    "q_quality_benford",
    # round-7 curation pack: contamination screen (map-side-distinct
    # grams + broadcast eval join — the r7 plan fix), Gopher rule
    # bitmask, exact-cluster retention (window-free agg), learned-
    # filter inference (broadcast weight table)
    "q_text_decontaminate",
    "q_quality_gopher",
    "q_dedup_retention_exact",
    "q_quality_linear_clf",
    # round-7 active-learning selection: margin sampling over the
    # quantized integer kernel, global top-K (TakeOrderedAndProject)
    "q_select_uncertain",
    # round-7 filtered vector search (pre-filter tier, exact recall)
    "q_knn_filtered",
    # q_dedup_semantic stays non-headline like q_pipeline_pretrain:
    # at fixture scale it is ANALYSIS-bound (K=16 literal-centroid
    # expressions + 4 fixed kmeans jobs ~= 7.7 s that would not grow
    # with data), so timing it tells you about codegen, not the engine
    # round-8 additions
    "q_udf_cogroup",
    "q_sql_parameterized",
    "q_lake_history_table",
    # round-8 feature-engineering family (Q): tiny-agg + broadcast-back
    # transforms — the fact table is never shuffled in any of the four
    "q_feat_string_index",
    "q_feat_onehot",
    "q_feat_target_encode",
    "q_feat_bucketize",
    "q_feat_target_kfold",
    # round-8 exact-GD trainer (7 aggregate jobs) and keyed snapshot diff
    "q_train_linreg_gd",
    "q_lake_snapshot_diff",
    # round-8 session-2 additions: unigram-LM tokenizer EM, GROUP BY
    # ALL surface, _metadata file-lineage audit
    "q_text_unigram_train",
    "q_sql_group_by_all",
    "q_scan_file_metadata",
    # round-8 session-2: selection-based exact quantiles + ER capstone
    "q_agg_quantile_select",
    "q_pipeline_entity_resolution",
    "q_agg_group_median_select",
    "q_lake_replicate",
    "q_stream_feature_serve",
    "q_pipeline_features",
    "q_feat_robust_scale",
    # round-9: Arrow-native grouped/cogrouped map, stream-stream full
    # outer, MERGE schema evolution
    "q_udf_grouped_arrow",
    "q_udf_cogroup_arrow",
    "q_stream_full_outer_join",
    "q_lake_merge_evolve",
    "q_select_dsir",
    "q_feat_chi2_select",
    "q_privacy_l_diversity",
    "q_stream_semi_join",
    "q_timeseries_holt",
    # round-9 session-2: statistical-inference pack, sub-document
    # dedup, Zipf fit, classical trainers (NB / stump / PAVA)
    "q_stats_ks_test",
    "q_stats_gini",
    "q_survival_km",
    "q_ts_theil_sen",
    "q_dedup_paragraph",
    "q_text_zipf",
    "q_train_naive_bayes",
    "q_train_decision_stump",
    "q_train_isotonic",
    "q_stream_right_outer_join",
    "q_stats_mann_whitney",
    "q_train_grouped_ols",
    "q_timeseries_acf",
    "q_multimodal_audio",
    "q_lake_generated_columns",
    "q_stats_bootstrap_ci",
    "q_stats_chi2",
    "q_mining_variants",
    "q_geo_point_in_polygon",
    "q_train_gbt_stumps",
    "q_stats_runs_test",
    "q_stats_spearman",
    "q_lake_identity",
    "q_stats_kendall",
    "q_stats_anova",
    "q_stats_cramers_v",
    "q_stats_sign_bh",
    "q_ts_changepoint_sse",
    "q_train_ridge",
    "q_class_knn_vote",
    "q_sql_decorrelate",
    "q_privacy_t_closeness",
    "q_lake_check_constraint",
    "q_ts_backtest_mase",
    "q_multimodal_keyframes",
    "q_stats_kruskal",
    "q_stream_cusum",
    "q_graph_connected_components",
    "q_sql_variant",
    "q_feat_gini_gain",
    "q_survival_nelson_aalen",
    "q_ab_sequential",
    "q_train_lasso_cd",
    "q_survival_logrank",
    "q_stats_mcnemar",
    "q_alloc_fifo",
    "q_scan_binary",
    "q_knn_hamming",
    "q_knn_hamming_rerank",
    "q_knn_hamming_postdedup",
    "q_train_tree_depth2",
    "q_stats_cochran_q",
    "q_stats_jonckheere",
    "q_stats_friedman",
    "q_ts_ljung_box",
    "q_text_winnowing",
    "q_stats_brown_forsythe",
    "q_eval_brier",
    "q_knn_sq8",
    "q_sql_execute_immediate",
    "q_ts_granger",
    # q_fn_try_arithmetic stays non-headline like q_dedup_semantic:
    # at fixture scale its runtime is ~5 s of ANALYSIS+CODEGEN for
    # five try_*/decimal expression trees, re-paid per fresh plan
    # (execution itself is 0.06 s warm) — timing it measures the
    # compiler, not the engine; its exception-cost finding lives in
    # BASELINE.md and the oracle checks stay in the driver contract
    "q_stats_dunn",
    "q_stats_tukey",
    "q_sql_udf_lateral",
    "q_sql_exec_into",
    "q_stats_games_howell",
    "q_timeseries_holt_winters",
    "q_train_tree_depth3",
    "q_stats_mann_kendall",
    "q_sql_collation",
    "q_timeseries_decompose",
    "q_text_symspell",
    "q_text_phrase_search",
    "q_stats_jarque_bera",
    "q_stats_cramer_von_mises",
    "q_agg_kmv_distinct",
    "q_graph_clustering_coeff",
    "q_dedup_minhash_affine",
    "q_stats_mood_median",
    "q_stats_ansari_bradley",
    "q_stats_lepage",
    "q_stats_cochran_armitage",
    "q_graph_assortativity",
    "q_stats_cmh",
    "q_stats_page_trend",
    "q_fn_luhn",
    "q_graph_kcore",
    "q_stats_seasonal_mk",
    "q_timeseries_croston",
    "q_stats_prop_ztest",
    "q_graph_reciprocity",
    "q_sql_lateral_alias",
    "q_stats_mh_odds",
    "q_train_perceptron",
    "q_stats_kendall_w",
    "q_stats_cohen_kappa",
    "q_stats_cronbach_alpha",
    "q_stats_brunner_munzel",
    "q_scan_text",
    "q_stats_eta_squared",
    "q_stats_partial_corr",
    "q_stats_point_biserial",
    "q_stats_durbin_watson",
    "q_stats_turning_points",
    "q_stats_mahalanobis",
    "q_ab_power",
    "q_agg_trimmed_mean",
    "q_knn_self_join",
    "q_text_kwic",
]

# Frozen cross-round comparators (r6 verdict item 8). These are the
# exact query sets shared with the driver's round-1 and round-5 bench
# records; their subtotals are emitted every round so any two rounds
# are comparable even as HEADLINE grows. Do NOT edit — append-only
# history depends on them.
SUBSET22 = (
    "q_agg_basic", "q_agg_rollup", "q_dedup_exact", "q_dedup_minhash",
    "q_infer_batch", "q_join_asof", "q_join_broadcast", "q_join_inner",
    "q_json_extract", "q_knn_exact", "q_knn_ivf", "q_scale_bloom_prune",
    "q_sessionize", "q_stream_tumbling", "q_text_quality",
    "q_text_wordcount", "q_topk_per_group", "q_tpch_q1", "q_tpch_q5",
    "q_udf_grouped_agg", "q_window_rank", "q_window_running",
)
SUBSET38 = SUBSET22 + (
    "q_corpus_shuffle", "q_embed_centroids", "q_graph_pagerank",
    "q_lateral_topn", "q_multimodal_frames", "q_sample_weighted",
    "q_text_bm25", "q_text_boilerplate", "q_text_bpe_pairs",
    "q_text_cdc_chunks", "q_text_chunking", "q_text_inverted_index",
    "q_text_packing", "q_tpch_q21", "q_tpch_q9", "q_window_time_range",
)


def warmup(spark, sf_dir: str) -> None:
    """Untimed: JVM JIT, Python worker pool spin-up, parquet footer
    caches — fixed per-session costs that don't scale with data and
    would otherwise be misattributed to whichever query runs first."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from embarrassingly_parallel_image_classification_spark.sources.tables import TABLES, t

    spark.range(1_000_000).select(F.sum("id")).collect()

    @pandas_udf("double")
    def _noop_udf(v: pd.Series) -> pd.Series:
        return v

    spark.range(100_000).select(
        _noop_udf(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()
    for name in TABLES:
        t(spark, sf_dir, name).write.format("noop").mode("overwrite").save()

    # ANN index BUILD is a one-off phase (KMeans fits + corpus encode),
    # not per-query work: build untimed so q_knn_{ivf,pq,ivfpq} time
    # SEARCH (ensure_ivfpq_index composes the two cached builds).
    from embarrassingly_parallel_image_classification_spark.ml.knn import (
        ensure_ivf_index,
        ensure_ivfpq_index,
        ensure_ivfpq_residual_index,
        ensure_pq_index,
    )

    ensure_ivf_index(spark, sf_dir)
    ensure_pq_index(spark, sf_dir)
    ensure_ivfpq_index(spark, sf_dir)
    ensure_ivfpq_residual_index(spark, sf_dir)


def contention_canary(sf_dir: str) -> dict:
    """Fixed-work probe making bench totals attributable on a shared box
    (round-4 verdict item 3: r4 ran ~29% above r2 uniformly; without a
    canary, contention and real regressions are indistinguishable).

    Two signals, recorded alongside the Spark timings:
      * loadavg at start (what else the box is doing);
      * wall time of a FIXED single-threaded DuckDB aggregate over
        lineitem — constant work, so its runtime moves with contention
        only, never with changes to this repo's Spark code. Compare the
        canary across rounds: if canary_r5/canary_r4 ≈ spark_r5/spark_r4,
        the delta is the box, not the code.
    """
    import duckdb

    la1, la5, la15 = os.getloadavg()
    con = duckdb.connect()
    con.execute("SET threads=1")
    t0 = time.time()
    con.execute(
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity), "
        "SUM(l_extendedprice * (1 - l_discount)), COUNT(*) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    duck_sec = round(time.time() - t0, 3)
    con.close()
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "loadavg_15m": round(la15, 2),
        "duckdb_fixed_agg_sec": duck_sec,
    }


def wait_uncontended(
    max_wait_s: float = 180.0, loadavg_gate: float = 4.0
) -> float:
    """Gate the timed run on box quiet (r7 verdict item 3: the r7
    driver bench started at loadavg 5.91 and every sub-second query
    inherited uniform 1.1-1.3x noise, polluting cross-round per-query
    comparisons). Bounded wait — a persistently busy box still
    produces a record, and the canary then documents the contention.
    Must run BEFORE the SparkSession exists: once local[32] spins up,
    loadavg measures our own work, not the neighbors'."""
    t0 = time.time()
    while (
        os.getloadavg()[0] >= loadavg_gate
        # a freshly-finished heavy job leaves loadavg_1m low while the
        # 5m average (and the page cache) is still churning — the r10
        # close-of-session runs measured a uniform ~1.17x drift from
        # exactly this state, so wait that out too (gentler threshold)
        or os.getloadavg()[1] >= loadavg_gate * 1.5
    ):
        if time.time() - t0 >= max_wait_s:
            break
        time.sleep(10.0)
    return round(time.time() - t0, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    gate_wait = wait_uncontended()
    canary_start = contention_canary(sf_dir)
    spark = get_spark("epic-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark, sf_dir)

    qs = registry.queries()
    # Three full passes, min per query: the box shares CPU with other
    # tenants and contention spikes last tens of seconds — back-to-back
    # repeats of one query land in the same spike, interleaved passes
    # don't.
    timings: dict[str, float] = {}
    for _round in range(3):
        for name in HEADLINE:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            timings[name] = round(min(timings.get(name, float("inf")), dt), 3)

    canary_end = contention_canary(sf_dir)
    # End-canary retry (r9 verdict item 5): the r9 record was flagged
    # by the END canary degrading 1.9-2.7x vs its own start — the old
    # gate only checked quiet at START, so mid-run contention polluted
    # every per-query min. If the end canary exceeds the start canary
    # by >1.5x, wait for quiet ONCE more and run ONE extra interleaved
    # pass (mins only improve); bounded at a single retry so a
    # persistently busy box still terminates and the recorded canaries
    # document the residual contention.
    retry_wait = 0.0
    if (
        canary_end["duckdb_fixed_agg_sec"]
        > 1.5 * canary_start["duckdb_fixed_agg_sec"]
    ):
        retry_wait = wait_uncontended()
        for name in HEADLINE:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            timings[name] = round(min(timings[name], dt), 3)
        canary_end = contention_canary(sf_dir)

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "contention_canary": {
            "start": canary_start,
            "end": canary_end,
            "gate_wait_sec": gate_wait,
            "retry_wait_sec": retry_wait,
        },
    }
    # Full per-query record: first stdout line + a file. The driver's
    # stdout capture keeps only the LAST ~2000 chars (BENCH_r06.json
    # lost its record when the 96-query line outgrew that), so the
    # per-query dict goes first / to disk and the line the driver
    # parses is the SHORT summary printed LAST.
    full_line = json.dumps(full)
    print(full_line)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_full.json"), "w"
        ) as f:
            f.write(full_line + "\n")
    except OSError:
        pass  # read-only checkout: stdout line above still has it all
    summary = {
        "metric": "total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        # Frozen cross-round comparators (same query sets as the
        # driver's r1 / r5 bench records — see SUBSET22/SUBSET38).
        # Every member MUST be present: silently summing fewer would
        # fake a speedup against the append-only cross-round history
        # (review finding r7).
        "subset22_sec": round(sum(timings[q] for q in SUBSET22), 3),
        "subset38_sec": round(sum(timings[q] for q in SUBSET38), 3),
        "slowest5": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:5]
        ),
        "canary_duckdb_sec": [
            canary_start["duckdb_fixed_agg_sec"],
            canary_end["duckdb_fixed_agg_sec"],
        ],
        "canary_loadavg_1m": [
            canary_start["loadavg_1m"],
            canary_end["loadavg_1m"],
        ],
        "gate_wait_sec": gate_wait,
        "queries_file": "BENCH_full.json",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
