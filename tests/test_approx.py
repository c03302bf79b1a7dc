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


# ---------------------------------------------------------------------------
# ANN (IVF) evidence — round-4 verdict item 5: IVF/LSH kNN are rows-only
# forever (seeded engine-specific buckets), so these self-oracles carry
# all the correctness weight.


def _ivf_recall(spark, nprobe: int) -> float:
    """recall@k of IVF search vs the exact kNN at the given nprobe."""
    from embarrassingly_parallel_image_classification_spark.ml import knn

    emb = t(spark, SF_T2, "embeddings")
    idx = knn.ensure_ivf_index(spark, SF_T2)
    queries = emb.filter(F.col("vec_id") < knn.N_QUERIES)
    got = {}
    for r in idx.query(queries, k=knn.TOP_K, nprobe=nprobe).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    want = {}
    for r in knn.q_knn_exact(spark, SF_T2).collect():
        want.setdefault(r["qid"], set()).add(r["vec_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(v) for v in want.values())
    return hits / total


def test_ivf_recall_curve_monotone_in_nprobe(spark):
    """recall@k must be non-decreasing in nprobe (probing more cells can
    only add candidates), must clear 0.5 by nprobe=4 (the default), and
    must be EXACTLY 1.0 at nprobe=n_clusters — probing every cell is
    exhaustive search, so anything below 1.0 there means the index is
    dropping corpus vectors."""
    from embarrassingly_parallel_image_classification_spark.ml import knn

    curve = {np_: _ivf_recall(spark, np_) for np_ in (1, 2, 4, 8, 16)}
    vals = [curve[np_] for np_ in (1, 2, 4, 8, 16)]
    assert vals == sorted(vals), f"recall curve not monotone: {curve}"
    assert curve[4] >= 0.5, f"recall@nprobe=4 {curve[4]:.2f} below 0.5"
    assert curve[16] == 1.0, (
        f"nprobe == n_clusters must be exhaustive, got {curve[16]:.3f}"
    )


def _skewed_corpus(spark):
    """Three well-separated Gaussian blobs of very unequal size
    (500/50/10) — the regime where a bad quantizer collapses every
    vector into the dominant cluster's cell."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 8
    centers = np.array(
        [[10.0] * dim, [-10.0] * dim, [10.0, -10.0] * (dim // 2)]
    )
    rows = []
    vid = 0
    for ci, size in enumerate((500, 50, 10)):
        pts = centers[ci] + rng.normal(0, 0.5, size=(size, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_ivf_quantizer_survives_skewed_clusters(spark):
    """Quantizer-collapse regression: on a heavily skewed corpus the
    KMeans quantizer must still produce multiple populated cells with no
    single cell holding (nearly) everything, and minority-cluster
    queries must recover their true neighbors."""
    import numpy as np

    from embarrassingly_parallel_image_classification_spark.ml.knn import IvfIndex

    corpus = _skewed_corpus(spark)
    idx = IvfIndex(corpus, n_clusters=6, seed=42)
    cells = idx.assigned.groupBy("cell").count().collect()
    n_total = sum(r["count"] for r in cells)
    assert len(cells) >= 3, f"quantizer collapsed to {len(cells)} cells"
    assert max(r["count"] for r in cells) / n_total < 0.95, (
        f"one cell holds {max(r['count'] for r in cells)}/{n_total} vectors"
    )
    # Minority-blob queries (the 10-vector cluster, vec_ids 550..559):
    # their true top-3 neighbors are the other blob members; nprobe=2
    # must find them (the blob is tight, so it lives in one cell).
    pdf = corpus.toPandas().sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    minority = [i for i in range(550, 560)]
    queries = corpus.filter(F.col("vec_id") >= 550)
    got = {}
    for r in idx.query(queries, k=3, nprobe=2).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    hits = total = 0
    for qid in minority:
        qi = int(np.where(ids == qid)[0][0])
        sims = Xn @ Xn[qi]
        order = sorted((round(-s, 6), int(i)) for i, s in zip(ids, sims) if i != qid)
        want = {i for _, i in order[:3]}
        hits += len(want & got.get(qid, set()))
        total += 3
    assert hits / total >= 0.8, f"minority-cluster recall {hits}/{total}"


def test_pq_rerank_recall_and_compression(spark):
    """PQ retrieve-then-rerank: with a 50-deep shortlist from 4-byte
    codes, the exact re-rank must recover ≥80% of the true top-k; the
    encoded corpus must really be M small ints per vector (the 128×
    memory story), and every code must be a valid codebook index."""
    from embarrassingly_parallel_image_classification_spark.ml import knn
    from embarrassingly_parallel_image_classification_spark.ml.knn import PqIndex

    emb = t(spark, SF_T2, "embeddings")
    idx = PqIndex(emb, m=8, ks=16, seed=42)
    row = idx.encoded.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])
    got = {}
    for r in knn.q_knn_pq(spark, SF_T2).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    want = {}
    for r in knn.q_knn_exact(spark, SF_T2).collect():
        want.setdefault(r["qid"], set()).add(r["vec_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(v) for v in want.values())
    assert hits / total >= 0.8, f"pq recall {hits}/{total}"


def test_ivfpq_recall_vs_ivf_at_equal_budget_and_cell_pruning(spark):
    """IVFPQ (round-6): at the SAME candidate budget — nprobe=4 probes
    identical cells for both — the ADC-shortlist + exact re-rank must
    recover at least what IVF-alone's exact scoring of those cells
    recovers minus nothing: recall(IVFPQ) >= recall(IVF) is not
    guaranteed in general (ADC can rank a true neighbor below the
    shortlist cutoff), but with shortlist=50 >> k=3 the shortlist must
    not lose candidates, so equality is the expected outcome and >=
    IVF@nprobe=1 is the hard floor. Also asserts the structural claims:
    candidates are genuinely CELL-PRUNED (strictly fewer coded rows
    than the corpus enter ADC scoring) and recall clears 0.8 absolute."""
    from embarrassingly_parallel_image_classification_spark.ml import knn

    emb = t(spark, SF_T2, "embeddings")
    queries = emb.filter(F.col("vec_id") < knn.N_QUERIES)
    idx = knn.ensure_ivfpq_index(spark, SF_T2)

    n_corpus = emb.count()
    n_cand = idx.candidates(queries, nprobe=4).count()
    # 5 queries × 4/16 cells ≈ 1.25× corpus if unpruned; pruned must be
    # well under the 5× an unpruned per-query cross join would emit
    assert n_cand < n_corpus * 2, (
        f"cell pruning ineffective: {n_cand} candidates vs {n_corpus} corpus"
    )

    def recall(result_rows):
        got = {}
        for r in result_rows:
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        want = {}
        for r in knn.q_knn_exact(spark, SF_T2).collect():
            want.setdefault(r["qid"], set()).add(r["vec_id"])
        hits = sum(len(want[q] & got.get(q, set())) for q in want)
        return hits / sum(len(v) for v in want.values())

    # EQUAL candidate budget (nprobe=4 probes the same cells): with a
    # lossless shortlist (200 >> k) the ADC retrieve + exact re-rank
    # must recover EVERYTHING IVF's exact scoring of those cells finds
    # (measured: equal at every nprobe in {1..16} on this fixture)
    r_ivf_np4 = _ivf_recall(spark, 4)
    r_lossless = recall(
        knn.knn_ivfpq(emb, queries, nprobe=4, shortlist=200, index=idx).collect()
    )
    assert r_lossless >= r_ivf_np4, (
        f"ivfpq@nprobe=4,shortlist=200 {r_lossless:.2f} lost candidates vs "
        f"ivf@nprobe=4 {r_ivf_np4:.2f}"
    )
    # default registered query (nprobe=4, shortlist=50): ADC cutoff may
    # shave the tail but must beat IVF's single-cell probe and stay
    # within 0.1 of the exact-scored same-cells ceiling
    r_default = recall(knn.q_knn_ivfpq(spark, SF_T2).collect())
    r_ivf_np1 = _ivf_recall(spark, 1)
    assert r_default >= r_ivf_np1, (
        f"ivfpq default {r_default:.2f} below ivf@nprobe=1 {r_ivf_np1:.2f}"
    )
    assert r_default >= r_ivf_np4 - 0.1, (
        f"ivfpq default {r_default:.2f} too far under its ceiling {r_ivf_np4:.2f}"
    )


def test_ivfpq_residual_recall_and_single_join_prune(spark):
    """Residual IVFADC (round-6 session 3): the reason production
    IVFPQ encodes residuals, measured. At the same candidate budget
    (nprobe=4, shortlist=50, SAME coarse quantizer):

    - residual recall must reach the IVF PROBE CEILING (what exact
      scoring of the probed cells recovers — every loss at nprobe=4
      on this fixture is an unprobed-cell miss, verified by cell
      assignment during development): measured 0.667 = ivf@4's 0.667,
      while RAW-code IVFPQ drops to 0.600 (its coarser quantization
      ranked a true neighbor below the shortlist cut);
    - so residual >= raw is the hard comparative claim;
    - and the probe-bound loss is recoverable by probing more:
      nprobe=8 clears 0.8 absolute.

    Structural claim: the prune+score path is ONE broadcast join (the
    per-(qid, cell) table join IS the cell pruning)."""
    from embarrassingly_parallel_image_classification_spark.ml import knn

    emb = t(spark, SF_T2, "embeddings")
    queries = emb.filter(F.col("vec_id") < knn.N_QUERIES)
    idx = knn.ensure_ivfpq_residual_index(spark, SF_T2)

    def recall(result_rows):
        got, want = {}, {}
        for r in result_rows:
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        for r in knn.q_knn_exact(spark, SF_T2).collect():
            want.setdefault(r["qid"], set()).add(r["vec_id"])
        hits = sum(len(want[q] & got.get(q, set())) for q in want)
        return hits / sum(len(v) for v in want.values())

    r_resid = recall(knn.q_knn_ivfpq_residual(spark, SF_T2).collect())
    r_raw = recall(knn.q_knn_ivfpq(spark, SF_T2).collect())
    r_ivf4 = recall(knn.ensure_ivf_index(spark, SF_T2).query(queries, nprobe=4).collect())
    assert r_resid >= r_raw, (
        f"residual recall {r_resid:.2f} under raw-code IVFPQ {r_raw:.2f}"
    )
    assert r_resid >= r_ivf4 - 1e-9, (
        f"residual {r_resid:.2f} below the probe ceiling {r_ivf4:.2f} — "
        f"ADC lost a neighbor the probed cells contain"
    )
    r_resid8 = recall(
        knn.knn_ivfpq_residual(emb, queries, nprobe=8, index=idx).collect()
    )
    assert r_resid8 >= 0.8, f"residual@nprobe=8 {r_resid8:.2f} below 0.8"

    # pruning: coded candidates reaching ADC are fewer than corpus ×
    # queries (the unpruned cross size); on a 16-cell/nprobe=4 index
    # that's ~4/16 of corpus per query
    n_corpus = emb.count()
    tdf = idx._residual_tables(queries, nprobe=4)
    n_cand = idx.coded.join(F.broadcast(tdf), "cell").count()
    n_queries = queries.count()
    assert n_cand < n_corpus * n_queries / 2, (
        f"cell pruning ineffective: {n_cand} vs {n_corpus * n_queries} cross"
    )


def test_approx_percentile_merge_contract(spark):
    """MERGEABILITY pin for the GK quantile sketch (r10 verdict item 9)
    — with the property stated HONESTLY, because the naive version is
    false and this test measured it: Spark's QuantileSummaries merge is
    partition-SENSITIVE (1 partition vs 8 differ in the ~5th
    significant digit on sf0.01 — the GK compress step depends on
    insertion grouping), so bit-identity across layouts is NOT the
    contract and asserting it fails. What GK actually guarantees, and
    what this pins, is (a) determinism given a fixed partitioning
    (same layout twice => bit-identical) and (b) the rank-error bound
    survives the merge at the MERGED bound: merging GK summaries can
    double the rank error (the classic 2-eps merge result — and this
    test measured exactly that: the sf0.01 'N' median lands 2.01 ranks
    off where 1-eps allows 1.99), so every returned value's true rank
    must be within 2*eps*n of its target rank for EVERY layout. (b) is
    the property that makes the sketch safe at 1000 executors; (a) is
    what makes a driver rows-only record stable."""
    li = t(spark, SF_T2, "lineitem").select("l_returnflag", "l_extendedprice")
    qs = [0.25, 0.5, 0.95]
    acc = 10000

    def run(df):
        rows = (
            df.groupBy("l_returnflag")
            .agg(
                F.percentile_approx(
                    "l_extendedprice", F.array(*[F.lit(q) for q in qs]), acc
                ).alias("q")
            )
            .collect()
        )
        return {r["l_returnflag"]: list(r["q"]) for r in rows}

    one = run(li.coalesce(1))
    eight = run(li.repartition(8, "l_extendedprice"))
    eight_again = run(li.repartition(8, "l_extendedprice"))
    assert eight == eight_again  # (a) deterministic per layout
    import bisect

    vals = {
        flag: sorted(v["l_extendedprice"] for v in grp)
        for flag, grp in __import__("itertools").groupby(
            sorted(li.collect(), key=lambda r: r["l_returnflag"]),
            key=lambda r: r["l_returnflag"],
        )
    }
    for est in (one, eight):
        for flag, quants in est.items():
            xs = vals[flag]
            n = len(xs)
            for target, v in zip(qs, quants):
                lo = bisect.bisect_left(xs, v)
                hi = bisect.bisect_right(xs, v)
                # (b) rank window [lo, hi] must intersect the 2-eps band
                assert lo - 2 * n / acc <= target * n <= hi + 2 * n / acc, (
                    flag, target, v, lo, hi, n,
                )


def test_hamming_postdedup_uplift_invariants(spark):
    """The dedup-before-retrieval composite's claims, independent of
    the oracle spelling: dedup never hurts (recall_uplift >= 0 row by
    row), the post-dedup shortlist always carries the full overfetch
    budget of distinct candidates, and pre-dedup the exact clones
    crowd out roughly half the slots."""
    from embarrassingly_parallel_image_classification_spark.ml import knn

    got = knn.q_knn_hamming_postdedup(spark, SF_T2).toPandas()
    assert (got.recall_uplift >= 0).all()
    assert (got.hits_postdedup >= got.hits_prededup).all()
    budget = knn.TOP_K * knn.HAMMING_OVERFETCH
    assert (got.shortlist_distinct_postdedup == budget).all()
    # every pre-dedup candidate appears with its identical-signature
    # clone, so 12 slots buy at most ceil(12/2) + boundary-tie slack
    assert (got.shortlist_distinct_prededup < budget).all()
    assert (got.shortlist_distinct_prededup >= budget // 2).all()


def test_approx_count_distinct_merge_contract(spark):
    """The HLL sibling of the GK merge pin: approx_count_distinct must
    be (a) deterministic given a fixed partitioning and (b) within its
    rsd error bound of the exact count under EVERY layout — HLL
    register merges are max-operations (commutative, associative,
    idempotent), so unlike GK the estimate is layout-INVARIANT in
    theory; this test records whether Spark's implementation actually
    delivers that bit-identity too."""
    li = t(spark, SF_T2, "lineitem").select("l_orderkey")

    def run(df):
        return df.agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("e")
        ).collect()[0]["e"]

    one = run(li.coalesce(1))
    eight = run(li.repartition(8, "l_orderkey"))
    eight_again = run(li.repartition(8, "l_orderkey"))
    assert eight == eight_again  # (a) deterministic per layout
    # HLL's register-max merge is layout-invariant — pin the stronger
    # property since it holds (if this ever breaks, weaken to the rsd
    # band like the GK pin and record the measurement)
    assert one == eight
    exact = li.distinct().count()
    for est in (one, eight):
        assert abs(est - exact) / exact < 3 * 0.02


def test_kmv_sketch_exact_and_layout_invariant(spark):
    """The KMV sketch is a pure function of the data: (1) pure-Python
    md5 replay reproduces h_k and the estimate bit-for-bit; (2) the
    same pipeline under a hostile repartitioning returns the identical
    row (the GK-vs-HLL merge-contract finding's third data point —
    KMV sits on the layout-INVARIANT side)."""
    import hashlib

    from pyspark.sql import functions as F

    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.operators.aggregates import (
        KMV_K,
    )
    from embarrassingly_parallel_image_classification_spark.sources.tables import t
    from tests.conftest import SF_SMOKE

    got = registry.queries()["q_agg_kmv_distinct"](spark, SF_SMOKE).collect()
    assert len(got) == 1
    row = got[0]
    import duckdb

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT o_custkey FROM"
            f" read_parquet('{SF_SMOKE}/orders.parquet')"
        ).fetchall()
    ]
    hs = sorted(
        {int(hashlib.md5(str(int(k)).encode()).hexdigest()[:10], 16) for k in keys}
    )
    nk = min(len(hs), KMV_K)
    hk = hs[nk - 1]
    est = nk if nk < KMV_K else (KMV_K - 1) * (1 << 40) // hk
    assert int(row.n_in_sketch) == nk
    assert int(row.h_k) == hk
    assert int(row.est_distinct) == est
    assert int(row.n_true) == len(keys)
    assert int(row.abs_err_e4) == abs(est - len(keys)) * 10000 // len(keys)
    if nk < KMV_K:
        # small-set branch: the sketch IS the exact count
        assert est == len(keys)
    else:
        # estimator sanity: within 25% at k=256 (3/sqrt(k) ~ 19%)
        assert abs(est - len(keys)) <= 0.25 * len(keys)
    # layout invariance: hostile repartitioning, same sketch
    h = (
        t(spark, SF_SMOKE, "orders")
        .repartition(7)
        .select(
            F.expr(
                "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 10),"
                " 16, 10) AS BIGINT)"
            ).alias("hv")
        )
        .distinct()
        .repartition(3)
    )
    kth = (
        h.orderBy("hv").limit(KMV_K)
        .agg(F.max("hv").alias("hk"), F.count("*").alias("nk"))
        .collect()[0]
    )
    assert kth.nk == nk and int(kth.hk) == hk
