"""Self-oracles for rows-only operators (SURVEY.md §5.3): where DuckDB
can't express the op, verify against a local NumPy/pandas ground truth
or an algebraic property (idempotence, recall, stream-batch equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.ml import dedup, knn
from embarrassingly_parallel_image_classification_spark.sources.tables import t
from tests.conftest import SF_T2


def _local_embeddings(sf_dir: str) -> pd.DataFrame:
    return (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def _true_topk(pdf: pd.DataFrame, qids, k=3):
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for qid in qids:
        qi = np.where(ids == qid)[0][0]
        sims = Xn @ Xn[qi]
        order = sorted(
            [(round(-s, 6), i) for i, s in zip(ids, sims) if i != qid]
        )
        out[qid] = [i for _, i in order[:k]]
    return out


def test_knn_exact_matches_numpy(spark):
    pdf = _local_embeddings(SF_T2)
    want = _true_topk(pdf, range(knn.N_QUERIES), knn.TOP_K)
    got_rows = (
        knn.q_knn_exact(spark, SF_T2).orderBy("qid", "rank").collect()
    )
    got = {}
    for r in got_rows:
        got.setdefault(r["qid"], []).append(r["vec_id"])
    assert got == want


def test_knn_pandas_tournament_equals_jvm_exact(spark):
    """The mapInPandas tournament formulation must return exactly the
    same (qid, vec_id, sim, rank) rows as the in-SQL exact kNN."""
    a = sorted(
        (r["qid"], r["vec_id"], r["sim"], r["rank"])
        for r in knn.q_knn_exact(spark, SF_T2).collect()
    )
    b = sorted(
        (r["qid"], r["vec_id"], r["sim"], r["rank"])
        for r in knn.q_knn_exact_pandas(spark, SF_T2).collect()
    )
    assert a == b


def test_knn_lsh_recall(spark):
    """LSH with inf threshold must recover the exact top-k (it prunes
    candidates only via bucketing; with these params recall is 1.0 on
    the fixture — a regression here means the bucketing broke)."""
    pdf = _local_embeddings(SF_T2)
    want = _true_topk(pdf, range(knn.N_QUERIES), knn.TOP_K)
    rows = knn.q_knn_lsh(spark, SF_T2).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["vec_id"])
    # L2-ranked vs cosine-ranked can legitimately differ in order;
    # compare as sets with recall ≥ 2/3 per query.
    for qid, ids in want.items():
        inter = set(ids) & set(got.get(qid, []))
        assert len(inter) >= 2, f"qid={qid}: lsh recall too low: {got.get(qid)} vs {ids}"


def test_knn_ivf_recall(spark):
    pdf = _local_embeddings(SF_T2)
    want = _true_topk(pdf, range(knn.N_QUERIES), knn.TOP_K)
    rows = knn.q_knn_ivf(spark, SF_T2).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["vec_id"])
    hits = sum(len(set(ids) & set(got.get(qid, []))) for qid, ids in want.items())
    total = sum(len(v) for v in want.values())
    assert hits / total >= 0.5, f"ivf recall {hits}/{total} below 0.5"


def test_dedup_exact_idempotent(spark):
    """dedup(dedup(x)) == dedup(x): survivors contain no duplicate texts."""
    d = t(spark, SF_T2, "documents")
    survivors = dedup.q_dedup_exact(spark, SF_T2).select("keep_id")
    surviving_docs = d.join(survivors, d.doc_id == survivors.keep_id)
    n = surviving_docs.count()
    n_distinct = surviving_docs.select("text").distinct().count()
    assert n == n_distinct


def test_minhash_candidates_are_really_similar(spark):
    """Every MinHash candidate pair at est ≥ 0.5 must have TRUE trigram
    Jaccard ≥ 0.3 (banded LSH + 16-perm estimate is noisy but must not
    hallucinate dissimilar pairs), and recall vs true pairs ≥ 0.8."""
    d = t(spark, SF_T2, "documents")
    est = dedup.minhash_pairs(d).filter(F.col("est_jaccard") >= 0.5)
    true = dedup.jaccard_pairs(d)
    joined = est.join(true, ["id_a", "id_b"], "left").collect()
    assert joined, "no candidate pairs found at all"
    for r in joined:
        assert r["jaccard"] is not None and r["jaccard"] >= 0.3, (
            f"false positive pair {r['id_a']},{r['id_b']} est={r['est_jaccard']} "
            f"true={r['jaccard']}"
        )
    true_pairs = {(r["id_a"], r["id_b"]) for r in true.filter(F.col("jaccard") >= 0.7).collect()}
    est_pairs = {(r["id_a"], r["id_b"]) for r in joined}
    if true_pairs:
        recall = len(true_pairs & est_pairs) / len(true_pairs)
        assert recall >= 0.8, f"minhash recall {recall} on strong pairs"


def test_simhash_identical_docs_collide(spark):
    """Exact-duplicate texts must produce identical simhash fingerprints
    (property check via a constructed duplicate)."""
    d = t(spark, SF_T2, "documents").limit(50)
    doubled = d.unionByName(d)  # every text now has an exact twin
    fp = dedup.simhash(doubled)
    joined = (
        doubled.select("doc_id", "text")
        .join(fp, "doc_id")
        .groupBy("text")
        .agg(F.countDistinct("simhash").alias("n_fp"))
        .collect()
    )
    assert all(r["n_fp"] == 1 for r in joined)


def test_multimodal_features_match_local(spark):
    from embarrassingly_parallel_image_classification_spark.ml.multimodal import (
        q_multimodal_features,
    )

    got = (
        q_multimodal_features(spark, SF_T2)
        .orderBy("media_id")
        .toPandas()
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF_T2}/documents.parquet").to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    payload = docs["text"].str.encode("utf-8")
    want_nbytes = payload.str.len()
    assert (got["n_bytes"].to_numpy() == want_nbytes.to_numpy()).all()
    for i in (0, 1, len(got) - 1):
        px = np.frombuffer(payload.iloc[i], dtype=np.uint8)
        assert abs(got["mean_byte"].iloc[i] - px.mean()) < 1e-9
        assert got["feat_hash"].iloc[i] == int(px[:64].sum())


def test_ngram_queries_survive_short_documents(spark, duck, tmp_path):
    """Regression (ADVICE r2/r3): sequence(0, size-n) DESCENDS when a doc
    has fewer than n tokens and element_at(toks, 0) threw at runtime,
    while the DuckDB oracle returned empty grams. Run the positional-
    n-gram queries over a fixture containing 0/1/2/4-token docs and
    require exact oracle agreement (not just no-crash)."""
    import pandas as pd

    from embarrassingly_parallel_image_classification_spark import registry
    from conftest import assert_matches_oracle

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 43, 86],
            "text": [
                "",
                "one",
                "two tokens",
                "just four tokens here",
                "bench doc with exactly seven little words",
                "another bench document sharing no grams at all",
            ],
            "lang": ["en"] * 6,
            "source": ["unit"] * 6,
            "n_chars": pd.array([0, 3, 10, 21, 41, 46], dtype="int64"),
        }
    )
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    # register_views wants all 10 tables; link the untouched ones in.
    import os

    from conftest import SF_SMOKE
    from embarrassingly_parallel_image_classification_spark.sources.tables import (
        TABLES,
    )

    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_SMOKE}/{name}.parquet", f"{sf_dir}/{name}.parquet")

    specs = registry.specs()
    qs = registry.queries()
    for name in ("q_text_repetition", "q_text_decontaminate", "q_text_ngrams"):
        assert_matches_oracle(
            spark, duck, name, qs[name], specs[name].oracle, sf_dir
        )


def test_prefix_filter_is_lossless(spark):
    """jaccard_pairs_at (prefix-filtered AllPairs join, the scale path)
    must return EXACTLY the naive shingle-self-join pairs at the same
    threshold — the prefix filter is a lossless pruning theorem, not an
    approximation, and this pins it empirically."""
    from conftest import SF_SMOKE
    from embarrassingly_parallel_image_classification_spark.ml import dedup
    from embarrassingly_parallel_image_classification_spark.sources.tables import t

    d = t(spark, SF_SMOKE, "documents")
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_pairs_at(d, 0.5).collect()
    }
    naive = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_pairs(d)
        .filter(F.col("jaccard_raw") >= 0.5)
        .collect()
    }
    assert fast == naive
    assert len(fast) > 0  # vacuous equality would prove nothing


def test_star_cc_equals_minlabel_on_fixture(spark):
    """Both CC algorithms must produce identical (node, cluster_id)
    labelings on the fixture near-dup edge set."""
    from conftest import SF_SMOKE
    from embarrassingly_parallel_image_classification_spark.ml import dedup
    from embarrassingly_parallel_image_classification_spark.sources.tables import t

    d = t(spark, SF_SMOKE, "documents")
    edges = dedup.jaccard_pairs_at(d, 0.5).select("id_a", "id_b")
    a = {(r.node, r.cluster_id) for r in dedup.connected_components(edges).collect()}
    b = {
        (r.node, r.cluster_id)
        for r in dedup.connected_components_star(edges).collect()
    }
    assert a == b and len(a) > 0


def test_star_cc_solves_deep_chain(spark):
    """A 400-node path graph: min-label propagation needs ~400 rounds
    (diameter-bound — its default 20-round budget CANNOT finish), while
    large-star/small-star contracts it in O(log² n) rounds. This is the
    scale scenario the star variant exists for."""
    from embarrassingly_parallel_image_classification_spark.ml import dedup

    n = 400
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )
    labs = dedup.connected_components_star(chain, max_iter=15).collect()
    assert len(labs) == n
    assert {r.cluster_id for r in labs} == {0}


def test_real_ppm_decode_through_feature_extraction(spark):
    """decode_image must parse GENUINE binary PPM/PGM bytes (built here
    pixel-by-pixel, no imaging libs) and the mapInPandas feature path
    must report the true pixel statistics; malformed or text payloads
    must fall back to stub semantics so fixture oracles are untouched."""
    import numpy as np

    from embarrassingly_parallel_image_classification_spark.ml import multimodal

    rng = np.random.RandomState(3)
    w, h = 17, 11
    rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    ppm = b"P6\n# comment\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    gray = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    pgm = b"P5\n%d %d\n255\n" % (w, h) + gray.tobytes()
    text = b"P6 is a binary image format"  # looks magic, fails length check

    # direct decode: shapes and values
    assert multimodal.decode_image(ppm).shape == (h, w, 3)
    assert np.array_equal(multimodal.decode_image(ppm), rgb)
    assert multimodal.decode_image(pgm).shape == (h, w)
    assert np.array_equal(multimodal.decode_image(pgm), gray)
    assert np.array_equal(
        multimodal.decode_image(text), np.frombuffer(text, dtype=np.uint8)
    )

    # end-to-end through the Spark mapInPandas feature extractor
    rows = [
        (1, bytearray(ppm), {"width": w, "height": h, "format": "ppm"}),
        (2, bytearray(pgm), {"width": w, "height": h, "format": "pgm"}),
        (3, bytearray(text), {"width": 0, "height": 0, "format": "txt"}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<width:int,height:int,format:string>",
    )
    got = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert got[1].n_bytes == w * h * 3
    assert got[1].mean_byte == float(rgb.mean())
    assert got[1].feat_hash == int(rgb.ravel()[:64].sum())
    assert got[2].n_bytes == w * h
    assert got[2].mean_byte == float(gray.mean())
    assert got[3].n_bytes == len(text)  # stub fallback: raw bytes


def test_cdc_chunking_is_edit_robust(spark, duck, tmp_path):
    """The motivating CDC property: inserting one token into a document
    changes only the chunk digests at the edit point — every chunk
    before AND after (re-aligned by content) keeps its md5, unlike
    fixed-stride chunking where an insertion shifts all later chunks.
    Also pins the Spark/DuckDB oracle agreement on this tiny corpus."""
    import os

    import pandas as pd

    from conftest import SF_SMOKE, assert_matches_oracle
    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.sources.tables import (
        TABLES,
    )

    words = [f"w{i}" for i in range(200)]
    orig = " ".join(words)
    edited = " ".join(words[:100] + ["INSERTED"] + words[100:])
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [orig, edited],
            "lang": ["en", "en"],
            "source": ["unit", "unit"],
            "n_chars": pd.array([len(orig), len(edited)], dtype="int64"),
        }
    )
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_SMOKE}/{name}.parquet", f"{sf_dir}/{name}.parquet")

    specs = registry.specs()
    qs = registry.queries()
    assert_matches_oracle(
        spark, duck, "q_text_cdc_chunks", qs["q_text_cdc_chunks"],
        specs["q_text_cdc_chunks"].oracle, sf_dir,
    )
    rows = qs["q_text_cdc_chunks"](spark, sf_dir).collect()
    digests = {0: set(), 1: set()}
    for r in rows:
        digests[r.doc_id].add(r.chunk_md5)
    # all but ~2 chunks survive the edit with identical digests
    shared = digests[0] & digests[1]
    assert len(digests[0]) - len(shared) <= 2
    assert len(digests[1]) - len(shared) <= 2
    assert len(shared) >= len(digests[0]) - 2 > 0


def test_pca_matches_numpy_eigendecomposition(spark):
    """MLlib PCA must agree with a local NumPy eigendecomposition of
    the same covariance (up to the pinned sign convention): loadings
    orthonormal, explained variance non-increasing, and the projected
    coordinates equal X_centered @ PC within float tolerance."""
    from embarrassingly_parallel_image_classification_spark.ml.knn import pca_project

    pdf = _local_embeddings(SF_T2)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    projected, loadings = pca_project(
        t(spark, SF_T2, "embeddings"), k=8
    )
    L = np.array(loadings)  # (k, d)
    # orthonormal loadings
    assert np.allclose(L @ L.T, np.eye(L.shape[0]), atol=1e-6)
    # numpy reference PCA on the same data
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (len(X) - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][: L.shape[0]]
    top = v[:, order]  # (d, k)
    # compare per-component up to sign
    for j in range(L.shape[0]):
        dot = abs(float(top[:, j] @ L[j]))
        assert dot > 0.999, f"component {j} mismatch: |dot|={dot:.4f}"
    # projected coords: spark output (rounded 6) == numpy projection
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in projected.filter(F.col("vec_id") < 20).collect()
    }
    P = Xc @ L.T  # MLlib projects UNCENTERED? verify against centered first
    P_unc = X @ L.T
    for vid, proj in got.items():
        ok_centered = np.allclose(P[vid], proj, atol=1e-4)
        ok_uncentered = np.allclose(P_unc[vid], proj, atol=1e-4)
        assert ok_centered or ok_uncentered, (
            f"vec {vid}: neither centered nor uncentered projection matches"
        )
    # variance along successive components is non-increasing over the
    # FULL corpus (a small sample's variances need not be ordered)
    variances = (Xc @ L.T).var(axis=0)
    assert all(
        variances[i] >= variances[i + 1] - 1e-6 for i in range(len(variances) - 1)
    )


def test_incremental_dedup_equals_self_join_cross_pairs(spark):
    """jaccard_cross_at (the two-corpus incremental screen) must find
    EXACTLY the pairs of the full-corpus lossless self-join that
    straddle the existing/incoming split — no pair lost to the shared
    rare-first prefix order spanning two frames, none invented."""
    d = t(spark, SF_T2, "documents")
    existing = d.filter(F.col("doc_id") % 7 != 0)
    incoming = d.filter(F.col("doc_id") % 7 == 0)
    got = {
        (r["id_exist"], r["id_new"], r["jaccard"])
        for r in dedup.jaccard_cross_at(existing, incoming, 0.5).collect()
    }
    want = set()
    for r in dedup.jaccard_pairs_at(d, 0.5).collect():
        a_in, b_in = r["id_a"] % 7 == 0, r["id_b"] % 7 == 0
        if a_in != b_in:  # pair straddles the split
            exist_id, new_id = (
                (r["id_b"], r["id_a"]) if a_in else (r["id_a"], r["id_b"])
            )
            want.add((exist_id, new_id, r["jaccard"]))
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


def test_bpe_train_matches_reference(spark):
    """q_text_bpe_train's learned merge table must equal, row for row,
    a pure-Python Sennrich-style reference run on the same corpus:
    same greedy left-to-right fusing, same (count desc, left asc,
    right asc) tie-break — any divergence in pair counting, merge
    application, or argmax ordering shifts a merge and fails here."""
    import duckdb

    from embarrassingly_parallel_image_classification_spark import registry

    con = duckdb.connect()
    wf = con.execute(
        f"""
        SELECT w, COUNT(*) c FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w
            FROM read_parquet('{SF_T2}/documents.parquet'))
        WHERE length(w) >= 1 GROUP BY w
        """
    ).fetchall()
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wf}
    want = []
    for step in range(12):
        counts: dict = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + c
                )
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        want.append((step, left, right, n))
        new_vocab: dict = {}
        for sym, c in vocab.items():
            out: list = []
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in registry.queries()["q_text_bpe_train"](spark, SF_T2).collect()
    ]
    assert got == want


def test_bpe_encode_matches_reference(spark):
    """q_text_bpe_encode's per-doc (word count, BPE token count) must
    equal a pure-Python encode with the same 8 reference-trained
    merges — any divergence in merge application order, greedy scan
    direction, or the vocab→corpus join fails here."""
    import duckdb

    from embarrassingly_parallel_image_classification_spark import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id, w FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM read_parquet('{SF_T2}/documents.parquet'))
        WHERE length(w) >= 1
        """
    ).fetchall()
    freq: dict = {}
    for _, w in rows:
        freq[w] = freq.get(w, 0) + 1
    vocab = {w: tuple(list(w) + ["</w>"]) for w in freq}

    def merge(sym, left, right):
        out: list = []
        for s in sym:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return tuple(out)

    for _ in range(8):
        counts: dict = {}
        for w, sym in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + freq[w]
                )
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        vocab = {w: merge(sym, left, right) for w, sym in vocab.items()}
    want: dict = {}
    for doc_id, w in rows:
        nw, nt = want.get(doc_id, (0, 0))
        want[doc_id] = (nw + 1, nt + len(vocab[w]))
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in registry.queries()["q_text_bpe_encode"](spark, SF_T2).collect()
    }
    assert got == want


def test_kmeans_empty_cluster_drops_like_oracle(spark):
    """The fixture never empties a cluster, so pin the path directly:
    cluster 0's centroid sits at [1] (kept alive only by the one
    far-away point, vec 99) and cluster 1's at [100] (capturing all
    the others); remove vec 99 and cluster 0 must DROP OUT of the next
    round (matching the oracle's update CTE, which simply has no rows
    for it) — not resurrect its stale centroid."""
    from embarrassingly_parallel_image_classification_spark.ml import cluster as km

    pts = spark.createDataFrame(
        [(i, [100 + (i % 3)]) for i in range(12)] + [(99, [1])],
        "vec_id bigint, q array<bigint>",
    )
    # init: cid 0 at [1] (vec 99's value), cid 1 at [100]
    cents = [(0, [1]), (1, [100])]
    c1 = km._update(pts, cents)
    # vec 99 keeps cluster 0 alive; the rest vote cluster 1
    assert [cid for cid, _ in c1] == [0, 1]
    # now REMOVE vec 99's point: cluster 0 gets no members and drops
    c2 = km._update(pts.filter("vec_id <> 99"), cents)
    assert [cid for cid, _ in c2] == [1], "empty cluster must drop out"
    # final assignment against the surviving centroid still covers
    # every point (including the far-away one)
    from pyspark.sql import functions as F

    out = (
        pts.select(km._best(c2).alias("b"))
        .groupBy(F.col("b.cid").alias("cid"))
        .count()
        .collect()
    )
    assert len(out) == 1 and out[0]["cid"] == 1 and out[0]["count"] == 13


def test_kmeans_ties_break_to_lowest_cid(spark):
    """A point equidistant from two centroids must take the LOWER cid
    in both the map-side array_min expression and the oracle's
    (dist, cid) ROW_NUMBER ordering — the struct comparison contract."""
    from embarrassingly_parallel_image_classification_spark.ml import cluster as km
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(0, [50])], "vec_id bigint, q array<bigint>"
    )
    cents = [(0, [40]), (1, [60]), (2, [50])]  # 2 is exact; 0/1 tie at 100
    r = pts.select(km._best(cents).alias("b")).collect()[0]["b"]
    assert r["cid"] == 2 and r["dist"] == 0
    r2 = pts.select(km._best([(0, [40]), (1, [60])]).alias("b")).collect()[0]["b"]
    assert r2["cid"] == 0 and r2["dist"] == 100, "tie must break low"


def test_kmeans_longform_assignment_equals_literal(spark):
    """The two Lloyd-assignment spellings — literal-centroid map-side
    expression (_best, analysis-bound in K) and long-form broadcast
    join (assign_longform, the large-K production path) — must produce
    IDENTICAL (vec_id, cid, dist) triples: integer arithmetic leaves
    no rounding slack for the plans to hide behind."""
    from pyspark.sql import functions as F

    from embarrassingly_parallel_image_classification_spark.ml import cluster as km

    points = km._quantized(spark, "/root/testdata/sf0.001")
    init_rows = points.orderBy("vec_id").limit(km._K).collect()
    cents = [(cid, list(r["q"])) for cid, r in enumerate(init_rows)]
    lit = {
        (r["vec_id"], r["b"]["cid"], r["b"]["dist"])
        for r in points.select("vec_id", km._best(cents).alias("b")).collect()
    }
    cents_df = spark.createDataFrame(
        [(cid, pos, cv) for cid, vec in cents for pos, cv in enumerate(vec)],
        "cid bigint, pos int, x_ignore bigint",
    ).selectExpr("cid", "pos", "x_ignore as cv")
    long = points.select(
        "vec_id", F.posexplode("q").alias("pos", "x")
    )
    lf = {
        (r["vec_id"], r["cid"], r["dist"])
        for r in km.assign_longform(long, cents_df).collect()
    }
    assert lit == lf


def test_kmeans_soft_assignment_contract(spark):
    """assign_longform_soft (the SemDeDup Voronoi-boundary mitigation):
    rank 1 must EQUAL the hard assignment (same integer distances, same
    lowest-cid tie-break), every vector must get exactly p rows with
    non-decreasing distance, and the p cells must be distinct."""
    from pyspark.sql import functions as F

    from embarrassingly_parallel_image_classification_spark.ml import cluster as km

    points = km._quantized(spark, "/root/testdata/sf0.001")
    init_rows = points.orderBy("vec_id").limit(km._K).collect()
    cents = [(cid, list(r["q"])) for cid, r in enumerate(init_rows)]
    cents_df = spark.createDataFrame(
        [(cid, pos, cv) for cid, vec in cents for pos, cv in enumerate(vec)],
        "cid bigint, pos int, cv bigint",
    )
    long = points.select("vec_id", F.posexplode("q").alias("pos", "x"))
    hard = {
        (r["vec_id"], r["cid"])
        for r in km.assign_longform(long, cents_df).collect()
    }
    soft = km.assign_longform_soft(long, cents_df, p=2).collect()
    by_vec: dict = {}
    for r in soft:
        by_vec.setdefault(r["vec_id"], []).append((r["rank"], r["cid"]))
    n_vec = len({v for v, _ in hard})
    assert len(by_vec) == n_vec
    rank1 = {(v, dict(rs)[1]) for v, rs in by_vec.items()}
    assert rank1 == hard, "soft rank-1 must equal the hard assignment"
    for v, rs in by_vec.items():
        assert sorted(r for r, _ in rs) == [1, 2], f"{v}: expected 2 ranks"
        cids = [c for _, c in rs]
        assert len(set(cids)) == 2, f"{v}: p cells must be distinct"


def test_ivf_postfilter_overfetch_recall_ladder(spark):
    """Post-filter filtered ANN (q_knn_ivf_filtered's tier): recall
    against the EXACT pre-filter tier must collapse at overfetch=1
    (every fetched neighbor can fail the predicate — the structural
    failure mode that motivates the k/selectivity over-fetch rule),
    recover monotonically with overfetch, and plateau at the IVF
    probe's own recall (the residual miss is cell pruning, not the
    filter; measured 0.533 → 0.733 → 0.867 → 0.867 at sf0.01,
    overfetch 1/2/4/8)."""
    from pyspark.sql import functions as F

    from embarrassingly_parallel_image_classification_spark.ml import knn
    from embarrassingly_parallel_image_classification_spark.sources.tables import t

    SF = "/root/testdata/sf0.01"
    emb = t(spark, SF, "embeddings")
    idx = knn.ensure_ivf_index(spark, SF)
    queries = emb.filter(F.col("vec_id") < knn.N_QUERIES)
    pred = F.col("vec_id") % 2 == 0
    truth = {
        (r["qid"], r["vec_id"])
        for r in knn.knn_exact(emb.filter(pred), queries, knn.TOP_K).collect()
    }
    recalls = []
    for of in (1, 2, 4, 8):
        got = {
            (r["qid"], r["vec_id"])
            for r in knn.ivf_query_postfilter(
                idx, queries, pred, overfetch=of
            ).collect()
        }
        recalls.append(len(got & truth) / len(truth))
    assert recalls[0] <= 0.7, f"overfetch=1 should collapse: {recalls}"
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:])), (
        f"recall must be monotone in overfetch: {recalls}"
    )
    assert recalls[2] >= 0.85, f"overfetch=4 should recover: {recalls}"
    assert abs(recalls[2] - recalls[3]) < 1e-9, (
        f"plateau = the IVF probe's own miss, not the filter: {recalls}"
    )


def test_linreg_gd_training_log_converges(spark):
    """q_train_linreg_gd's oracle pins bit-exactness; this pins the
    SEMANTICS the exactness is supposed to carry: the training MAE
    decreases strictly every iteration on this fixture (a wrong
    gradient sign or an unstable learning rate both break this long
    before they break determinism), the final validation row (iter
    T+1) scores the SAME weights as the last update, and its MAE is
    the best of the run."""
    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.ml.training import (
        GD_ITERS,
    )

    rows = (
        registry.queries()["q_train_linreg_gd"](spark, SF_T2)
        .orderBy("iter")
        .collect()
    )
    assert len(rows) == GD_ITERS + 1
    maes = [r["mae_e6"] for r in rows]
    assert all(a > b for a, b in zip(maes, maes[1:])), maes
    last, fin = rows[-2], rows[-1]
    assert (fin["w0_e6"], fin["w1_e6"], fin["w2_e6"]) == (
        last["w0_e6"], last["w1_e6"], last["w2_e6"],
    )


def test_unigram_train_matches_reference(spark):
    """q_text_unigram_train's final vocabulary head must equal, row
    for row, an independent pure-Python unigram-LM EM run on the same
    corpus: same substring seeding (all pieces len 1..4 weighted by
    word freq, singles kept unconditionally, top-48 multis on
    count desc / piece asc), same e6-integer log-prob model, same
    Viterbi tie order (max score → fewer pieces → lexicographic
    sequence), same M-step (singles floored at +1, unused multis
    pruned). The reference segments by suffix recursion — a different
    code shape than the engine's forward DP — so an ordering or
    pruning divergence cannot hide in shared code."""
    import math
    from collections import Counter
    from functools import lru_cache

    import duckdb

    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.ml.corpus import (
        UNI_ITERS,
        UNI_MAXL,
        UNI_SEED_V,
        UNI_TOPK,
    )

    con = duckdb.connect()
    wf = dict(
        con.execute(
            f"""
        SELECT w, COUNT(*) c FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w
            FROM read_parquet('{SF_T2}/documents.parquet'))
        WHERE length(w) >= 1 GROUP BY w
        """
        ).fetchall()
    )

    seed: Counter = Counter()
    for w, c in wf.items():
        for length in range(1, UNI_MAXL + 1):
            for i in range(len(w) - length + 1):
                seed[w[i : i + length]] += c
    singles = {p: n for p, n in seed.items() if len(p) == 1}
    multis = sorted(
        ((p, n) for p, n in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UNI_SEED_V]
    counts = dict(singles)
    counts.update(dict(multis))

    usage: Counter = Counter()
    for _ in range(UNI_ITERS):
        total = sum(counts.values())
        lp = {
            p: round(math.log(c / total) * 1_000_000)
            for p, c in counts.items()
        }

        def seg(word):
            @lru_cache(maxsize=None)
            def rest(i):
                # best (neg_score, n_pieces, seq) for word[i:]
                if i == len(word):
                    return (0, 0, ())
                cands = []
                for j in range(i + 1, min(i + UNI_MAXL, len(word)) + 1):
                    piece = word[i:j]
                    if piece in lp:
                        s, k, sq = rest(j)
                        cands.append((s - lp[piece], k + 1, (piece,) + sq))
                return min(cands)

            return rest(0)[2]

        usage = Counter()
        for w, c in wf.items():
            for piece in seg(w):
                usage[piece] += c
        counts = {p: usage.get(p, 0) + 1 for p in singles}
        counts.update(
            {p: u for p, u in usage.items() if len(p) > 1 and u > 0}
        )

    want = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_TOPK]
    got = [
        (r["piece"], r["usage"])
        for r in registry.queries()["q_text_unigram_train"](
            spark, SF_T2
        ).collect()
    ]
    assert got == want
