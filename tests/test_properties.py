"""Property-based tests (hypothesis) for the algorithmic claims that a
single fixture can't pin convincingly.

Example counts are deliberately small (each example runs Spark jobs);
derandomized so CI-like runs are stable. The properties:

* prefix-filtered similarity join ≡ naive all-pairs join at the same
  threshold, for ANY corpus (the losslessness theorem, adversarially
  probed with short docs, repeated tokens, shared boilerplate);
* star CC ≡ min-label CC on arbitrary random graphs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.ml import dedup

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=10)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_prefix_filter_lossless_on_random_corpora(spark, texts):
    """jaccard_pairs_at == filtered jaccard_pairs for arbitrary corpora.
    A tiny 8-word vocabulary forces heavy shingle collisions — the
    regime where a broken prefix length or length filter would drop a
    true pair."""
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
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


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_prefix_filter_lossless_at_non_dyadic_tau(spark, texts):
    """Same losslessness property at tau=0.3 — NOT exactly representable
    in binary. A float ceil(tau*sz) can round up past the true integer
    (e.g. ceil(0.1*10) = ceil(1.0000000000000002) = 2, not 1),
    shortening the prefix below the theorem's bound and
    silently dropping true pairs; the integer (num·sz+den−1) div den
    bound in jaccard_pairs_at must not (round-4 ADVICE item 1)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_pairs_at(d, 0.3).collect()
    }
    naive = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_pairs(d)
        .filter(F.col("jaccard_raw") >= 0.3)
        .collect()
    }
    assert fast == naive


_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_edges)
def test_star_cc_equals_minlabel_on_random_graphs(spark, pairs):
    """Alternating star contraction and min-label propagation must
    agree on arbitrary graphs (self-loops and duplicate edges
    included)."""
    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    e = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    lab_min = {
        (r.node, r.cluster_id) for r in dedup.connected_components(e).collect()
    }
    lab_star = {
        (r.node, r.cluster_id)
        for r in dedup.connected_components_star(e).collect()
    }
    assert lab_min == lab_star


_lake_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 30), min_size=1, max_size=6)),
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 30), min_size=1, max_size=6)),
        st.tuples(st.just("delete"), st.lists(st.integers(0, 30), min_size=1, max_size=4)),
        st.tuples(st.just("restore"), st.lists(st.integers(1, 5), min_size=1, max_size=1)),
        st.tuples(st.just("rename"), st.lists(st.integers(0, 0), min_size=1, max_size=1)),
        st.tuples(st.just("add_column"), st.lists(st.integers(0, 0), min_size=1, max_size=1)),
        st.tuples(st.just("erase"), st.lists(st.integers(0, 30), min_size=1, max_size=1)),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=25,  # the 7-op pool needs more draws to hit the
    # erase success path and the sticky-guard interactions
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_lake_ops)
def test_lakehouse_model_equivalence_on_random_op_sequences(spark, ops):
    """Model-based check of the snapshot layer: an arbitrary sequence
    of append/overwrite/delete/restore ops must leave every HISTORICAL version
    readable (through the MoR reader) with exactly the contents a
    trivial in-memory model predicts — multiset semantics for
    appends, logical replace for overwrite, key-erasure for delete,
    name-only change for RENAME (round-6 session 4: historical
    versions must read back under their HISTORICAL column name), and
    content-invisibility for ADD COLUMN DEFAULT on the key column.
    The model also tracks the guard matrix: delete×mapping,
    rename×delete, rename×defaults, add-default×delete (session-5
    review fix — the MoR reader can't resolve a defaulted column) are
    refusals, and a refusal must not create a version. ERASE rewrites
    the key out of EVERY retained version IN PLACE (no new version),
    refuses on a mapped table, and refuses while delete files keyed on
    the erased column exist. One counterexample here means snapshot
    isolation, the manifest chain, delete-file application, erase
    history-rewriting, or the metadata-commit layer is broken."""
    import shutil as _shutil
    import tempfile as _tempfile

    import pytest as _pytest

    from embarrassingly_parallel_image_classification_spark.plans import lakehouse

    path = _tempfile.mkdtemp(prefix="lake_prop_") + "/tbl"
    try:
        model_versions: list[list[int]] = []
        model_colnames: list[str] = []
        cur: list[int] = []
        col = "k"
        n_renames = n_adds = 0
        has_mapping = has_defaults = has_deletes = False
        # erase scans EVERY retained manifest, so its refusals key on
        # what ever happened in history, not just the latest version
        hist_mapping = hist_deletes = False
        for kind, keys in ops:
            if kind == "append":
                df = spark.createDataFrame([(k,) for k in keys], f"{col} bigint")
                if has_defaults:
                    # appends must carry every defaulted column
                    from pyspark.sql import functions as _F

                    for i in range(1, n_adds + 1):
                        df = df.withColumn(f"c{i}", _F.lit(7))
                lakehouse.snapshot_write(df, path, "append")
                cur = cur + keys
            elif kind == "overwrite":
                df = spark.createDataFrame([(k,) for k in keys], f"{col} bigint")
                lakehouse.snapshot_write(df, path, "overwrite")
                cur = list(keys)
                has_mapping = has_defaults = has_deletes = False
            elif kind == "restore":
                target = keys[0]
                if target > len(model_versions):
                    continue  # restoring a version that doesn't exist: skip
                lakehouse.restore_table(spark, path, target)
                # RESTORE reproduces the target's LOGICAL (MoR-applied)
                # content as a fresh overwrite commit, under the
                # target's logical column name, mapping/defaults cleared
                cur = list(model_versions[target - 1])
                col = model_colnames[target - 1]
                has_mapping = has_defaults = has_deletes = False
            elif kind == "rename":
                if lakehouse.current_version(path) == 0:
                    continue
                if has_deletes or has_defaults:
                    with _pytest.raises(ValueError):
                        lakehouse.rename_column(path, col, f"k_r{n_renames + 1}")
                    continue  # refusal must not create a version
                n_renames += 1
                new = f"k_r{n_renames}"
                lakehouse.rename_column(path, col, new)
                col = new
                has_mapping = True
                hist_mapping = True
            elif kind == "add_column":
                if lakehouse.current_version(path) == 0:
                    continue
                if has_mapping or has_deletes:
                    with _pytest.raises(ValueError):
                        lakehouse.add_column_default(
                            path, f"c{n_adds + 1}", "bigint", 7
                        )
                    continue
                n_adds += 1
                lakehouse.add_column_default(path, f"c{n_adds}", "bigint", 7)
                has_defaults = True
            elif kind == "erase":
                if lakehouse.current_version(path) == 0:
                    continue
                victim = keys[0]
                if hist_mapping or hist_deletes:
                    # mapped anywhere in history: logical/physical
                    # mismatch; any historical delete file is keyed on
                    # this very column — both refusals are STICKY
                    # because erase rewrites every retained version
                    with _pytest.raises(ValueError):
                        lakehouse.erase_rows(spark, path, col, victim)
                    continue
                lakehouse.erase_rows(spark, path, col, victim)
                # history REWRITTEN in place: the key vanishes from
                # every retained version; NO new version is created
                model_versions = [
                    [k for k in ver if k != victim] for ver in model_versions
                ]
                cur = [k for k in cur if k != victim]
                continue
            else:
                if lakehouse.current_version(path) == 0:
                    continue  # deleting from a non-existent table: skip
                df = spark.createDataFrame([(k,) for k in keys], f"{col} bigint")
                if has_mapping or has_defaults:
                    with _pytest.raises(ValueError):
                        lakehouse.delete_where(spark, path, col, df)
                    continue
                lakehouse.delete_where(spark, path, col, df)
                has_deletes = True
                hist_deletes = True
                doomed = set(keys)
                cur = [k for k in cur if k not in doomed]
            model_versions.append(list(cur))
            model_colnames.append(col)
        for v, (want, name) in enumerate(
            zip(model_versions, model_colnames), start=1
        ):
            frame = lakehouse.snapshot_read_mor(spark, path, v)
            assert name in frame.columns, (
                f"version {v}: column {name!r} missing, got {frame.columns} "
                f"(ops={ops})"
            )
            got = sorted(r[name] for r in frame.collect())
            assert got == sorted(want), (
                f"version {v}: got {got}, model says {sorted(want)} (ops={ops})"
            )
    finally:
        _shutil.rmtree(path, ignore_errors=True)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_incremental_cross_join_lossless_on_random_corpora(spark, texts):
    """jaccard_cross_at (round-6 incremental screen) == the naive
    all-pairs join restricted to cross pairs, for ANY corpus and a
    non-dyadic tau=0.3 — probing that the SHARED rare-first shingle
    order across two frames preserves the prefix theorem (a per-frame
    order would break it: a shingle rare in one frame but hot in the
    union could fall outside the other side's prefix)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    existing = d.filter(F.col("doc_id") % 2 == 0)
    incoming = d.filter(F.col("doc_id") % 2 == 1)
    fast = {
        (r.id_exist, r.id_new, r.jaccard)
        for r in dedup.jaccard_cross_at(existing, incoming, 0.3).collect()
    }
    naive = set()
    for r in (
        dedup.jaccard_pairs(d).filter(F.col("jaccard_raw") >= 0.3).collect()
    ):
        a_new, b_new = r.id_a % 2 == 1, r.id_b % 2 == 1
        if a_new != b_new:
            exist_id, new_id = (r.id_b, r.id_a) if a_new else (r.id_a, r.id_b)
            naive.add((exist_id, new_id, r.jaccard))
    assert fast == naive


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=40,
    )
)
def test_two_phase_skyline_equals_bruteforce(spark, pts):
    """The distributed skyline plan (distinct pairs → local skyline per
    partition → global skyline of the union) must return EXACTLY the
    brute-force O(n²) dominance frontier on arbitrary point sets —
    including duplicate points (all non-dominated duplicates kept) and
    total-order degenerate cases (all on one line)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(pts)],
        "p_partkey int, price_c int, p_size int",
    ).repartition(4)
    pairs = df.select("price_c", "p_size").distinct()

    def undominated(d, col):
        w = (
            Window.partitionBy(col)
            .orderBy(F.asc("price_c"), F.desc("p_size"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            d.withColumn("__m", F.max("p_size").over(w))
            .filter(F.col("__m").isNull() | (F.col("__m") < F.col("p_size")))
            .drop("__m")
        )

    local = undominated(
        pairs.withColumn("__pid", F.spark_partition_id()), "__pid"
    ).drop("__pid")
    frontier = undominated(local.withColumn("__g", F.lit(0)), "__g").drop("__g")
    got = sorted(
        (r["p_partkey"])
        for r in df.join(frontier, ["price_c", "p_size"]).collect()
    )
    want = sorted(
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            op <= p and os_ >= s and (op < p or os_ > s) for (op, os_) in pts
        )
    )
    assert got == want


def test_prorata_allocation_sums_back_exactly(spark):
    """Largest-remainder invariant: per order, the integer allocations
    must sum EXACTLY to the order's total cents — the property the
    operator exists for (floor-only allocation under-distributes;
    rounding over-distributes)."""
    from embarrassingly_parallel_image_classification_spark import registry
    from tests.conftest import SF_T2

    alloc = registry.queries()["q_alloc_prorata"](spark, SF_T2)
    per_order = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_c").alias("allocated")
    )
    o = (
        spark.read.parquet(f"{SF_T2}/orders.parquet")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("total_c"),
        )
    )
    bad = (
        per_order.join(o, "l_orderkey")
        .filter(F.col("allocated") != F.col("total_c"))
        .count()
    )
    assert bad == 0, f"{bad} orders where allocations do not sum to the total"


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=40,
    )
)
def test_two_phase_rank_equals_global_row_number(spark, rows):
    """two_phase_rank == a global ROW_NUMBER window for ANY frame and
    ANY coarse bucket that prefixes the sort order — including heavy
    bucket collisions (values 0..50 over up to 40 rows) and duplicate
    full keys (id tiebreak). The property that makes the distributed
    rank a drop-in for NTILE/ranking without a single-partition
    window."""
    from pyspark.sql import Window

    from embarrassingly_parallel_image_classification_spark.operators.sort_limit import (
        two_phase_rank,
    )

    df = spark.createDataFrame(
        [(v, i) for i, (v, _) in enumerate(rows)], "v bigint, id bigint"
    )
    got = {
        (r.v, r.id, r.rk)
        for r in two_phase_rank(
            df, F.expr("v DIV 7"), ["v", "id"]
        ).collect()
    }
    want = {
        (r.v, r.id, r.rk)
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_containment_probe_prefix_lossless(spark, texts):
    """The rarest-first probe prefix of q_dedup_containment is
    LOSSLESS: every tau-contained pair survives candidate generation,
    so the full pipeline equals the naive all-pairs containment join —
    probed on tiny-vocabulary corpora where shingle collisions and
    short docs stress the ⌊(1−tau)·|A|⌋+1 prefix bound."""
    from embarrassingly_parallel_image_classification_spark.registry import (
        _REGISTRY,
    )
    from embarrassingly_parallel_image_classification_spark.ml.dedup import (
        shingles,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    # naive: full shingle self-join containment at tau = 0.8
    sh = shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained_id"),
            F.col("b.doc_id").alias("container_id"),
        )
        .agg(F.count("*").alias("inter"))
    )
    naive = {
        (r.contained_id, r.container_id, r.inter)
        for r in inter.join(
            sizes.withColumnRenamed("doc_id", "contained_id"), "contained_id"
        )
        .filter(F.col("inter") * 5 >= 4 * F.col("sz"))
        .collect()
    }
    # the pipeline, on the same in-memory frame: re-use the registered
    # query's logic by monkey-free invocation through a temp parquet
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        fast = {
            (r.contained_id, r.container_id, r.inter)
            for r in _REGISTRY["q_dedup_containment"].fn(spark, tmp).collect()
        }
    assert fast == naive


def test_bitmap_overlap_drops_zero_overlap_word_collisions(spark):
    """Two audiences that collide in a 64-user word block WITHOUT
    sharing a user must produce NO pair row — the naive recount
    oracle's inner join never emits such a pair, so an overlap_users=0
    row would break exact parity on disjoint-audience data (review
    finding; the fixture happens to never exercise it)."""
    from embarrassingly_parallel_image_classification_spark.operators.analytics import (
        bitmap_overlap,
    )

    words = spark.createDataFrame(
        [("a", 0, 1), ("b", 0, 2), ("c", 0, 3)],
        "event_type string, widx bigint, word bigint",
    )  # a={u0}, b={u1} (disjoint, same block), c={u0,u1}
    got = {
        (r.type_a, r.type_b, r.overlap_users, r.union_users, r.jaccard_e6)
        for r in bitmap_overlap(words).collect()
    }
    assert got == {("a", "c", 1, 2, 500000), ("b", "c", 1, 2, 500000)}


def test_two_phase_rank_keeps_null_bucket_rows(spark):
    """Rows whose bucket key is NULL must be RANKED, not silently
    dropped (review finding: a plain equi-join on the bucket loses
    them); they land where Spark's window ordering puts NULLs."""
    from pyspark.sql import Window

    from embarrassingly_parallel_image_classification_spark.operators.sort_limit import (
        two_phase_rank,
    )

    df = spark.createDataFrame(
        [(None, 0), (5, 1), (None, 2), (70, 3)], "v bigint, id bigint"
    )
    got = {
        (r.v, r.id, r.rk)
        for r in two_phase_rank(df, F.expr("v DIV 7"), ["v", "id"]).collect()
    }
    want = {
        (r.v, r.id, r.rk)
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


_merge_target = st.dictionaries(
    st.integers(0, 15), st.integers(0, 100), min_size=1, max_size=8
)
_merge_source = st.dictionaries(
    st.integers(0, 15), st.integers(0, 100), min_size=1, max_size=8
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_merge_target, _merge_source, st.integers(0, 100))
def test_merge_when_matches_dict_model(spark, target, source, thresh):
    """WHEN-clause MERGE vs a trivial dict model, for arbitrary
    unique-key tables and an arbitrary matched-delete threshold:

        matched & target.v > thresh  -> row deleted
        matched otherwise            -> v := source.v
        source-only                  -> inserted
        target-only                  -> unchanged

    One counterexample means clause precedence, the pre-update
    condition semantics, or the outer-join classification is wrong."""
    import shutil as _shutil
    import tempfile as _tempfile

    from embarrassingly_parallel_image_classification_spark.plans import lakehouse

    path = _tempfile.mkdtemp(prefix="merge_prop_") + "/tbl"
    try:
        tdf = spark.createDataFrame(
            [(k, v) for k, v in target.items()], "k bigint, v bigint"
        )
        lakehouse.snapshot_write(tdf, path, "append")
        sdf = spark.createDataFrame(
            [(k, v) for k, v in source.items()], "k bigint, v bigint"
        )
        lakehouse.merge_into_when(
            spark, path, sdf, "k", ["v"], matched_delete=f"v > {thresh}"
        )
        model = {}
        for k, v in target.items():
            if k in source:
                if v > thresh:
                    continue  # matched-delete wins, pre-update value
                model[k] = source[k]
            else:
                model[k] = v
        for k, v in source.items():
            if k not in target:
                model[k] = v
        got = {
            r["k"]: r["v"]
            for r in lakehouse.snapshot_read(spark, path).collect()
        }
        assert got == model, (target, source, thresh, got, model)
    finally:
        _shutil.rmtree(path, ignore_errors=True)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus, st.integers(min_value=1, max_value=5))
def test_word_ngrams_equals_python_reference(spark, texts, n):
    """word_ngrams (THE shared n-gram definition after the r7
    consolidation — six queries ride it) must equal the obvious Python
    reference for arbitrary corpora and gram widths, in order, for
    both the plain and the distinct form; short docs (size < n) yield
    the empty array, never a descending-sequence artifact."""
    from pyspark.sql import functions as F

    from embarrassingly_parallel_image_classification_spark.ml.text import (
        word_ngrams,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select(
        "doc_id",
        "text",
        F.split("text", " ").alias("w"),
    )
    got = {
        r["doc_id"]: (r["g"], r["gd"])
        for r in df.select(
            "doc_id",
            word_ngrams(n).alias("g"),
            word_ngrams(n, distinct=True).alias("gd"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")  # '' splits to [''] — same as F.split
        want = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ] if len(toks) >= n else []
        want_d = list(dict.fromkeys(want))  # first-occurrence order
        assert got[i][0] == want, (n, t, got[i][0], want)
        assert got[i][1] == want_d, (n, t, got[i][1], want_d)
