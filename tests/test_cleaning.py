"""Tests for ml/cleaning.py beyond the oracle-parity layer: a
brute-force property check of the exact-substring span detector on
arbitrary random corpora (the oracle fixture can only pin one corpus),
plus determinism/invariant checks for the K-fold split and winsorize
bounds that the value-hash compare can't express."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.ml import cleaning

SF = "/root/testdata/sf0.001"

# Tiny vocabulary → heavy gram collisions, the regime where an
# off-by-one in gram width, position base, or island merging shows up.
_WORDS = ["a", "b", "c", "d"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _ref_spans(texts: list[str], k: int) -> list[tuple]:
    """Brute-force single-node reference: count every k-gram, mark
    duplicated start positions, merge consecutive runs."""
    docs = {i: t.split(" ") for i, t in enumerate(texts)}
    grams: Counter = Counter()
    for w in docs.values():
        for p in range(len(w) - k + 1):
            grams[tuple(w[p : p + k])] += 1
    spans = []
    for i, w in docs.items():
        run: list[int] = []
        for p in range(len(w) - k + 1):
            if grams[tuple(w[p : p + k])] < 2:
                continue
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append(
                        (i, run[0], run[-1] + k - 1, run[-1] - run[0] + k)
                    )
                run = [p]
        if run:
            spans.append((i, run[0], run[-1] + k - 1, run[-1] - run[0] + k))
    return sorted(spans)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus, st.integers(2, 4))
def test_substring_spans_match_bruteforce_on_random_corpora(spark, texts, k):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = sorted(
        tuple(r) for r in cleaning.substring_spans(d, k=k).collect()
    )
    assert got == _ref_spans(texts, k)


def test_substring_spans_merge_overlapping_duplicates(spark):
    """Two docs sharing a 7-token run with k=5 must yield ONE maximal
    span of 7 tokens each (positions 0..2 merged), not three 5-token
    spans — the island merge is the point of the operator."""
    shared = "v w x y z p q"
    d = spark.createDataFrame(
        [(0, shared + " tailzero"), (1, "headone " + shared)],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in cleaning.substring_spans(d, k=5).collect()
    }
    assert got == {(0, 0, 6, 7), (1, 1, 7, 7)}


def test_kfold_assignment_is_deterministic_and_in_range(spark):
    q = cleaning.q_split_kfold
    a = {(r.fold, r.lang): (r.n_docs, r.chars) for r in q(spark, SF).collect()}
    b = {(r.fold, r.lang): (r.n_docs, r.chars) for r in q(spark, SF).collect()}
    assert a == b  # same parquet → identical assignment, run to run
    assert all(0 <= f <= 4 for f, _ in a)


def test_winsorize_bounds_bracket_the_distribution(spark):
    rows = cleaning.q_clean_winsorize(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.col("l_returnflag").alias("grp"),
            F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("grp")
        .agg(
            F.min("cents").alias("mn"),
            F.max("cents").alias("mx"),
            F.sum("cents").alias("raw_sum"),
            F.count("*").alias("n"),
        )
    )
    stats = {r.grp: r for r in li.collect()}
    for r in rows:
        s = stats[r.grp]
        assert s.mn <= r.lo <= r.hi <= s.mx
        # clipping can only pull the sum toward the bounds' envelope
        assert r.n_lo + r.n_hi <= s.n
        # ~5% tails by construction (ceil ranks): each side ≤ 5% + 1
        assert r.n_lo <= s.n // 20 + 1 and r.n_hi <= s.n // 20 + 1
