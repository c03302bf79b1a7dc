"""Scaling probe: prefix-filtered vs naive similarity join as the corpus
grows and as hot boilerplate shingles appear (the naive join's
quadratic worst case). Synthesizes corpora in memory from the sf0.1
documents fixture — nothing written to /root/testdata.

    python scripts/scale_probe_dedup.py

Records the evidence behind BASELINE.md's round-4 scale table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.ml import dedup
from embarrassingly_parallel_image_classification_spark.session import get_spark
from embarrassingly_parallel_image_classification_spark.sources.tables import t

spark = get_spark("scale-probe")
spark.sparkContext.setLogLevel("ERROR")
base = t(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")


def corpus(mult: int, boilerplate: bool):
    """mult perturbed copies of the 5k-doc fixture; optionally append
    one shared boilerplate sentence to EVERY doc (a hot shingle set
    that the naive join must pair across all docs)."""
    parts = []
    for k in range(mult):
        c = base.select(
            (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
            # perturb: prefix a copy-specific token so copies are not
            # exact dups (keeps true near-dup pairs sparse)
            F.concat(F.lit(f"copy{k} "), "text").alias("text"),
        )
        parts.append(c)
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    if boilerplate:
        d = d.select(
            "doc_id",
            F.concat("text", F.lit(" all rights reserved terms of service apply")).alias("text"),
        )
    return d


def timed(fn, d):
    t0 = time.time()
    n = fn(d).count()
    return n, round(time.time() - t0, 2)


def naive(d):
    return dedup.jaccard_pairs(d).filter(F.col("jaccard_raw") >= 0.5)


def prefix(d):
    return dedup.jaccard_pairs_at(d, 0.5)


def probe_prefix_growth():
    """Round-5 extension (verdict item 4): push to 50k/100k docs.
    Naive is only run where it finishes in sane time (<=20k docs);
    beyond that the point is the PREFIX join's growth curve alone —
    near-linear in candidates is the scale claim."""
    for mult, boiler, run_naive in [
        (1, False, True),
        (1, True, True),
        (4, False, True),
        (4, True, True),
        (10, False, False),
        (10, True, False),
        (20, False, False),
        (20, True, False),
    ]:
        d = corpus(mult, boiler).persist()
        n_docs = d.count()
        n_p, t_p = timed(prefix, d)
        label = f"{n_docs} docs boiler={boiler}"
        if run_naive:
            spark.catalog.clearCache()
            d = corpus(mult, boiler).persist()
            d.count()
            n_n, t_n = timed(naive, d)
            print(
                f"{label:32s} prefix: {n_p} pairs {t_p}s | naive: {n_n} pairs {t_n}s",
                flush=True,
            )
        else:
            print(f"{label:32s} prefix: {n_p} pairs {t_p}s | naive: skipped", flush=True)
        d.unpersist()
        spark.catalog.clearCache()


def probe_cc_crossover():
    """Min-label vs star-contraction crossover (verdict item 4): the
    decision variable is component DIAMETER, not size. Min-label needs
    O(diameter) shuffle rounds; star needs O(log² n) regardless. Probe
    both on (a) near-clique unions (dup-cluster shape, diameter ~2) and
    (b) path graphs (worst-case diameter) of growing length."""
    import itertools

    def run(edges_rows, label, minlabel_iters=60):
        e = spark.createDataFrame(edges_rows, "id_a bigint, id_b bigint")
        t0 = time.time()
        n1 = dedup.connected_components(e, max_iter=minlabel_iters).count()
        t_min = round(time.time() - t0, 2)
        t0 = time.time()
        n2 = dedup.connected_components_star(e).count()
        t_star = round(time.time() - t0, 2)
        assert n1 == n2, (label, n1, n2)
        print(f"CC {label:28s} min-label: {t_min}s | star: {t_star}s", flush=True)

    # (a) 500 cliques of 6 nodes each — diameter 1
    cliq = []
    for c in range(500):
        base_id = c * 10
        for a, b in itertools.combinations(range(6), 2):
            cliq.append((base_id + a, base_id + b))
    run(cliq, "3000n cliques(diam=1)")
    # (b) single paths of growing diameter
    for length in (20, 50, 200):
        path = [(i, i + 1) for i in range(length)]
        run(path, f"path len={length} (diam={length})", minlabel_iters=length + 5)


def probe_incremental(mult: int = 4):
    """Round-6: incremental screen vs full recompute. Corpus = mult
    copies of the fixture; the 'incoming batch' is 10% of it. Compare
    (a) jaccard_cross_at(existing, incoming) — what a rolling crawl
    pays per ingest — against (b) jaccard_pairs_at over the whole
    corpus — what recomputing from scratch pays. Run with
    python scripts/scale_probe_dedup.py incremental"""
    d = corpus(mult, boilerplate=False)
    existing = d.filter(F.col("doc_id") % 10 != 0)
    incoming = d.filter(F.col("doc_id") % 10 == 0)
    t0 = time.time()
    n_inc = dedup.jaccard_cross_at(existing, incoming, 0.5).count()
    t_inc = round(time.time() - t0, 2)
    t0 = time.time()
    n_full = dedup.jaccard_pairs_at(d, 0.5).count()
    t_full = round(time.time() - t0, 2)
    print(
        f"mult={mult} docs={d.count()}: incremental {n_inc} cross-pairs "
        f"in {t_inc}s vs full recompute {n_full} pairs in {t_full}s "
        f"({round(t_full / t_inc, 1)}x)"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "prefix"):
        probe_prefix_growth()
    if which in ("all", "cc"):
        probe_cc_crossover()
    if which == "incremental":
        for m in (2, 4, 8):
            probe_incremental(m)
