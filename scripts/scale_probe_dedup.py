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


for mult, boiler in [(1, False), (1, True), (4, False), (4, True)]:
    d = corpus(mult, boiler).persist()
    n_docs = d.count()
    n_p, t_p = timed(prefix, d)
    spark.catalog.clearCache(); d = corpus(mult, boiler).persist(); d.count()
    n_n, t_n = timed(naive, d)
    label = f"{n_docs} docs boiler={boiler}"
    print(f"{label:32s} prefix: {n_p} pairs {t_p}s | naive: {n_n} pairs {t_n}s", flush=True)
    d.unpersist()
