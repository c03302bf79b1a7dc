"""Exact-substring dedup scale probe: wall time and intermediate sizes
of the K-gram inversion (q_dedup_substring / ml.cleaning.substring_spans)
across corpus scales, plus the cost split between the gram groupBy and
the mark join — the evidence behind the claim that the operator's cost
tracks corpus tokens (gram count), not doc-pair count (the property
that makes it viable where pairwise dedup is not).

    python scripts/substring_probe.py     # sf0.001 / sf0.01 / sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.ml.cleaning import substring_spans
from embarrassingly_parallel_image_classification_spark.session import get_spark


def main() -> None:
    spark = get_spark()
    print(f"{'sf':8s} {'docs':>7s} {'grams':>9s} {'dup_pos':>9s} "
          f"{'spans':>7s} {'warm_s':>7s}")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        d = spark.read.parquet(path).select("doc_id", "text")
        n_docs = d.count()
        grams = d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 5), "
                    "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 5)))"
                )
            ).alias("gram"),
        )
        n_grams = grams.count()
        dup_pos = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("c"))
            .filter("c >= 2")
            .agg(F.sum("c"))
            .collect()[0][0]
            or 0
        )
        spans = substring_spans(d, k=5)
        spans.count()  # warm
        t0 = time.time()
        n_spans = spans.count()
        warm = time.time() - t0
        print(
            f"{sf:8s} {n_docs:7d} {n_grams:9d} {dup_pos:9d} "
            f"{n_spans:7d} {warm:7.2f}"
        )


if __name__ == "__main__":
    main()
