"""Scan-cost probe for the binary vector tier (q_knn_hamming): top-k
over a synthetic corpus two ways —

  cosine  — exact float cosine against every vector (the K3 baseline
            spelling: zip_with dot product over 64 floats/row);
  hamming — the 1-bit tier: one BIGINT signature per vector,
            XOR + POPCOUNT per pair.

Signatures are prebuilt for both (index build is untimed, like the
IVF probe); the timed object is the per-query SCAN. Also reports the
binary tier's recall@k vs the float ranking — the quality/cost trade
in one table.

    python scripts/hamming_probe.py [n_vectors ...]   # default 100k 400k
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.session import get_spark

K = 10
N_Q = 8


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark("hamming-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        # clustered corpus (64 clusters): center(cluster) + 0.15-scale
        # noise — quantization recall is meaningless on structureless
        # uniform vectors (measured: recall@10 ~ 0.03, because ALL
        # cosines are ~0 and the "true" top-k is itself noise), and
        # real embedding corpora are clustered by construction
        base = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), j -> "
                "CAST(CAST(xxhash64(id % 64, j) % 1000 AS DOUBLE) "
                "/ 1000.0 - 0.5 AS DOUBLE) "
                "+ 0.15 * (CAST(CAST(xxhash64(id, j, 7) % 1000 "
                "AS DOUBLE) / 1000.0 - 0.5 AS DOUBLE)))"
            ).alias("emb"),
        )
        corpus = base.withColumn(
            "sig",
            F.expr(
                "aggregate(zip_with(slice(emb, 1, 63), "
                "CAST(sequence(0, 62) AS ARRAY<INT>), "
                "(e, i) -> IF(e > 0D, shiftleft(CAST(1 AS BIGINT), i), "
                "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), "
                "(acc, x) -> acc + x)"
            ),
        ).localCheckpoint()
        q = corpus.filter(F.col("vec_id") < N_Q).select(
            F.col("vec_id").alias("qid"),
            F.col("emb").alias("q_emb"),
            F.col("sig").alias("qsig"),
        )
        w_cos = Window.partitionBy("qid").orderBy(
            F.desc("sim"), F.asc("vec_id")
        )
        t0 = time.time()
        cos = (
            corpus.crossJoin(F.broadcast(q.select("qid", "q_emb")))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                F.round(
                    F.expr(
                        "aggregate(zip_with(emb, q_emb, (a, b) -> a * b), "
                        "0D, (acc, x) -> acc + x)"
                    ),
                    6,
                ).alias("sim"),
            )
            .withColumn("r", F.row_number().over(w_cos))
            .filter(F.col("r") <= K)
            .collect()
        )
        t_cos = time.time() - t0
        w_ham = Window.partitionBy("qid").orderBy("h", F.asc("vec_id"))
        t0 = time.time()
        ham = (
            corpus.select("vec_id", "sig")
            .crossJoin(F.broadcast(q.select("qid", "qsig")))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))).alias(
                    "h"
                ),
            )
            .withColumn("r", F.row_number().over(w_ham))
            .filter(F.col("r") <= K)
            .collect()
        )
        t_ham = time.time() - t0
        # the CASCADE: hamming shortlist (16x overfetch) -> exact
        # cosine rerank of survivors only -> top-k
        t0 = time.time()
        shortlist = (
            corpus.select("vec_id", "sig")
            .crossJoin(F.broadcast(q.select("qid", "qsig")))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                F.bit_count(
                    F.col("sig").bitwiseXOR(F.col("qsig"))
                ).alias("h"),
            )
            .withColumn("r", F.row_number().over(w_ham))
            .filter(F.col("r") <= K * 16)
            .select("qid", "vec_id")
        )
        casc = (
            shortlist.join(corpus.select("vec_id", "emb"), "vec_id")
            .join(F.broadcast(q.select("qid", "q_emb")), "qid")
            .select(
                "qid",
                "vec_id",
                F.round(
                    F.expr(
                        "aggregate(zip_with(emb, q_emb, (a, b) -> a * b), "
                        "0D, (acc, x) -> acc + x)"
                    ),
                    6,
                ).alias("sim"),
            )
            .withColumn("r", F.row_number().over(w_cos))
            .filter(F.col("r") <= K)
            .collect()
        )
        t_casc = time.time() - t0
        exact = {(r["qid"], r["vec_id"]) for r in cos}
        got_raw = {(r["qid"], r["vec_id"]) for r in ham}
        got_casc = {(r["qid"], r["vec_id"]) for r in casc}
        print(json.dumps({
            "metric": "hamming_probe", "n": n, "k": K,
            "t_cosine_sec": round(t_cos, 2),
            "t_hamming_sec": round(t_ham, 2),
            "t_cascade_sec": round(t_casc, 2),
            "speedup_raw": round(t_cos / t_ham, 2),
            "speedup_cascade": round(t_cos / t_casc, 2),
            "recall_raw": round(len(exact & got_raw) / len(exact), 3),
            "recall_cascade": round(len(exact & got_casc) / len(exact), 3),
        }))


if __name__ == "__main__":
    main()
