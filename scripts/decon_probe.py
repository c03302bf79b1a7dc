"""Decontamination scale probe: the q_text_decontaminate plan argument —
the eval side is benchmark-sized, so its distinct-gram set BROADCASTS
and the train corpus is never shuffled by gram — measured against the
shuffle spelling on 100k synthetic documents (200× the sf0.01
fixture; ~4.7M train 4-grams), eval = 1k docs.

Two spellings of the identical semantics:
  * broadcast: train grams ⋈ broadcast(distinct eval grams) — one
    map-side hash join, the corpus-side data never moves;
  * shuffle:   the same join with broadcast disabled (sort-merge) —
    BOTH sides shuffle by gram, i.e. the whole train gram stream pays
    a network pass that grows with the corpus, not the eval set.

Both must flag the IDENTICAL contaminated-doc set (asserted). The
wall-time gap is the evidence; at 100 TB the shuffle spelling moves
the entire corpus's grams while the broadcast one moves only the eval
set to each executor once.

    python scripts/decon_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.session import get_spark

N_DOCS = 100_000
DOC_LEN = 50
VOCAB = 2_000
K = 4
EVAL_MOD = 100  # 1% of docs are the "benchmark"


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # synthetic corpus: 50 vocab-bounded tokens per doc, deterministic.
    # Contamination is PLANTED (random 4-grams over a 2000-token vocab
    # never collide): every doc with doc_id % 50 == 3 — necessarily a
    # TRAIN doc, since eval needs doc_id % 100 == 7 — copies the
    # 10-token slice at offset 20 from eval doc (doc_id % 999)*100 + 7
    # (the % 999 keeps the referenced eval id < N_DOCS), so the
    # expected flagged set is exactly the planted docs, asserted below.
    base = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"transform(sequence(0, {DOC_LEN - 1}),"
            f" p -> concat('w', abs(xxhash64(id, p)) % {VOCAB}))"
        ).alias("w"),
    )
    docs = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 3,
            F.expr(
                "concat(slice(w, 1, 20), "
                f"transform(sequence(0, 9), p -> concat('w', "
                f"abs(xxhash64((doc_id % 999) * {EVAL_MOD} + 7, p + 20))"
                f" % {VOCAB})), "
                "slice(w, 31, 20))"
            ),
        )
        .otherwise(F.col("w"))
        .alias("w"),
    ).localCheckpoint(eager=True)
    # per-doc gram dedup MAP-SIDE (array_distinct before the explode,
    # the q_text_decontaminate plan) — explode-then-distinct would shuffle
    # every train gram and dominate both join spellings
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, {DOC_LEN - K}), "
                    f"i -> concat_ws(' ', slice(w, i + 1, {K})))"
                )
            )
        ).alias("gram"),
    )
    ev = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 7)
        .select("gram")
        .distinct()
    )
    tr = grams.filter(F.col("doc_id") % EVAL_MOD != 7)

    def run(broadcast: bool) -> tuple[int, float]:
        if broadcast:
            joined = tr.join(F.broadcast(ev), "gram")
        else:
            joined = tr.hint("shuffle_merge").join(
                ev.hint("shuffle_merge"), "gram"
            )
        out = joined.groupBy("doc_id").agg(F.count("*").alias("n"))
        best, n = float("inf"), -1
        for _ in range(2):  # min-of-2: first pass pays JIT/scan warmup
            t0 = time.time()
            n = out.count()
            best = min(best, time.time() - t0)
        return n, best

    n_s, t_s = run(broadcast=False)
    n_b, t_b = run(broadcast=True)
    n_planted = N_DOCS // 50  # doc_id % 50 == 3, all train by residue
    assert n_b == n_s == n_planted, (
        f"expected exactly the {n_planted} planted docs; "
        f"broadcast={n_b} shuffle={n_s}"
    )
    print(
        f"{N_DOCS:,} docs, {DOC_LEN - K + 1} grams/doc, eval=1%: "
        f"contaminated={n_b:,} (= planted, asserted)"
    )
    print(f"broadcast eval-gram join: {t_b:.1f}s")
    print(f"shuffle (sort-merge) join: {t_s:.1f}s  ({t_s / t_b:.1f}x)")


if __name__ == "__main__":
    main()
