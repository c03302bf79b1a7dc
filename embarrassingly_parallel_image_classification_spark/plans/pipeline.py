"""The end-to-end training-data pipeline as ONE lazy plan.

Every stage a real LLM-data pipeline runs — quality filter, exact
dedup with a deterministic survivor policy, reproducible train/val
split, per-split accounting — composed into a single DataFrame that
Catalyst optimizes as a whole (the filter reaches the scan underneath
all four stages; nothing materializes between them). The near-dup and
embedding stages have their own registered queries (q_dedup_*,
q_knn_*); this composite keeps to the exactly-reproducible stages so
the whole pipeline is oracle-checkable end to end.

Scale: one shuffle for the dedup groupBy (on the fixed-width text
hash), one for the survivor join (same key), one for the final stats —
the split is a per-row hash filter, free. At 100 TB each stage stays
shuffle-minimal because every key is a hash, never the document body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t

_MIN_WORDS = 30


@register(
    "q_pipeline_e2e",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_MIN_WORDS}),
    d AS (SELECT md5(text) AS h, MIN(doc_id) AS keep_id
          FROM q GROUP BY md5(text)),
    kept AS (SELECT q.* FROM q JOIN d ON q.doc_id = d.keep_id),
    split AS (
        SELECT *, CASE WHEN md5(text) < '80' THEN 'train' ELSE 'val' END
               AS part
        FROM kept)
    SELECT lang, part,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens
    FROM split GROUP BY lang, part
    """,
    tags=("composite", "K1", "K4", "B6"),
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup (min-doc_id survivor per content
    hash) → deterministic md5 train/val split → per-(lang, split)
    token accounting, one lazy plan. Every stage uses the
    engine-independent determinism tricks proven by its standalone
    query (hash survivor policy from q_dedup_exact, md5-threshold
    split from q_sample_hash), so the ENTIRE pipeline hash-matches the
    oracle — the property that lets a 100 TB corpus rebuild be audited
    stage by stage."""
    docs = t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    ).filter(F.col("n_words") >= _MIN_WORDS)
    d = q.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    kept = q.join(d, q.doc_id == d.keep_id).select(q["*"])
    split = kept.withColumn(
        "part",
        F.when(F.md5(F.col("text").cast("binary")) < "80", "train").otherwise("val"),
    )
    return split.groupBy("lang", "part").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
    )
