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


@register(
    "q_quality_expectations",
    oracle="""
    SELECT 'orders_price_positive' AS rule,
           (SELECT COUNT(*) FROM orders) AS n_checked,
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS n_violations
    UNION ALL
    SELECT 'orders_customer_exists',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_qty_in_range',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
    UNION ALL
    SELECT 'customer_name_not_null',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer WHERE c_name IS NULL)
    UNION ALL
    SELECT 'documents_nonempty_text',
           (SELECT COUNT(*) FROM documents),
           (SELECT COUNT(*) FROM documents WHERE text IS NULL OR LENGTH(text) = 0)
    """,
    tags=("composite", "D3", "C5"),
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the dbt-test / expectations
    pattern): each rule is a conditional aggregate or anti-join orphan
    count, unioned into one violations report the pipeline can assert
    on before publishing a table. Each COUNT is a map-side conditional
    aggregate (one scan per table, no row materializes unless it
    violates); the referential check is a left-anti broadcast join.
    At 100 TB this exact report runs as the write-audit-publish gate."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    d = t(spark, sf_dir, "documents")

    def rule(name, n_checked_df, n_viol_df):
        return n_checked_df.crossJoin(n_viol_df).select(
            F.lit(name).alias("rule"), "n_checked", "n_violations"
        )

    orphans = o.join(
        F.broadcast(c.select("c_custkey")),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    reports = [
        rule(
            "orders_price_positive",
            o.agg(F.count("*").alias("n_checked")),
            o.agg(F.count_if(F.col("o_totalprice") <= 0).alias("n_violations")),
        ),
        rule(
            "orders_customer_exists",
            o.agg(F.count("*").alias("n_checked")),
            orphans.agg(F.count("*").alias("n_violations")),
        ),
        rule(
            "lineitem_qty_in_range",
            li.agg(F.count("*").alias("n_checked")),
            li.agg(
                F.count_if(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
                ).alias("n_violations")
            ),
        ),
        rule(
            "customer_name_not_null",
            c.agg(F.count("*").alias("n_checked")),
            c.agg(F.count_if(F.col("c_name").isNull()).alias("n_violations")),
        ),
        rule(
            "documents_nonempty_text",
            d.agg(F.count("*").alias("n_checked")),
            d.agg(
                F.count_if(
                    F.col("text").isNull() | (F.length("text") == 0)
                ).alias("n_violations")
            ),
        ),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
