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


@register(
    "q_pipeline_pretrain",
    oracle=f"""
    WITH RECURSIVE
    q AS (
        SELECT doc_id, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_MIN_WORDS}),
    ex AS (SELECT md5(text) AS h, MIN(doc_id) AS keep_id
           FROM q GROUP BY md5(text)),
    kept AS (SELECT q.* FROM q JOIN ex ON q.doc_id = ex.keep_id),
    ktoks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
    sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(range(1, len(ws) - 1),
                      i -> array_to_string(ws[i : i + 2], ' '))) AS shingle
        FROM ktoks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
    e2 AS (SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, lab) AS (
        SELECT src, src FROM e2
        UNION
        SELECT b.dst, r.lab FROM reach r JOIN e2 b ON b.src = r.node),
    near_drop AS (
        SELECT node AS doc_id FROM reach GROUP BY node
        HAVING node <> MIN(lab)),
    surv AS (
        SELECT kept.* FROM kept
        WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)),
    atoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g5 AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(w) - 3),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                        || w[i+3] || ' ' || w[i+4])) AS gram
        FROM atoks),
    bench AS (SELECT DISTINCT gram FROM g5 WHERE doc_id % 43 = 0),
    contaminated AS (
        SELECT DISTINCT g5.doc_id FROM g5 JOIN bench USING (gram)
        WHERE g5.doc_id % 43 <> 0),
    final AS (
        SELECT surv.* FROM surv
        WHERE doc_id % 43 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens
    FROM final GROUP BY lang
    """,
    tags=("composite", "K1", "K2", "K4", "lakehouse"),
)
def q_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL pretraining-data pipeline in one query, every stage the
    proven standalone operator: quality filter (≥{_MIN_WORDS} words) →
    exact dedup (md5 content-hash survivor) → NEAR dedup (lossless
    prefix-filtered trigram-Jaccard pairs at 0.5 → connected
    components → min-id survivor per cluster) → benchmark
    decontamination (drop the doc_id%43 eval slice AND any doc sharing
    a 5-gram with it) → publish the surviving corpus as a lakehouse
    snapshot → read the SNAPSHOT back and account tokens per language.
    The oracle replays all five stages in one SQL statement (recursive
    CTE for the transitive closure), so a row lost or resurrected at
    ANY stage boundary — including the table write — fails the hash.
    This is the audit property a 100 TB corpus rebuild needs: the
    whole pipeline, not just each stage, is provably deterministic."""
    import shutil

    from ..ml.dedup import connected_components, jaccard_pairs_at
    from ..plans.lakehouse import snapshot_read, snapshot_write
    from ..sources.formats import scratch

    docs = t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    ).filter(F.col("n_words") >= _MIN_WORDS)
    ex = q.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    kept = q.join(ex, q.doc_id == ex.keep_id).select(q["*"])
    edges = jaccard_pairs_at(kept.select("doc_id", "text"), 0.5).select(
        "id_a", "id_b"
    )
    cc = connected_components(edges)
    near_drop = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    surv = kept.join(near_drop, "doc_id", "left_anti")
    # decontamination grams over the ORIGINAL corpus (benchmark slice
    # included), exactly as q_text_decontaminate — token array bound
    # as a column first (the inlined-split spelling re-split the text
    # per element_at: O(len²), the r7 headline regression)
    from ..ml.text import word_ngrams

    toks_df = docs.select("doc_id", F.split("text", " ").alias("w"))
    exploded = toks_df.select(
        "doc_id", F.explode(word_ngrams(5, distinct=True)).alias("gram")
    )
    is_bench = F.col("doc_id") % 43 == 0
    bench = exploded.filter(is_bench).select("gram").distinct()
    contaminated = (
        exploded.filter(~is_bench)
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )
    final = (
        surv.filter(F.col("doc_id") % 43 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_words")
    )
    path = scratch("pretrain_corpus", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    snapshot_write(final, path, "append")
    back = snapshot_read(spark, path)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_tokens"),
    )
