"""Distributed KMeans clustering over the embedding table — exact,
engine-portable Lloyd iterations (SURVEY.md §2-K extension).

Semantic clustering is the backbone of modern training-data curation
(SemDeDup-style near-duplicate pruning, diversity-balanced sampling,
domain discovery), and its kernel — assign every vector to its nearest
centroid, re-average, repeat — is the canonical "broadcast the small
side, shuffle on the group key" Spark workload. MLlib's KMeans is
seed-dependent and float-summed, so it can never be oracle-checked
exactly; this module instead runs Lloyd's algorithm in FIXED-POINT
INTEGER arithmetic with a deterministic init (the K lowest vec_ids),
which makes every iteration bit-reproducible in ANY engine:

- components quantized to 1e-6 ints ONCE (floor(x·1e6 + 0.5) — the
  same half-up rule as q_embed_centroids), then OFFSET to positives so
  integer division has one semantics everywhere (Spark's DIV truncates
  toward zero, DuckDB's // floors; they agree exactly on non-negative
  operands — the q_pareto_8020 hardening, commit 996f824);
- distances are Σ(q−c)² over bigints — commutative integer adds, so
  ANY summation order gives the identical result (the property float
  KMeans lacks and the reason it can't cross-check);
- centroid updates are half-up integer means (2·Σq + n) DIV (2·n);
- ties in the argmin break to the lowest cluster id.

Scale shape: the points side never moves — each iteration is one
broadcast of K·dim centroid cells onto the scan, a map-side distance
argmin, and ONE shuffle on (cid, pos) for the partial-aggregated
update (fixed-width rows, map-side combine). The Spark side evaluates
distances on the ARRAY form via zip_with/aggregate (no fan-out, stays
in whole-stage codegen); the oracle evaluates the same integers in
LONG form — integer exactness is what lets the two spellings differ
while the results cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t

_K = 4
_ITERS = 2
_OFFSET = 2_000_000  # shifts 1e-6-quantized components ≥ 0 (|x| < 1)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q array<bigint>): offset fixed-point components."""
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (
                F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast(
                    "bigint"
                )
                + F.lit(_OFFSET)
            ),
        ).alias("q"),
    )


def _dist(a, b):
    """Σ (aᵢ − bᵢ)² in exact bigint arithmetic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )


def _assign(points: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid, dist): nearest centroid per vector, ties to the
    lowest cid. K·dim centroid cells broadcast; argmin via min(struct)
    — no shuffle of the points side."""
    scored = points.join(F.broadcast(cents)).select(
        "vec_id", "cid", _dist("q", "c").alias("dist")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("best"))
        .select("vec_id", F.col("best.cid").alias("cid"),
                F.col("best.dist").alias("dist"))
    )


def _update(points: DataFrame, assign: DataFrame) -> DataFrame:
    """(cid, c array<bigint>): half-up integer mean per component. One
    shuffle on (cid, pos) with map-side partials, then a K-row
    re-assembly."""
    long = (
        assign.join(points, "vec_id")
        .select("cid", F.posexplode("q").alias("pos", "qv"))
        .groupBy("cid", "pos")
        .agg(
            F.expr(
                "CAST((2 * SUM(qv) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("cv")
        )
    )
    return (
        long.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("c")
        )
    )


def _kmeans_oracle() -> str:
    """Unrolled chained-CTE DuckDB oracle — the same integer dataflow
    in long form (cf. operators/graph.py's pagerank oracle)."""
    ctes = [
        f"""q AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000
                          + 0.5) AS BIGINT) + {_OFFSET} AS qv
        FROM embeddings)""",
        f"""init AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                   AS cid
        FROM (SELECT DISTINCT vec_id FROM embeddings
              ORDER BY vec_id LIMIT {_K}))""",
        "c0 AS (SELECT init.cid, q.pos, q.qv AS cv FROM init "
        "JOIN q USING (vec_id))",
    ]
    for k in range(_ITERS):
        ctes.append(
            f"""a{k + 1} AS (
        SELECT vec_id, cid, dist FROM (
            SELECT q.vec_id, c.cid,
                   SUM((q.qv - c.cv) * (q.qv - c.cv)) AS dist
            FROM q JOIN c{k} c ON q.pos = c.pos
            GROUP BY q.vec_id, c.cid)
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY dist, cid) = 1)"""
        )
        if k + 1 < _ITERS:
            ctes.append(
                f"""c{k + 1} AS (
        SELECT a.cid, q.pos,
               (2 * SUM(q.qv) + COUNT(*)) // (2 * COUNT(*)) AS cv
        FROM a{k + 1} a JOIN q USING (vec_id)
        GROUP BY a.cid, q.pos)"""
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(dist // 1000000) AS BIGINT) AS inertia_e6
    FROM a{_ITERS} GROUP BY cid ORDER BY cid"""
    )


@register(
    "q_cluster_kmeans",
    oracle=_kmeans_oracle(),
    tags=("K", "J1", "D1"),
)
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed KMeans (K=4, 2 Lloyd iterations, deterministic
    lowest-vec_id init) over the embedding table: per-cluster sizes and
    integer inertia after the final assignment. Inertia is reduced per
    point by DIV 1e6 BEFORE summing (truncation of non-negative ints —
    identical in both engines) so the corpus-level sum keeps ~100×
    headroom inside bigint at any realistic scale. Every quantity is
    integer-exact, so the Spark array spelling and the oracle's long
    form must agree bit-for-bit — the cross-engine check MLlib KMeans
    (seeded, float-summed) structurally cannot pass."""
    points = _quantized(spark, sf_dir)
    init = (
        points.orderBy("vec_id")
        .limit(_K)  # K-row frame: the single-partition window is free
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("bigint")
            .alias("cid"),
            F.col("q").alias("c"),
        )
    )
    cents = init
    assign = None
    for k in range(_ITERS):
        assign = _assign(points, cents)
        if k + 1 < _ITERS:
            cents = _update(points, assign)
    return (
        assign.groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum(F.expr("dist DIV 1000000")).cast("bigint")
            .alias("inertia_e6"),
        )
    )
