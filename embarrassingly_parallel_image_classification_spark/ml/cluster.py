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

- components quantized to 1e-6 ints ONCE (functions/vectors.py
  quantize_e6 — the shared half-up contract), then OFFSET to positives
  so integer division has one semantics everywhere (Spark's DIV
  truncates toward zero, DuckDB's // floors; they agree exactly on
  non-negative operands — the q_pareto_8020 hardening, commit 996f824);
- distances are Σ(q−c)² over bigints — commutative integer adds, so
  ANY summation order gives the identical result (the property float
  KMeans lacks and the reason it can't cross-check);
- centroid updates are half-up integer means (2·Σq + n) DIV (2·n);
- ties in the argmin break to the lowest cluster id; a cluster left
  empty by a round simply stops competing (both engines agree because
  the oracle's update CTE drops it the same way).

Scale shape — the MLlib KMeans dataflow, exactly: the K·dim centroid
table lives DRIVER-SIDE between rounds (K·dim integers — bytes, not
data), each assignment is a MAP-SIDE expression against literal
centroids (no join, no shuffle of the points side), and each update is
ONE (cid, pos) shuffle of fixed-width rows with map-side partials
followed by a bounded K·dim collect. Per full Lloyd iteration: one
shuffle + one bounded collect; the final report is one more map-side
assignment feeding a K-row aggregate. (An earlier draft kept centroids
as a DataFrame and paid a per-round groupBy(vec_id) argmin shuffle
plus a vec_id join — the review caught the docstring/plan mismatch;
this spelling is the one the docs always claimed.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import quantize_e6
from ..registry import register
from ..sources.tables import t

_K = 4
_ITERS = 2  # FULL Lloyd iterations (assign+update); one final assign more
_OFFSET = 2_000_000  # shifts 1e-6-quantized components ≥ 0 (|x| < 1)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q array<bigint>): offset fixed-point components."""
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: quantize_e6(x) + F.lit(_OFFSET)
        ).alias("q"),
    )


def _best(cents: list[tuple[int, list[int]]]) -> Column:
    """struct(dist, cid) of the nearest LITERAL centroid — a pure
    map-side expression (array_min over per-centroid structs; struct
    comparison is lexicographic, so ties break to the lowest cid)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            "q",
                            F.array(*[F.lit(v) for v in vec]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, d: acc + d,
                    ).alias("dist"),
                    F.lit(cid).cast("bigint").alias("cid"),
                )
                for cid, vec in cents
            ]
        )
    )


def _update(points: DataFrame, cents) -> list[tuple[int, list[int]]]:
    """One Lloyd update: map-side assignment, ONE (cid, pos) shuffle
    for the half-up integer means, then a BOUNDED K·dim collect (the
    centroid table is bytes — driver residency between rounds is the
    MLlib shape, and the documented exception to the no-collect rule).
    Clusters with no members drop out, matching the oracle's update
    CTE."""
    rows = (
        points.select(_best(cents).alias("b"), "q")
        .select(
            F.col("b.cid").alias("cid"), F.posexplode("q").alias("pos", "qv")
        )
        .groupBy("cid", "pos")
        .agg(
            F.expr(
                "CAST((2 * SUM(qv) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("cv")
        )
        .collect()  # bounded: ≤ K·dim rows
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cv"]
    return [
        (cid, [comp[p] for p in range(len(comp))])
        for cid, comp in sorted(by_cid.items())
    ]


def _kmeans_oracle() -> str:
    """Unrolled chained-CTE DuckDB oracle — the same integer dataflow
    in long form (cf. operators/graph.py's pagerank oracle): _ITERS
    full assign+update rounds, then the reported final assignment."""
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
    for k in range(_ITERS + 1):
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
        if k < _ITERS:
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
    FROM a{_ITERS + 1} GROUP BY cid ORDER BY cid"""
    )


@register(
    "q_cluster_kmeans",
    oracle=_kmeans_oracle(),
    tags=("K", "J1", "D1"),
)
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed KMeans (K=4, 2 FULL Lloyd iterations +
    reported final assignment, deterministic lowest-vec_id init) over
    the embedding table: per-cluster sizes and integer inertia.
    Inertia is reduced per point by DIV 1e6 BEFORE summing (truncation
    of non-negative ints — identical in both engines) so the
    corpus-level sum keeps ~100× headroom inside bigint at any
    realistic scale. Every quantity is integer-exact, so the Spark
    broadcast-literal spelling and the oracle's long form must agree
    bit-for-bit — the cross-engine check MLlib KMeans (seeded,
    float-summed) structurally cannot pass. Plan per iteration: zero
    joins — one map-side argmin expression + one (cid, pos) shuffle;
    the driver holds only K·dim integers between rounds."""
    points = _quantized(spark, sf_dir)
    # bounded K-row collect: the deterministic init (lowest vec_ids)
    init_rows = points.orderBy("vec_id").limit(_K).collect()
    cents = [(cid, list(r["q"])) for cid, r in enumerate(init_rows)]
    for _ in range(_ITERS):
        cents = _update(points, cents)
    return (
        points.select(_best(cents).alias("b"))
        .groupBy(F.col("b.cid").alias("cid"))
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum(F.expr("b.dist DIV 1000000")).cast("bigint")
            .alias("inertia_e6"),
        )
    )
