"""Distributed model TRAINING (SURVEY.md §2-Q5, round 8): full-batch
gradient descent on a linear model, exact fixed-point arithmetic end
to end — the complement of ml/inference.py (which serves models) and
ml/cluster.py (which trains KMeans the same way: broadcast-literal
parameters, one distributed aggregate per iteration, driver holds
only the parameter vector).

Why exact integers for a TRAINER: float GD is order-dependent (the
partial-sum tree changes with partitioning, so two runs of the same
job on different cluster sizes produce different weights — the
classic irreproducible-training bug). Holding weights in e6 fixed
point and gradients in BIGINT makes every iteration a pure function
of the data: bit-identical on 1 executor or 1000, and therefore
oracle-checkable in DuckDB by unrolling the iterations as chained
CTEs (the q_cluster_kmeans / q_graph_pagerank pattern).

Scale shape per iteration: ONE map-side-combined aggregate over the
fact table producing d+2 BIGINT sums (d = feature count) — no
shuffle of rows, no Python in the hot path, gradient traffic is
O(d) per partition exactly like MLlib's treeAggregate [PK]. The
driver's only state is the d-vector of weights; T iterations = T
scans (production caches the feature frame once).

Integer-division discipline: Spark ``DIV``, DuckDB ``//`` and the
``_tdiv`` helper below all truncate toward zero, so negative
gradients divide identically in all three places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t

# Shared hyperparameters — module-level so the Spark loop, the oracle
# generator, and the pytest self-checks read ONE definition.
GD_ITERS = 6
GD_LR_DEN = 4  # learning rate = 1/4, below 2/λmax for these features


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — the Spark DIV /
    DuckDB ``//`` semantics (Python's ``//`` floors, which differs on
    negative dividends)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# Feature/target spelling shared (as SQL text) by the Spark query and
# the oracle: x1 = priority rank centered at 0 (the leading digit of
# o_orderpriority, 1..5 → -2..2), x2 = order year centered at 1998
# (fixture range 1995..2001 → -3..3), y = total price in cents DIV
# 1000. Centering keeps the off-diagonal Gram terms small so the
# plain (non-preconditioned) GD step is stable.
_PTS_SQL = """
        SELECT CAST(CAST(substring(o_orderpriority, 1, 1) AS BIGINT) - 3
                    AS BIGINT) AS x1,
               CAST(year(o_orderdate) - 1998 AS BIGINT) AS x2,
               CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DIV 1000
                    AS BIGINT) AS y
        FROM orders
"""


def _linreg_oracle() -> str:
    """The full training loop as one chained-CTE DuckDB query: each
    iteration k computes the gradient sums under the previous
    weights (a CROSS JOIN against the 1-row weight state), then the
    truncated-division update — the same exact integer sequence the
    Spark driver loop produces."""
    ctes = [
        f"pts AS ({_PTS_SQL.replace('DIV', '//')})",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,"
        " CAST(0 AS BIGINT) AS w2)",
    ]
    rows = []
    for k in range(1, GD_ITERS + 1):
        ctes.append(
            f"""g{k} AS (
        SELECT w.w0, w.w1, w.w2,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w.w0 + p.x1 * w.w1 + p.x2 * w.w2 - p.y * 1000000)
                    AS BIGINT) AS s0,
               CAST(SUM(p.x1 * (w.w0 + p.x1 * w.w1 + p.x2 * w.w2
                                - p.y * 1000000)) AS BIGINT) AS s1,
               CAST(SUM(p.x2 * (w.w0 + p.x1 * w.w1 + p.x2 * w.w2
                                - p.y * 1000000)) AS BIGINT) AS s2,
               CAST(SUM(abs(w.w0 + p.x1 * w.w1 + p.x2 * w.w2
                            - p.y * 1000000)) AS BIGINT) AS sa
        FROM pts p CROSS JOIN w{k - 1} w
        GROUP BY w.w0, w.w1, w.w2)"""
        )
        ctes.append(
            f"""w{k} AS (
        SELECT CAST(w0 - (s0 // n) // {GD_LR_DEN} AS BIGINT) AS w0,
               CAST(w1 - (s1 // n) // {GD_LR_DEN} AS BIGINT) AS w1,
               CAST(w2 - (s2 // n) // {GD_LR_DEN} AS BIGINT) AS w2,
               CAST(sa // n AS BIGINT) AS mae_e6
        FROM g{k})"""
        )
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS iter, w0 AS w0_e6,"
            f" w1 AS w1_e6, w2 AS w2_e6, mae_e6 FROM w{k}"
        )
    # final row: MAE under the FINAL weights (no update) — the
    # trained model's residual, what a validation pass would report
    ctes.append(
        f"""gfin AS (
        SELECT w.w0, w.w1, w.w2,
               CAST(SUM(abs(w.w0 + p.x1 * w.w1 + p.x2 * w.w2
                            - p.y * 1000000)) // COUNT(*) AS BIGINT)
                   AS mae_e6
        FROM pts p CROSS JOIN w{GD_ITERS} w
        GROUP BY w.w0, w.w1, w.w2)"""
    )
    rows.append(
        f"SELECT CAST({GD_ITERS + 1} AS BIGINT) AS iter, w0 AS w0_e6,"
        " w1 AS w1_e6, w2 AS w2_e6, mae_e6 FROM gfin"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


@register("q_train_linreg_gd", oracle=_linreg_oracle, tags=("Q5", "J1"))
def q_train_linreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED LINEAR-MODEL TRAINING — full-batch gradient descent
    on ŷ = w0 + w1·x1 + w2·x2 (priority rank, order year → total
    price), weights in e6 fixed point, every iteration exact BIGINT:
    grad_j = Σ xj·resid, w_j ← w_j − tdiv(tdiv(grad_j, n), 4). The
    result is the TRAINING LOG — per iteration the entry MAE (the
    residual the gradient saw) and the post-update weights, plus a
    final validation row (iter = T+1) scoring the trained weights —
    the convergence curve a practitioner actually monitors; MAE
    decreases monotonically (pinned in pytest). Bit-identical on any
    partitioning because integer sums are order-free — the
    reproducible-training property float GD lacks — and therefore
    exactly reproducible by the unrolled-CTE DuckDB oracle.

    Plan per iteration: one map-side-combined aggregate to FIVE BIGINT
    scalars (treeAggregate shape [PK]); rows never shuffle, Python
    never touches them, driver state = 3 ints. The feature select is
    re-derived per scan at fixture scale; production localCheckpoints
    `pts` once (T scans of one cached column trio). BIGINT headroom:
    |resid| ≤ 5e10 e6-units × 1.5e7 rows (sf10) ≈ 2e18 < 2⁶³; past
    that the sums move to DECIMAL(38,0) exactly like q_dedup_semantic's
    128-bit cosine arithmetic."""
    pts = t(spark, sf_dir, "orders").selectExpr(
        "CAST(CAST(substring(o_orderpriority, 1, 1) AS BIGINT) - 3"
        " AS BIGINT) AS x1",
        "CAST(year(o_orderdate) - 1998 AS BIGINT) AS x2",
        "CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DIV 1000"
        " AS BIGINT) AS y",
    )
    w = [0, 0, 0]
    log_rows = []
    for k in range(1, GD_ITERS + 1):
        resid = F.lit(w[0]) + F.col("x1") * w[1] + F.col("x2") * w[2] - (
            F.col("y") * F.lit(1_000_000)
        )
        s = pts.agg(
            F.count("*").alias("n"),
            F.sum(resid).alias("s0"),
            F.sum(F.col("x1") * resid).alias("s1"),
            F.sum(F.col("x2") * resid).alias("s2"),
            F.sum(F.abs(resid)).alias("sa"),
        ).collect()[0]
        mae = _tdiv(int(s["sa"]), int(s["n"]))
        w = [
            w[j] - _tdiv(_tdiv(int(s[f"s{j}"]), int(s["n"])), GD_LR_DEN)
            for j in range(3)
        ]
        log_rows.append((k, w[0], w[1], w[2], mae))
    resid = F.lit(w[0]) + F.col("x1") * w[1] + F.col("x2") * w[2] - (
        F.col("y") * F.lit(1_000_000)
    )
    fin = pts.agg(
        F.count("*").alias("n"), F.sum(F.abs(resid)).alias("sa")
    ).collect()[0]
    log_rows.append(
        (GD_ITERS + 1, w[0], w[1], w[2], _tdiv(int(fin["sa"]), int(fin["n"])))
    )
    return spark.createDataFrame(
        log_rows, "iter BIGINT, w0_e6 BIGINT, w1_e6 BIGINT, w2_e6 BIGINT,"
        " mae_e6 BIGINT"
    )
