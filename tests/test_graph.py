"""Unit tests for the iterative operators (connected components) and
the custom Python DataSource — properties the SQL oracle can't pin."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE

from embarrassingly_parallel_image_classification_spark.ml.dedup import (
    connected_components,
)
from embarrassingly_parallel_image_classification_spark.sources.custom import (
    synthetic_table,
)


def test_connected_components_known_graph(spark):
    """Path, triangle, and pair components all collapse to their min id
    — including transitive closure over a 3-hop path."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_custom_source_plans_requested_partitions(spark):
    """The DataSource's partition planning drives parallelism: 8
    requested InputPartitions -> 8 scan partitions, and the union of
    partition ranges is exactly [0, n)."""
    df = synthetic_table(spark, n=1000, parts=8)
    assert df.rdd.getNumPartitions() == 8
    ids = sorted(r["id"] for r in df.select("id").collect())
    assert ids == list(range(1000))


def test_sssp_unrolled_plan_is_linear_in_rounds(spark):
    """The Bellman-Ford unrolled CTE must reference each round's frame
    exactly once (the zero-weight self-loop spelling): Spark inlines
    every CTE reference, so a two-reference round would expand the
    plan 2^rounds-fold (measured: 510 duplicate checkpoint scans and
    ~9 s for a 25-node graph before the fix). Linear plan ⇔ the number
    of checkpoint scans stays ≈ rounds, far under the doubling
    threshold."""
    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.operators.graph import (
        _SSSP_ROUNDS,
    )
    from tests.conftest import SF_T2

    df = registry.queries()["q_graph_shortest_path"](spark, SF_T2)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_scans = plan.count("Scan ExistingRDD")
    assert n_scans <= 2 * _SSSP_ROUNDS + 2, (
        f"{n_scans} checkpoint scans — the unrolled SSSP plan is no "
        f"longer linear in the round count (CTE re-inlining regression)"
    )


def test_pushdown_source_prunes_planned_partitions(spark):
    """The pushFilters contract end to end: an id-range predicate on
    the pushdown source must shrink the PLANNED partition count (only
    partitions intersecting the narrowed interval are generated), and
    unsupported predicates must still be applied by Spark post-scan."""
    from embarrassingly_parallel_image_classification_spark.sources.custom import (
        pushdown_table,
    )
    from pyspark.sql import functions as F

    full = pushdown_table(spark, n=10_000, parts=8)
    assert full.rdd.getNumPartitions() == 8
    pruned = pushdown_table(spark, n=10_000, parts=8).filter(F.col("id") >= 7500)
    # 1250-wide partitions: [7500, 8750) and [8750, 10000) remain
    assert pruned.rdd.getNumPartitions() == 2
    assert pruned.count() == 2500
    # mixed predicate: range consumed by the source, bucket evaluated
    # by Spark — values must still be exact
    mixed = (
        pushdown_table(spark, n=10_000, parts=8)
        .filter((F.col("id") >= 9000) & (F.col("bucket") == 3))
        .count()
    )
    assert mixed == 100


def test_label_prop_isolated_node_and_mode_tiebreak(spark):
    """Pin the LPA contract paths the trade fixture may never hit: an
    ISOLATED node keeps its own label through every round (the LEFT
    JOIN fallback), and a node whose neighbor labels tie takes the
    SMALLEST (the deterministic Raghavan variant)."""
    from embarrassingly_parallel_image_classification_spark.operators.graph import (
        _lpa_ctes,
        _LPA_ITERS,
    )
    from pyspark.sql import functions as F

    # path graph 0-1-2 plus isolated node 9 (edges already undirected)
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src int, dst int"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,), (9,)], "node int")
    sql = (
        "WITH "
        + ",\n".join(_lpa_ctes("{edges}", "{nodes}"))
        + f" SELECT node, label FROM l{_LPA_ITERS}"
    )
    got = {
        r["node"]: r["label"] for r in spark.sql(sql, edges=edges, nodes=nodes).collect()
    }
    assert got[9] == 9, "isolated node must keep its own label"
    # round 1: node 1 sees labels {0, 2} — a tie — and must take 0;
    # nodes 0 and 2 see only {1}. After 3 synchronous rounds the path
    # converges to the parity oscillation fixed point of min-tiebreak
    # LPA: recompute it here independently as the reference.
    labels = {0: 0, 1: 1, 2: 2, 9: 9}
    nbrs = {0: [1], 1: [0, 2], 2: [1], 9: []}
    for _ in range(_LPA_ITERS):
        labels = {
            n: (
                min(
                    (labels[m] for m in nbrs[n]),
                    key=lambda l: (-[labels[m] for m in nbrs[n]].count(l), l),
                )
                if nbrs[n]
                else labels[n]
            )
            for n in labels
        }
    assert got == labels, f"spark {got} != reference {labels}"


def test_assortativity_matches_brute_force(spark):
    """Degrees and the integer Pearson replayed in pure Python over
    the same undirected nation edge census; float sanity via the
    direct correlation of the directed endpoint-degree pairs."""
    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.operators.graph import (
        _EDGES_SQL,
    )

    got = (
        registry.queries()["q_graph_assortativity"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    con = duckdb.connect()
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        con.execute(
            f"CREATE VIEW {tbl} AS"
            f" SELECT * FROM read_parquet('{SF_SMOKE}/{tbl}.parquet')"
        )
    edges = con.execute(
        f"WITH base AS ({_EDGES_SQL}) "
        "SELECT DISTINCT LEAST(src,dst), GREATEST(src,dst) "
        "FROM base WHERE src <> dst"
    ).fetchall()
    from collections import defaultdict

    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    pairs = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    m2 = len(pairs)
    sjk = sum(j * k for j, k in pairs)
    sj = sum(j for j, _ in pairs)
    sj2 = sum(j * j for j, _ in pairs)
    num = m2 * sjk - sj * sj
    den = max(m2 * sj2 - sj * sj, 1)
    r_e6 = (-1 if num < 0 else 1) * ((abs(num) * 1_000_000) // den)
    assert int(got.n_edges) == len(edges)
    assert int(got.r_num) == num
    assert int(got.r_den) == den
    assert int(got.r_e6) == r_e6
    assert bool(got.assortative) == (num > 0)
    # float sanity: direct Pearson over the directed pairs
    mj = sj / m2
    cov = sjk / m2 - mj * mj
    var = sj2 / m2 - mj * mj
    if var > 0:
        r = cov / var
        assert abs(r - r_e6 / 1e6) < 0.001


def test_kcore_matches_brute_force(spark):
    """Top-m sparsification + peeling replayed to a TRUE fixed point
    in pure Python (no round cap): asserts the 4-round unroll had
    converged (the certificate column), that the core matches the
    fixed point exactly, and that both branches (peeled nodes AND
    survivors) are exercised on this fixture."""
    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.operators.graph import (
        _KCORE_K,
        _KCORE_TOPM,
    )

    got = (
        registry.queries()["q_graph_kcore"](spark, SF_SMOKE)
        .toPandas()
        .set_index("node")
    )
    con = duckdb.connect()
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        con.execute(
            f"CREATE VIEW {tbl} AS"
            f" SELECT * FROM read_parquet('{SF_SMOKE}/{tbl}.parquet')"
        )
    pairs = con.execute(
        """
        SELECT c.c_nationkey, s.s_nationkey, COUNT(*)
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    from collections import defaultdict

    by_src = defaultdict(list)
    for a, b, c in pairs:
        by_src[a].append((-c, b))
    edges = set()
    for a, lst in by_src.items():
        for _, b in sorted(lst)[:_KCORE_TOPM]:
            edges.add((min(a, b), max(a, b)))
    alive = {n for e in edges for n in e}
    all_nodes = set(alive)
    removed_round = {}
    r = 0
    while True:
        deg = defaultdict(int)
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        new = {n for n in alive if deg[n] >= _KCORE_K}
        r += 1
        if new == alive:
            break
        for n in alive - new:
            removed_round[n] = r
        alive = new
    assert bool(got.converged.iloc[0])  # 4 rounds reached fixed point
    assert 0 < len(alive) < len(all_nodes)  # both branches exercised
    final_deg = defaultdict(int)
    for a, b in edges:
        if a in alive and b in alive:
            final_deg[a] += 1
            final_deg[b] += 1
    for n in all_nodes:
        assert bool(got.loc[n, "in_core"]) == (n in alive)
        assert int(got.loc[n, "removed_round"]) == removed_round.get(n, 0)
        assert int(got.loc[n, "core_degree"]) == (
            final_deg[n] if n in alive else 0
        )


def test_reciprocity_matches_brute_force(spark):
    """Directed census + reverse probe replayed in Python; pins the
    evenness of m_recip (mutuality is symmetric)."""
    from embarrassingly_parallel_image_classification_spark import registry
    from embarrassingly_parallel_image_classification_spark.operators.graph import (
        _EDGES_SQL,
    )

    got = (
        registry.queries()["q_graph_reciprocity"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    con = duckdb.connect()
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        con.execute(
            f"CREATE VIEW {tbl} AS"
            f" SELECT * FROM read_parquet('{SF_SMOKE}/{tbl}.parquet')"
        )
    edges = {
        (a, b)
        for a, b in con.execute(
            f"WITH base AS ({_EDGES_SQL})"
            " SELECT src, dst FROM base WHERE src <> dst"
        ).fetchall()
    }
    m_dir = len(edges)
    m_recip = sum(1 for a, b in edges if (b, a) in edges)
    assert m_recip % 2 == 0
    assert int(got.m_dir) == m_dir
    assert int(got.m_recip) == m_recip
    assert int(got.reciprocity_e6) == (m_recip * 1_000_000) // m_dir
    assert int(got.n_mutual_pairs) == m_recip // 2
