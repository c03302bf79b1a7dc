"""Snapshot-isolated table layer over plain parquet (SURVEY.md §7:
Delta/Iceberg/Hudi jars are environment-blocked — this module is the
honest in-sandbox implementation of the capability they provide, built
on nothing but parquet files + versioned JSON manifests, the same
primitive those formats use).

Semantics implemented (the lakehouse core):
  * append     — new snapshot = previous files + new files;
  * overwrite  — new snapshot = new files only (logical replace;
                 old files stay on disk for time travel);
  * time travel— read AS OF any snapshot version;
  * snapshot isolation — readers resolve a manifest once and see an
                 immutable file list; a concurrent writer publishes a
                 NEW manifest version, never mutating a published one;
  * vacuum     — delete files unreachable from any retained snapshot.

At 100 TB the mechanics are identical (manifests hold file-level
stats for pruning; commit is one atomic manifest rename) — what the
real formats add is concurrent-writer conflict detection and
file-level statistics, both documented here as the upgrade path.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"_manifest_v{version}.json")


def current_version(path: str) -> int:
    """Highest published snapshot version (0 = no table)."""
    if not os.path.isdir(path):
        return 0
    versions = [
        int(name[len("_manifest_v"):-len(".json")])
        for name in os.listdir(path)
        if name.startswith("_manifest_v") and name.endswith(".json")
    ]
    return max(versions, default=0)


def snapshot_write(df: DataFrame, path: str, mode: str = "append") -> int:
    """Publish a new snapshot of ``df`` at ``path``; returns the new
    version number. Task files are written first (invisible to any
    reader), then one manifest JSON makes them visible atomically —
    write-audit-publish, the commit protocol every table format uses."""
    assert mode in ("append", "overwrite")
    os.makedirs(path, exist_ok=True)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    new_files = []
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            final = f"data-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staging, name), os.path.join(path, final))
            new_files.append(final)
    shutil.rmtree(staging, ignore_errors=True)
    prev = current_version(path)
    visible = list(new_files)
    if mode == "append" and prev > 0:
        with open(_manifest_path(path, prev)) as f:
            visible = json.load(f)["files"] + visible
    version = prev + 1
    tmp = _manifest_path(path, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "mode": mode, "files": sorted(visible)}, f)
    os.rename(tmp, _manifest_path(path, version))  # atomic publish
    return version


def snapshot_read(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read the table AS OF ``version`` (latest when None). The file
    list is resolved from one immutable manifest — a writer publishing
    v+1 concurrently cannot change what this reader sees."""
    v = version if version is not None else current_version(path)
    with open(_manifest_path(path, v)) as f:
        files = json.load(f)["files"]
    if not files:
        return spark.createDataFrame([], "o_orderkey bigint")
    return spark.read.parquet(*[os.path.join(path, name) for name in files])


def vacuum(path: str, retain_versions: int = 2) -> list[str]:
    """Delete data files unreachable from the ``retain_versions`` most
    recent snapshots, and the expired manifests; returns removed
    files. The real-format analog (VACUUM / expire_snapshots) — time
    travel older than the retention horizon stops working, by design."""
    latest = current_version(path)
    keep_versions = [v for v in range(latest - retain_versions + 1, latest + 1) if v >= 1]
    reachable: set[str] = set()
    for v in keep_versions:
        with open(_manifest_path(path, v)) as f:
            reachable.update(json.load(f)["files"])
    removed = []
    for name in sorted(os.listdir(path)):
        if name.startswith("data-") and name.endswith(".parquet") and name not in reachable:
            os.remove(os.path.join(path, name))
            removed.append(name)
        if name.startswith("_manifest_v"):
            v = int(name[len("_manifest_v"):-len(".json")])
            if v not in keep_versions:
                os.remove(os.path.join(path, name))
    return removed


@register(
    "q_lake_snapshots",
    oracle="""
    WITH half AS (SELECT COUNT(*) AS n,
                         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                              AS BIGINT) AS cents
                  FROM orders WHERE o_orderkey % 2 = 0),
         full_t AS (SELECT COUNT(*) AS n,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                                AS BIGINT) AS cents
                    FROM orders)
    SELECT 1 AS version, half.n AS n, half.cents AS cents FROM half
    UNION ALL
    SELECT 2 AS version, full_t.n AS n, full_t.cents AS cents FROM full_t
    ORDER BY version
    """,
    tags=("A6", "scale", "lakehouse"),
)
def q_lake_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot append + time travel: write the even-key half of orders
    as snapshot v1, append the odd-key half as v2, then read BOTH
    versions back — v1 must aggregate to exactly the first half (time
    travel) and v2 to the full table (append visibility). The oracle
    recomputes both halves from the source, so a file leaking across
    snapshots (isolation bug) or a dropped/duplicated file (manifest
    bug) fails the hash."""
    from ..sources.formats import scratch

    path = scratch("lake_orders", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    snapshot_write(orders.filter(F.col("o_orderkey") % 2 == 0), path, "append")
    snapshot_write(orders.filter(F.col("o_orderkey") % 2 == 1), path, "append")
    frames = []
    for v in (1, 2):
        frames.append(
            snapshot_read(spark, path, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count("*").alias("n"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
        )
    return frames[0].unionByName(frames[1]).orderBy("version")


@register(
    "q_lake_overwrite_travel",
    oracle="""
    WITH urgent AS (SELECT COUNT(*) AS n FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
         all_t AS (SELECT COUNT(*) AS n FROM orders)
    SELECT 1 AS version, all_t.n AS n FROM all_t
    UNION ALL
    SELECT 2 AS version, urgent.n AS n FROM urgent
    ORDER BY version
    """,
    tags=("A6", "lakehouse"),
)
def q_lake_overwrite_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overwrite + time travel: v1 = all orders, v2 = OVERWRITE with
    only the urgent subset. Reading v2 sees just the replacement;
    reading v1 still sees the full pre-overwrite table (the logical
    replace keeps old files on disk until vacuum). This is the
    capability gap the blocked Delta/Iceberg jars would fill —
    demonstrated with nothing but parquet + manifests."""
    from ..sources.formats import scratch

    path = scratch("lake_overwrite", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    snapshot_write(orders, path, "append")
    snapshot_write(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"), path, "overwrite"
    )
    frames = []
    for v in (1, 2):
        frames.append(
            snapshot_read(spark, path, v).agg(
                F.lit(v).cast("int").alias("version"), F.count("*").alias("n")
            )
        )
    return frames[0].unionByName(frames[1]).orderBy("version")
