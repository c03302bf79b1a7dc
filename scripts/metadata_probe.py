"""Metadata-commit cost probe: rename_column / add_column_default must
be O(1) in TABLE SIZE (they rewrite one JSON manifest, zero data
files), while the write they piggyback on is O(rows). Times each op on
a small (sf0.01 orders ~15k rows) and a large (sf0.1 lineitem ~600k
rows, multi-file) snapshot table."""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.plans import lakehouse

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("metadata_probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

CASES = [
    ("sf0.01/orders", "/root/testdata/sf0.01/orders.parquet", 1),
    ("sf0.1/lineitem", "/root/testdata/sf0.1/lineitem.parquet", 16),
]
for label, src, nparts in CASES:
    path = f"/tmp/meta_probe_{label.replace('/', '_')}"
    shutil.rmtree(path, ignore_errors=True)
    df = spark.read.parquet(src)
    key = df.columns[0]
    t0 = time.time()
    lakehouse.snapshot_write(df.repartition(nparts), path, "append")
    t_write = time.time() - t0
    t0 = time.time()
    lakehouse.rename_column(path, key, "renamed_key")
    t_rename = time.time() - t0
    # rename x default composition is guarded, so the default-add is
    # probed on a zero-copy clone (itself a metadata-only commit)
    clone = path + "_clone"
    shutil.rmtree(clone, ignore_errors=True)
    t0 = time.time()
    lakehouse.snapshot_clone(path, clone, version=1)
    t_clone = time.time() - t0
    t0 = time.time()
    lakehouse.add_column_default(clone, "channel", "string", "legacy")
    t_add = time.time() - t0
    n = lakehouse.snapshot_read(spark, path).count()
    print(
        f"{label}: rows={n} files={nparts} "
        f"write={t_write:.2f}s rename={t_rename*1000:.1f}ms "
        f"clone={t_clone*1000:.1f}ms add_column={t_add*1000:.1f}ms"
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(clone, ignore_errors=True)
