"""K5: multimodal columns — image/audio/video as opaque binary + typed
metadata + embeddings, in ordinary DataFrames (SURVEY.md §2-K).

The reference's unit of work is an image file [PK]; here a media row is

    (media_id, payload: binary, meta: struct<width,height,format>,
     embedding: array<float>)

and every relational operator accepts it opaquely — binary columns
shuffle, join and write like any other column.

Decode/feature-extraction runs as ``mapInPandas`` (Arrow batches, one
Python worker init per task — the J6 shape). The actual image decode is
STUBBED (no imaging libs in this container): ``decode_stub`` derives
deterministic pseudo-pixels from the payload bytes, so the Spark-side
plumbing — schema, batch iteration, partitioning — is fully real and
testable, and swapping in PIL/libvips later changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources.tables import t

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("feat_hash", LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from the documents fixture: payload =
    utf8 bytes of text (a stand-in for PNG bytes), meta derived
    deterministically. At 100 TB this is `spark.read.format('binaryFile')`
    over an object store plus a manifest join — same schema."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").cast(BinaryType()).alias("payload"),
        F.struct(
            (F.pmod(F.col("n_chars"), F.lit(640)) + 64).cast("int").alias("width"),
            (F.pmod(F.col("n_chars"), F.lit(480)) + 48).cast("int").alias("height"),
            F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("format"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: payload bytes as a uint8 'pixel' array.
    Replace with a real decoder (PIL.Image.open → np.asarray) when
    imaging libs are available; the contract (bytes → ndarray) holds."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media rows (Arrow-batched).

    One batch = thousands of rows; the decode loop is per-row (as a real
    image decode must be) but stats are vectorized. Output is a narrow
    feature frame — the wide payload column never crosses back to JVM.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"], strict=True
            ):
                px = decode_stub(payload)
                feats.append(
                    (
                        int(mid),
                        meta["format"],
                        int(px.size),
                        float(px.mean()) if px.size else 0.0,
                        int(np.int64(px[:64].sum()) if px.size else 0),
                    )
                )
            yield pd.DataFrame(
                feats, columns=["media_id", "format", "n_bytes", "mean_byte", "feat_hash"]
            )

    return df.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


@register(
    "q_multimodal",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           COUNT(*) AS n_media,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    """,
    tags=("K5",),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media rows grouped by format with payload byte totals — binary
    columns flowing through scan → struct access → aggregate. The
    oracle recomputes the same facts from the source table, proving the
    binary round-trip is lossless."""
    m = media_table(spark, sf_dir)
    return m.groupBy(F.col("meta.format").alias("format")).agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
    )


@register("q_multimodal_features", oracle=None, tags=("K5", "J6", "rows-only"))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub + feature extraction via mapInPandas (rows-only; the
    features are asserted against a local NumPy loop in tests)."""
    return extract_features(media_table(spark, sf_dir))
