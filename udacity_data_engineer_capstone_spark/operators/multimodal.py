"""Multimodal (binary) column plumbing (north-star extension).

Media (image/audio/video) is modeled the way a 100 TB training-data lake
stores it: an opaque ``binary`` payload column plus a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` UDFs. The decode step
itself is STUBBED — the image/audio libraries are not in this container —
behind :func:`decode_stub`, which produces a deterministic fake feature
row; everything Spark-side (schema, batching, partitioning, UDF
signatures) is real and tested.

The testdata has no binary column, so payloads are derived from
``documents.text`` (UTF-8 bytes). That keeps the oracle honest: byte
length and md5 of the payload are checkable in DuckDB against the text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media binary, meta struct). The real-world
    twin reads payload bytes from object storage / parquet binary."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode' standing in for an image/audio decoder.

    A real deployment would replace this with e.g. PIL / torchaudio frame
    extraction (kept out of this container). NotImplemented path included
    so callers see exactly where the real decoder plugs in.
    """
    if payload is None:
        raise NotImplementedError(
            "real media decode not available in this environment"
        )
    # 4 cheap deterministic byte-level features: length, mean byte, min, max
    n = len(payload)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [float(n), sum(payload) / n, float(min(payload)), float(max(payload))]


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode + featurize over the binary column.

    ``mapInPandas`` streams record batches through one Python worker per
    partition — the 100 TB-safe shape for per-item Python work (no
    per-row serialization, no driver involvement)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["media"]],
                    "checksum": [
                        hashlib.md5(bytes(b)).hexdigest() for b in pdf["media"]
                    ],
                    "feature": [decode_stub(bytes(b)) for b in pdf["media"]],
                }
            )
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       format, source
FROM (SELECT doc_id, text, 'text/plain' AS format, source FROM documents)
"""


@query("mm_binary_meta", oracle=_META_ORACLE, tags=("multimodal",))
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata, verified natively (octet length
    and md5 of the payload bytes computed JVM-side, no Python)."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.md5("media").alias("checksum"),
        F.col("meta.format").alias("format"),
        F.col("meta.source").alias("source"),
    )


_FEAT_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


@query("mm_decode_features", oracle=_FEAT_ORACLE, tags=("multimodal", "udf"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode + feature extraction (stubbed decoder). The
    oracle checks the Python-side byte length and checksum agree with
    DuckDB's view of the same payload; the fake feature vector itself is
    covered by tests/test_multimodal.py."""
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select("doc_id", "n_bytes", "checksum")
