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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_data_engineer_capstone_spark.catalog import load_table, load_table_scaled
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
    docs = load_table_scaled(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


N_FEATURE_BINS = 16


def decode_features(payload: bytes) -> list[float]:
    """Real (pure-Python) decode: a 16-bin histogram over the bytes'
    high nibbles — a genuine, deterministic content feature computed
    end-to-end (and exactly re-computable in SQL, so the feature vector
    itself is oracle-verified, not just plumbing metadata).

    An image/audio deployment swaps this body for PIL / torchaudio
    decoding (those libraries are not in this container); the
    ``mapInPandas`` shape around it is unchanged.
    """
    if payload is None:
        raise NotImplementedError(
            "real media decode not available for NULL payloads"
        )
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=N_FEATURE_BINS
    )
    return [float(c) for c in counts]


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
                    "feature": [decode_features(bytes(b)) for b in pdf["media"]],
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


# the oracle recomputes the high-nibble histogram from the hex encoding:
# chars at odd positions of hex(bytes) are the high nibbles; count of
# digit d = len(hi) - len(replace(hi, d, '')).
_FEAT_ORACLE = """
WITH h AS (
  SELECT doc_id, text,
         regexp_replace(hex(encode(text)), '(.)(.)', '\\1', 'g') AS hi
  FROM documents
)
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       list_transform(range(0, 16), b ->
         CAST(length(hi)
              - length(replace(hi, substring('0123456789ABCDEF',
                                             CAST(b AS INT) + 1, 1), ''))
              AS DOUBLE)) AS feature
FROM h
"""


@query("mm_decode_features", oracle=_FEAT_ORACLE, tags=("multimodal", "udf"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode + feature extraction. The oracle verifies the
    whole feature row — byte length, md5 checksum, AND the 16-bin
    high-nibble histogram — against DuckDB's independent computation
    over the same payload bytes."""
    return extract_features(media_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# frame sampling
# ---------------------------------------------------------------------------

FRAME_BYTES = 16
FRAME_STRIDE = 64

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

# payloads are ASCII here, so byte offsets == character offsets and the
# oracle can recompute each frame's md5 with substr over the text
_FRAME_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0,
           CAST(floor((octet_length(encode(text)) - {FRAME_BYTES})
                      / {FRAME_STRIDE}) AS INT) + 1)) AS frame_idx
  FROM documents
  WHERE octet_length(encode(text)) >= {FRAME_BYTES}
)
SELECT doc_id, frame_idx,
       md5(substr(text, CAST(frame_idx * {FRAME_STRIDE} + 1 AS INT),
                  {FRAME_BYTES})) AS frame_md5
FROM f
"""


@query("mm_frame_sample", oracle=_FRAME_ORACLE, tags=("multimodal", "udf"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over a binary media column: every
    ``FRAME_STRIDE`` bytes, take a ``FRAME_BYTES`` window (a video
    pipeline samples every k-th frame the same way; an audio one takes
    fixed windows). One input row fans out to a variable number of frame
    rows inside the Arrow batch — the ``mapInPandas`` shape that a real
    decoder (av / torchaudio) drops into unchanged. The per-frame md5 is
    verified by the oracle, so the slicing itself is proven correct."""
    import hashlib

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                n = (len(b) - FRAME_BYTES) // FRAME_STRIDE
                if len(b) < FRAME_BYTES:
                    continue
                for i in range(n + 1):
                    chunk = b[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": sums}
            )

    return media_table(spark, sf_dir).mapInPandas(frames, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# 2-D tiling (image patch extraction shape)
# ---------------------------------------------------------------------------

IMG_WIDTH = 32  # bytes per synthetic scanline
TILE = 8  # 8x8 tiles

TILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("tile_md5", T.StringType(), True),
        T.StructField("byte_sum", T.LongType(), True),
    ]
)

# payloads are ASCII (byte offset == char offset), so the oracle
# reassembles each 8x8 tile as 8 substr slices and re-hashes it
_TILE_ROWS = " || ".join(
    f"substr(text, (ty * {TILE} + {r}) * {IMG_WIDTH} + tx * {TILE} + 1, {TILE})"
    for r in range(TILE)
)
_TILE_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, text,
         CAST(floor(octet_length(encode(text)) / {IMG_WIDTH}) AS BIGINT) AS height
  FROM documents
),
tiles AS (
  SELECT doc_id, text, u.tx, v.ty
  FROM dims,
       LATERAL (SELECT unnest(range(0, {IMG_WIDTH // TILE})) AS tx) u,
       LATERAL (SELECT unnest(range(0, CAST(floor(height / {TILE}) AS INT))) AS ty) v
)
SELECT doc_id, tx AS tile_x, ty AS tile_y,
       md5({_TILE_ROWS}) AS tile_md5,
       CAST(list_sum(list_transform(
         string_split_regex({_TILE_ROWS}, ''), x -> ord(x))) AS BIGINT)
         AS byte_sum
FROM tiles
"""


@query("mm_tile_2d", oracle=_TILE_ORACLE, tags=("multimodal", "udf"))
def mm_tile_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D patch extraction over binary payloads: treat each payload as
    a row-major width-32 grayscale image and emit every full 8×8 tile
    with its md5 and exact byte sum — the ViT-style patching shape
    (replace the hash with a real patch encoder in deployment). One
    Arrow batch in, variable tile rows out via ``mapInPandas``; both
    the slicing arithmetic and the tile bytes are oracle-verified."""
    import hashlib

    def tiles(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, txs, tys, sums_, md5s = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                height = len(b) // IMG_WIDTH
                for ty in range(height // TILE):
                    for tx in range(IMG_WIDTH // TILE):
                        rows = [
                            b[
                                (ty * TILE + r) * IMG_WIDTH
                                + tx * TILE : (ty * TILE + r) * IMG_WIDTH
                                + tx * TILE
                                + TILE
                            ]
                            for r in range(TILE)
                        ]
                        tile = b"".join(rows)
                        ids.append(doc_id)
                        txs.append(tx)
                        tys.append(ty)
                        md5s.append(hashlib.md5(tile).hexdigest())
                        sums_.append(sum(tile))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "tile_x": txs,
                    "tile_y": tys,
                    "tile_md5": md5s,
                    "byte_sum": sums_,
                }
            )

    return media_table(spark, sf_dir).mapInPandas(tiles, TILE_SCHEMA)
