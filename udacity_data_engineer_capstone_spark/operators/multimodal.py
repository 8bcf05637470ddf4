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


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection (multi-index Hamming join)
# ---------------------------------------------------------------------------
#
# Image dedup at lake scale works on PERCEPTUAL hashes (pHash/aHash): a
# decode→resize→transform step maps each image to a short bit fingerprint
# in which visually-near images differ in only a few bits, and near-dup
# detection is a Hamming-distance-≤ d search. The distributed shape is
# MULTI-INDEX HASHING (Norouzi et al., CVPR 2012): split the 128-bit
# hash into B = 8 disjoint 16-bit bands — any pair within Hamming d < B
# must agree EXACTLY on at least one band (pigeonhole) — so candidates
# come from B equi-joins on (band_idx, band_value) and only candidates
# pay the exact 128-bit verify. No all-pairs stage anywhere; recall is
# exact for d ≤ 6 by construction (up to the hot-bucket cap below).
#
# The decode+DCT step is STUBBED (no image libs in this container) with a
# deterministic stand-in that keeps the perceptual CONTRACT — a small
# content edit moves few bits, unrelated content differs in ~half the
# bits, and the fingerprint is invariant to content *position* (a real
# pHash survives crop/shift/reflow because DCT low frequencies do):
# bit_i is the PARITY of the count of payload byte BIGRAMS hashing to
# class i ((b₁·31 + b₂) mod 128) — a bag-of-bigrams projection. Editing
# k bytes touches ≤ k+1 bigrams, flipping at most that many bits
# (appending the corpus's " dup" suffix lands at Hamming 2–4 regardless
# of width), while unrelated payloads disagree on ~half the bits
# (the background-pair count at d ≤ 6 shrinks further at 128 bits —
# wider fingerprints buy discrimination). Payloads are ASCII text
# bytes here, so the oracle recomputes the identical fingerprint from
# ``text`` with ord()/substr — the stub stays honest. A real pHash
# (PIL decode + scipy DCT) drops into the ``phash`` batch function
# unchanged; only the bit producer changes, never the join shape.

# Width sizing (round-7 sf1 smoke lesson): band space must outgrow the
# corpus or the equi-join saturates — with 8-bit bands (256 values),
# 50k docs put ~200 docs in every bucket and the candidate stage went
# QUADRATIC (38M pairs, 84× wall at 10× rows). Rule of thumb:
# band_bits ≳ log2(n_docs) + margin; 16-bit bands hold to ~1M docs,
# production at corpus scale widens again (Norouzi's MIH sizes bands
# exactly this way). Widening the fingerprint does not change the
# pigeonhole contract: d ≤ 6 < 8 bands still guarantees an exact band.
PHASH_BITS = 128
PHASH_BANDS = 8  # 8 bands × 16 bits
PHASH_BAND_BITS = 16
PHASH_HAM_MAX = 6  # < PHASH_BANDS, so band agreement is guaranteed
# Hot-bucket cap (round-7 sf1 smoke lesson, same device as
# dedup_ngram_jaccard's df-cap): low-diversity corpora concentrate band
# values, and one megabucket turns the candidate equi-join quadratic
# (measured: 816-doc max bucket and 24.5M candidate pairs at sf1).
# Buckets above the cap are skipped for pair generation — a pair is
# still found through any of its other 7 bands, so only pairs whose
# EVERY shared band is degenerate lose recall (the dedup_index_stats
# gating report is how a deployment watches this). The cap exceeds the
# max bucket at the sf0.001/sf0.01 oracle-gate scales (21), so the
# pigeonhole-exact recall guarantee is untouched where it's tested.
PHASH_BUCKET_CAP = 64

_PHASH_BITS_SQL = f"""
  list_transform(range(0, {PHASH_BITS}), w ->
    CAST(COALESCE(list_sum(list_transform(
      range(1, CAST(length(text) AS BIGINT)),
      j -> CASE WHEN (ord(substr(text, CAST(j AS INT), 1)) * 31
                      + ord(substr(text, CAST(j AS INT) + 1, 1)))
                     % {PHASH_BITS} = w
                THEN 1 ELSE 0 END)), 0) % 2 AS INT))
"""

_PHASH_ORACLE = f"""
WITH ph AS (
  SELECT doc_id, {_PHASH_BITS_SQL} AS bits
  FROM documents
),
bands_all AS (
  SELECT doc_id, bits, b.b AS band_idx,
         array_to_string(bits[b.b * {PHASH_BAND_BITS} + 1 : b.b * {PHASH_BAND_BITS} + {PHASH_BAND_BITS}], '') AS band_val
  FROM ph, (SELECT unnest(range(0, {PHASH_BANDS})) AS b) b
),
bands AS (
  SELECT doc_id, bits, band_idx, band_val
  FROM (SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz
        FROM bands_all)
  WHERE bsz <= {PHASH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.bits AS a_bits, b.bits AS b_bits
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
),
verified AS (
  SELECT a_id, b_id,
         CAST(list_sum(list_transform(range(1, {PHASH_BITS} + 1), i ->
           CASE WHEN a_bits[i] = b_bits[i] THEN 0 ELSE 1 END)) AS INT)
           AS hamming
  FROM cand
)
SELECT a_id, b_id, hamming FROM verified WHERE hamming <= {PHASH_HAM_MAX}
"""


@query("mm_phash_dedup", oracle=_PHASH_ORACLE, tags=("multimodal", "dedup"))
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the binary media
    column: Arrow-batched pHash (stub DCT, see module comment) →
    4×16-bit band explode → equi-join on (band_idx, band_value) →
    exact 64-bit Hamming verify ≤ 3.

    Scale shape: the fingerprint pass is a narrow ``mapInPandas`` map
    (one numpy reshape+parity per batch, no shuffle); the candidate
    join is an EQUI-join whose key space (band values) grows with
    corpus diversity, so the shuffle carries doc_id + 4 short keys per
    doc — never payload bytes, never all pairs; the verify touches only
    colliding pairs. Exactly the shape ``dedup_minhash_lsh`` pins, with
    pigeonhole-exact recall instead of probabilistic."""

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # one flattened bincount per batch: bag-of-bigrams parity,
            # bit_i = count((b1*31 + b2) ≡ i mod 64) % 2, all docs at once
            payloads = [
                np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                for p in pdf["media"]
            ]
            cls = [
                (raw[:-1] * 31 + raw[1:]) % PHASH_BITS if len(raw) > 1
                else np.empty(0, dtype=np.int64)
                for raw in payloads
            ]
            doc_idx = np.repeat(np.arange(len(cls)), [len(c) for c in cls])
            flat = np.concatenate(cls) if cls else np.empty(0, dtype=np.int64)
            bits_mat = (
                np.bincount(
                    doc_idx * PHASH_BITS + flat,
                    minlength=len(cls) * PHASH_BITS,
                ).reshape(len(cls), PHASH_BITS)
                % 2
            ).astype(np.int32)
            bit_strs = ["".join("1" if b else "0" for b in row) for row in bits_mat]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "bits": list(bits_mat),
                    "bands": [
                        [
                            s[b * PHASH_BAND_BITS : (b + 1) * PHASH_BAND_BITS]
                            for b in range(PHASH_BANDS)
                        ]
                        for s in bit_strs
                    ],
                }
            )

    # the fingerprint frame feeds BOTH sides of the self-join below;
    # localCheckpoint materializes the Python stage once instead of
    # re-running it per join side (same device as dedup_minhash_lsh)
    ph = (
        media_table(spark, sf_dir)
        .mapInPandas(phash, "doc_id long, bits array<int>, bands array<string>")
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window as W

    bands = ph.select(
        "doc_id", "bits", F.posexplode("bands").alias("band_idx", "band_val")
    )
    # hot-bucket cap: one window count on the join's own partitioning
    # (the subsequent self-join reuses the (band_idx, band_val) hash
    # distribution, so the cap costs no extra exchange)
    bw = W.partitionBy("band_idx", "band_val")
    bands = (
        bands.withColumn("bsz", F.count(F.lit(1)).over(bw))
        .filter(F.col("bsz") <= PHASH_BUCKET_CAP)
        .drop("bsz")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.expr(
        "aggregate(zip_with(a_bits, b_bits, (x, y) -> IF(x = y, 0, 1)), 0, (acc, x) -> acc + x)"
    )
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.bits").alias("a_bits"),
            F.col("b.bits").alias("b_bits"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.select("a_id", "b_id", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
    )


# ---------------------------------------------------------------------------
# end-to-end multimodal curation pipeline
# ---------------------------------------------------------------------------

_MM_PIPE_ORACLE = f"""
WITH ph AS (
  SELECT doc_id, {_PHASH_BITS_SQL} AS bits
  FROM documents
),
bands_all AS (
  SELECT doc_id, bits, b.b AS band_idx,
         array_to_string(bits[b.b * {PHASH_BAND_BITS} + 1 : b.b * {PHASH_BAND_BITS} + {PHASH_BAND_BITS}], '') AS band_val
  FROM ph, (SELECT unnest(range(0, {PHASH_BANDS})) AS b) b
),
bands AS (
  SELECT doc_id, bits, band_idx, band_val
  FROM (SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz
        FROM bands_all)
  WHERE bsz <= {PHASH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.bits AS a_bits, b.bits AS b_bits
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
),
verified AS (
  SELECT a_id, b_id,
         CAST(list_sum(list_transform(range(1, {PHASH_BITS} + 1), i ->
           CASE WHEN a_bits[i] = b_bits[i] THEN 0 ELSE 1 END)) AS INT)
           AS hamming
  FROM cand
),
drops AS (
  SELECT DISTINCT b_id AS doc_id FROM verified WHERE hamming <= {PHASH_HAM_MAX}
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(dr.doc_id) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COUNT(dr.doc_id) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN dr.doc_id IS NULL
                     THEN octet_length(encode(d.text)) ELSE 0 END) AS BIGINT)
         AS kept_bytes
FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
GROUP BY d.source
"""


@query("pipe_multimodal_curation", oracle=_MM_PIPE_ORACLE, tags=("pipeline", "multimodal"))
def pipe_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal curation: binary media → perceptual-hash
    near-dup pairs (``mm_phash_dedup``) → keep-first survivor policy
    (the LOWER doc_id of every verified pair survives; any doc that is
    the higher side of a pair is dropped) → per-source audit of
    docs / dropped / kept / kept payload bytes.

    Scale shape: composes the band-join dedup (no all-pairs stage) with
    one broadcast-able anti-join of the (small) drop set against the
    corpus and a partial+final audit aggregate. This is the exact
    pipeline shape an image-corpus refresh runs before training — the
    audit row is what lands in the data-lineage report."""
    media = media_table(spark, sf_dir)
    pairs = mm_phash_dedup(spark, sf_dir)
    drops = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    flagged = media.join(F.broadcast(drops), "doc_id", "left_semi").select(
        "doc_id", F.lit(1).alias("dropped")
    )
    return (
        media.join(F.broadcast(flagged), "doc_id", "left")
        .groupBy(F.col("meta.source").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("dropped").cast("long").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("dropped")).cast("long").alias("n_kept"),
            F.sum(
                F.when(F.col("dropped").isNull(), F.col("meta.n_bytes")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("kept_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# resize (block-average downsample to a fixed grid)
# ---------------------------------------------------------------------------

RESIZE_PIXELS = 16

_RESIZE_ORACLE = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       list_transform(range(0, {RESIZE_PIXELS}), w ->
         CAST(list_sum(list_transform(
                range(w * length(text) // {RESIZE_PIXELS} + 1,
                      (w + 1) * length(text) // {RESIZE_PIXELS} + 1),
                j -> ord(substr(text, CAST(j AS INT), 1))))
              // ((w + 1) * length(text) // {RESIZE_PIXELS}
                  - w * length(text) // {RESIZE_PIXELS}) AS INT))
         AS pixels
FROM documents
"""


@query("mm_resize", oracle=_RESIZE_ORACLE, tags=("multimodal", "udf"))
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize over the binary media column: block-average downsample of
    each payload onto a fixed 16-cell grid — cell w averages the
    byte range [w·L/16, (w+1)·L/16), i.e. the 1-D form of exactly what
    an image resize does per output pixel (area averaging over the
    source window). Arrow-batched ``mapInPandas``, one vectorized
    cumsum per batch row, integer mean (sum DIV count) so both engines
    agree bit-for-bit. A real image resize (PIL ``Image.resize`` after
    decode) replaces the cumsum body; schema, batching, and the
    narrow-map plan are unchanged.

    Scale shape: pure narrow map — no shuffle, no driver; output is
    doc_id + 16 ints regardless of payload size, so downstream
    operators (dedup, featurize) consume a constant-width frame."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, pix = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                bounds = (
                    np.arange(RESIZE_PIXELS + 1, dtype=np.int64) * len(raw)
                ) // RESIZE_PIXELS
                csum = np.concatenate(([0], np.cumsum(raw, dtype=np.int64)))
                counts = bounds[1:] - bounds[:-1]
                sums = csum[bounds[1:]] - csum[bounds[:-1]]
                ids.append(doc_id)
                sizes.append(len(raw))
                pix.append((sums // counts).astype(np.int32))
            yield pd.DataFrame({"doc_id": ids, "n_bytes": sizes, "pixels": pix})

    return media_table(spark, sf_dir).mapInPandas(
        resize, "doc_id long, n_bytes long, pixels array<int>"
    )


# ---------------------------------------------------------------------------
# frame-energy VAD: voice-activity segmentation over binary payloads
# ---------------------------------------------------------------------------

# The audio-side twin of mm_frame_sample: treat the payload as a PCM-ish
# 8-bit sample stream, compute per-frame energy (32-sample frames,
# centered at 64), threshold into active/inactive, and report the
# activity segmentation a speech pipeline uses to cut training clips.
# Restricted to ASCII-only payloads so bytes == codepoints and DuckDB
# can re-derive the identical energies from the text column (the same
# keep-the-oracle-honest trick as media_table's md5 checks).
_VAD_FRAME = 32
_VAD_CENTER = 64
_VAD_THRESHOLD = 30_000

_VAD_ORACLE = f"""
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) = strlen(text)
),
chars AS (
  SELECT doc_id,
         (u.i - 1) // {_VAD_FRAME} AS frame,
         ord(substr(text, CAST(u.i AS INT), 1)) - {_VAD_CENTER} AS s
  FROM ascii_docs,
       LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) u
),
frames AS (
  SELECT doc_id, frame, CAST(SUM(s * s) AS BIGINT) AS energy
  FROM chars GROUP BY doc_id, frame
),
flags AS (
  SELECT doc_id, frame, energy >= {_VAD_THRESHOLD} AS active
  FROM frames
),
runs AS (
  SELECT doc_id,
         frame - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame)
           AS grp
  FROM flags WHERE active
),
seg AS (
  SELECT doc_id, CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_segments,
         CAST(MAX(run_len) AS BIGINT) AS longest_run
  FROM (SELECT doc_id, grp, COUNT(*) AS run_len
        FROM runs GROUP BY doc_id, grp)
  GROUP BY doc_id
),
base AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active
  FROM flags GROUP BY doc_id
)
SELECT b.doc_id, b.n_frames, b.n_active,
       COALESCE(s.n_segments, 0) AS n_segments,
       COALESCE(s.longest_run, 0) AS longest_run
FROM base b LEFT JOIN seg s ON s.doc_id = b.doc_id
"""


@query("mm_audio_energy_vad", oracle=_VAD_ORACLE, tags=("multimodal",))
def mm_audio_energy_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation over the binary media column:
    per-document frame energies (32-sample frames over the 8-bit
    payload), thresholded and run-length encoded into activity
    segments — the clip-cutting pass an audio training pipeline runs
    before transcription. A real audio build swaps the byte stream for
    decoded PCM at the marked line; every Spark-side shape (binary
    column in, Arrow batch, per-doc segmentation out) stays identical.

    Scale shape: ONE Arrow-batched ``mapInPandas`` over the payload
    column — the whole segmentation (energies, threshold, run-length)
    is vectorized numpy inside the batch, emitting 5 integers per
    document; no shuffle, no per-row Python.

    Determinism: integer energies over exact byte values (ASCII-only
    payloads ⇒ bytes == codepoints, so the oracle recomputes them from
    text), integer threshold, integer run lengths."""
    docs = load_table_scaled(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("media"))

    def _vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                "doc_id": [],
                "n_frames": [],
                "n_active": [],
                "n_segments": [],
                "longest_run": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                # >>> real audio decode swaps in here (payload -> PCM) <<<
                s = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                s = s - _VAD_CENTER
                n = len(s)
                n_frames = (n + _VAD_FRAME - 1) // _VAD_FRAME
                pad = n_frames * _VAD_FRAME - n
                sq = np.pad(s * s, (0, pad))
                energy = sq.reshape(n_frames, _VAD_FRAME).sum(axis=1)
                active = energy >= _VAD_THRESHOLD
                n_active = int(active.sum())
                if n_active:
                    # run-length encode the boolean activity track
                    edges = np.diff(active.astype(np.int8))
                    starts = int((edges == 1).sum()) + int(active[0])
                    runs = np.split(active, np.where(edges != 0)[0] + 1)
                    longest = max(len(r) for r in runs if r[0])
                else:
                    starts, longest = 0, 0
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_active"].append(n_active)
                out["n_segments"].append(starts)
                out["longest_run"].append(longest)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, n_frames long, n_active long, "
        "n_segments long, longest_run long"
    )
    return media.mapInPandas(_vad, schema=schema)


# ---------------------------------------------------------------------------
# scene-cut detection: histogram distance between consecutive frames
# ---------------------------------------------------------------------------

# The video twin of mm_audio_energy_vad: 64-byte "frames", a 16-bin
# high-nibble histogram per frame (decode_features' bin rule), and a
# cut wherever the L1 distance between consecutive FULL frames crosses
# the threshold. Partial trailing frames are excluded so every
# comparison is between equal-mass histograms. ASCII-only payloads keep
# bytes == codepoints for the oracle.
_SCENE_FRAME = 64
_SCENE_TAU = 24

_SCENE_ORACLE = f"""
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) = strlen(text)
    AND length(text) >= {2 * _SCENE_FRAME}
),
chars AS (
  SELECT doc_id,
         (u.i - 1) // {_SCENE_FRAME} AS f,
         ord(substr(text, CAST(u.i AS INT), 1)) // 16 AS b
  FROM ascii_docs,
       LATERAL (SELECT unnest(range(1,
                  (length(text) // {_SCENE_FRAME}) * {_SCENE_FRAME} + 1))
                AS i) u
),
hist AS (
  SELECT doc_id, f, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM chars GROUP BY doc_id, f, b
),
pairs AS (
  SELECT COALESCE(p.doc_id, q.doc_id) AS doc_id,
         COALESCE(p.f, q.f - 1) + 1 AS frame_idx,
         CAST(SUM(ABS(COALESCE(q.c, 0) - COALESCE(p.c, 0))) AS BIGINT) AS l1
  FROM hist p
  FULL JOIN hist q
    ON q.doc_id = p.doc_id AND q.f = p.f + 1 AND q.b = p.b
  WHERE COALESCE(q.f, p.f + 1) >= 1
    AND COALESCE(p.f, q.f - 1)
        <= (SELECT MAX(f) FROM hist h2
            WHERE h2.doc_id = COALESCE(p.doc_id, q.doc_id)) - 1
  GROUP BY COALESCE(p.doc_id, q.doc_id), COALESCE(p.f, q.f - 1)
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, l1,
       l1 >= {_SCENE_TAU} AS is_cut
FROM pairs
"""


@query("mm_scene_cut", oracle=_SCENE_ORACLE, tags=("multimodal",))
def mm_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the binary media column: 16-bin
    byte-histograms per 64-byte frame, L1 distance between consecutive
    frames, cut where the distance crosses the threshold — the
    clip-boundary pass a video training pipeline runs before sampling
    frames (``mm_frame_sample``) per scene rather than per file. A
    real build swaps the byte histogram for decoded-frame features at
    the marked line; the Spark shape is identical.

    Scale shape: ONE Arrow-batched ``mapInPandas`` — histograms, the
    diff, and thresholding are vectorized numpy inside the batch,
    emitting one row per frame boundary. No shuffle, no per-row
    Python."""
    docs = load_table_scaled(spark, sf_dir, "documents").filter(
        (F.length("text") == F.octet_length("text"))
        & (F.length("text") >= 2 * _SCENE_FRAME)
    )
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("media"))

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"doc_id": [], "frame_idx": [], "l1": [], "is_cut": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                # >>> real video decode swaps in here (payload -> frames) <<<
                s = np.frombuffer(payload, dtype=np.uint8)
                n_full = len(s) // _SCENE_FRAME
                if n_full < 2:
                    continue
                frames = s[: n_full * _SCENE_FRAME].reshape(
                    n_full, _SCENE_FRAME
                )
                bins = frames // 16  # high nibble, 0..7 for ASCII
                hist = np.zeros((n_full, 16), dtype=np.int64)
                for k in range(16):
                    hist[:, k] = (bins == k).sum(axis=1)
                l1 = np.abs(np.diff(hist, axis=0)).sum(axis=1)
                for i, d in enumerate(l1, start=1):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["l1"].append(int(d))
                    out["is_cut"].append(bool(d >= _SCENE_TAU))
            yield pd.DataFrame(out)

    schema = "doc_id long, frame_idx long, l1 long, is_cut boolean"
    return media.mapInPandas(_cuts, schema=schema)


# ---------------------------------------------------------------------------
# media↔caption pairing audit (LAION-style pair integrity)
# ---------------------------------------------------------------------------

# Deterministic corruption pattern: media row missing for doc_id%7=3,
# caption row missing for doc_id%5=0, caption carries a WRONG checksum
# for doc_id%11=5 — the three failure modes a paired image-text corpus
# audit must separate before training (a mismatched pair poisons
# contrastive training worse than a missing one).
_PAIR_AUDIT_ORACLE = """
WITH media AS (
  SELECT doc_id, source, md5(text) AS media_md5
  FROM documents WHERE doc_id % 7 <> 3
),
caption AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 11 = 5 THEN md5('corrupt' || text)
              ELSE md5(text) END AS ref_md5
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT COALESCE(m.source, c.source) AS source,
       CAST(SUM(CASE WHEN m.doc_id IS NOT NULL AND c.doc_id IS NOT NULL
                      AND m.media_md5 = c.ref_md5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_paired_ok,
       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing_caption,
       CAST(SUM(CASE WHEN m.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing_media,
       CAST(SUM(CASE WHEN m.doc_id IS NOT NULL AND c.doc_id IS NOT NULL
                      AND m.media_md5 <> c.ref_md5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_checksum_mismatch
FROM media m FULL OUTER JOIN caption c ON c.doc_id = m.doc_id
GROUP BY COALESCE(m.source, c.source)
"""


@query("mm_caption_pair_audit", oracle=_PAIR_AUDIT_ORACLE, tags=("multimodal", "quality"))
def mm_caption_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-corpus integrity audit — the gate a multimodal
    (image↔caption) dataset passes before contrastive training:
    full-outer join media against captions on the pair key, verify the
    caption's recorded media checksum against the actual payload md5,
    and report the three failure modes separately (missing caption,
    missing media, checksum mismatch — the last is the silent poison).
    Corruptions are planted deterministically so both engines agree on
    every count.

    Scale shape: one id-width full-outer join (both sides shuffled by
    the pair key) + a source-keyed rollup; payload checksums are
    map-side md5 over the binary column, never a Python roundtrip."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    media = docs.filter(F.col("doc_id") % 7 != 3).select(
        F.col("doc_id").alias("m_id"),
        F.col("source").alias("m_source"),
        F.md5(F.encode("text", "utf-8")).alias("media_md5"),
    )
    captions = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("c_id"),
        F.col("source").alias("c_source"),
        F.when(
            F.col("doc_id") % 11 == 5,
            F.md5(F.concat(F.lit("corrupt"), F.col("text"))),
        )
        .otherwise(F.md5(F.encode("text", "utf-8")))
        .alias("ref_md5"),
    )
    joined = media.join(
        captions, media["m_id"] == captions["c_id"], "full_outer"
    )
    ok = (
        F.col("m_id").isNotNull()
        & F.col("c_id").isNotNull()
        & (F.col("media_md5") == F.col("ref_md5"))
    )
    mismatch = (
        F.col("m_id").isNotNull()
        & F.col("c_id").isNotNull()
        & (F.col("media_md5") != F.col("ref_md5"))
    )
    return joined.groupBy(
        F.coalesce("m_source", "c_source").alias("source")
    ).agg(
        F.sum(ok.cast("int")).cast("long").alias("n_paired_ok"),
        F.sum(F.col("c_id").isNull().cast("int"))
        .cast("long")
        .alias("n_missing_caption"),
        F.sum(F.col("m_id").isNull().cast("int"))
        .cast("long")
        .alias("n_missing_media"),
        F.sum(mismatch.cast("int")).cast("long").alias("n_checksum_mismatch"),
    )
