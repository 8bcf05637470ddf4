"""Tests for the multimodal binary-column plumbing + byte-histogram decode."""

from __future__ import annotations

import pytest

from udacity_data_engineer_capstone_spark.operators.multimodal import (
    N_FEATURE_BINS,
    decode_features,
    extract_features,
    media_table,
)


def test_media_schema(spark, sf_dir):
    media = media_table(spark, sf_dir)
    schema = dict(media.dtypes)
    assert schema["media"] == "binary"
    assert schema["meta"].startswith("struct<")
    row = media.first()
    assert isinstance(row.media, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.media)
    assert row.meta.format == "text/plain"


def test_extract_features_batch_shape(spark, sf_dir):
    feats = extract_features(media_table(spark, sf_dir))
    rows = feats.limit(5).collect()
    assert rows
    for r in rows:
        assert len(r.feature) == N_FEATURE_BINS
        # histogram counts sum to the byte length
        assert sum(r.feature) == float(r.n_bytes)


def test_decode_features_contract():
    assert decode_features(b"") == [0.0] * N_FEATURE_BINS
    # 'abc' = 0x61 0x62 0x63 → all three high nibbles are 6
    f = decode_features(b"abc")
    assert f[6] == 3.0 and sum(f) == 3.0
    # 0x0F low nibble is irrelevant; 0xF0 lands in bin 15
    assert decode_features(b"\x0f\xf0")[0] == 1.0
    assert decode_features(b"\x0f\xf0")[15] == 1.0
    with pytest.raises(NotImplementedError):
        decode_features(None)  # the seam where a real decoder plugs in


def test_phash_dedup_finds_planted_suffix_dups(spark, sf_dir):
    """Recall check against ground truth the fingerprint never sees:
    the corpus's planted near-dups are `<text> + " dup"` suffix pairs
    (same 60-char prefix, different length). Every such pair must be
    recovered by the band join + Hamming verify — the multi-index
    decomposition is pigeonhole-exact for d <= PHASH_HAM_MAX, so a
    miss is a bug, not tuning."""
    from udacity_data_engineer_capstone_spark.catalog import load_table
    from udacity_data_engineer_capstone_spark.operators.multimodal import (
        mm_phash_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.alias("a")
    b = docs.alias("b")
    from pyspark.sql import functions as F

    planted = (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                (F.col("a.text") == F.concat(F.col("b.text"), F.lit(" dup")))
                | (F.col("b.text") == F.concat(F.col("a.text"), F.lit(" dup")))
            ),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .collect()
    )
    assert planted, "testdata should contain planted ' dup' suffix pairs"
    found = {
        (r.a_id, r.b_id) for r in mm_phash_dedup(spark, sf_dir).collect()
    }
    missed = [p for p in planted if (p.a_id, p.b_id) not in found]
    assert not missed, f"pHash missed planted near-dups: {missed}"


# --- round-10: golden-bytes decode fixture (no Spark in the loop) -----

# Expected values for tests/fixtures/golden_media.bin, computed
# INDEPENDENTLY of decode_features (pure-Python dict count over
# byte // 16 — no numpy, no bit shift; md5 via hashlib directly) and
# pinned as literals, the same independent-parser treatment
# tests/test_sas7bdat.py gives the SAS binary reader.  The blob covers
# every byte value (every histogram bin non-zero), uneven repeats, and
# a multi-byte UTF-8 tail.
_GOLDEN_N_BYTES = 646
_GOLDEN_MD5 = "f72ad9102ec478739b3e57dd46a53267"
_GOLDEN_FEATURE = [
    37.0, 38.0, 43.0, 40.0, 38.0, 37.0, 57.0, 44.0,
    38.0, 40.0, 40.0, 39.0, 41.0, 38.0, 39.0, 37.0,
]


def _golden_blob() -> bytes:
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "golden_media.bin",
    )
    with open(path, "rb") as f:
        return f.read()


def test_golden_blob_decode_features_no_spark():
    """decode_features on the checked-in blob reproduces the pinned
    independently-computed histogram — pure function test, no Spark."""
    from udacity_data_engineer_capstone_spark.operators.multimodal import (
        N_FEATURE_BINS,
        decode_features,
    )

    blob = _golden_blob()
    assert len(blob) == _GOLDEN_N_BYTES
    got = decode_features(blob)
    assert len(got) == N_FEATURE_BINS
    assert got == _GOLDEN_FEATURE
    assert sum(got) == float(_GOLDEN_N_BYTES)  # histogram is complete


def test_golden_blob_checksum_no_spark():
    import hashlib

    assert hashlib.md5(_golden_blob()).hexdigest() == _GOLDEN_MD5


def test_golden_blob_independent_recount():
    """Belt-and-braces: a third, in-test derivation (collections.Counter
    over byte // 16) agrees with both the pinned literals and
    decode_features — three implementations, one answer."""
    from collections import Counter

    from udacity_data_engineer_capstone_spark.operators.multimodal import (
        decode_features,
    )

    blob = _golden_blob()
    c = Counter(b // 16 for b in blob)
    vec = [float(c.get(i, 0)) for i in range(16)]
    assert vec == _GOLDEN_FEATURE == decode_features(blob)


def test_golden_blob_through_arrow_batch(spark):
    """The same blob through the REAL mapInPandas plumbing (schema,
    Arrow batch, UDF signature) lands the pinned values — the
    Spark-side end of the fixture."""
    from udacity_data_engineer_capstone_spark.operators.multimodal import (
        extract_features,
    )

    blob = _golden_blob()
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    row = extract_features(df).collect()[0]
    assert row["n_bytes"] == _GOLDEN_N_BYTES
    assert row["checksum"] == _GOLDEN_MD5
    assert list(row["feature"]) == _GOLDEN_FEATURE
