"""Semantic checks for the end-to-end corpus curation chain."""

from __future__ import annotations

import udacity_data_engineer_capstone_spark as engine

engine.load_all()
Q = engine.QUERIES


def test_curation_removes_planted_duplicates(spark, sf_dir):
    from udacity_data_engineer_capstone_spark.operators.dedup import doc_offset

    # planted ranges are DERIVED: originals [0, off), exact copies
    # [off, 2·off), near copies [2·off, 3·off) with off = MAX(doc_id)+1
    # (dedup.doc_offset — r11 fix of the fixed-constant collision class;
    # the old 1e6/2e6 constants made this test vacuous at sf0.001)
    off = doc_offset(spark, sf_dir).first()["off"]
    kept = {r.doc_id for r in Q["curate_training_corpus"].fn(spark, sf_dir).collect()}
    assert kept

    # planted exact copies (doc_id + off) must all be gone — their
    # originals (smaller ids) are the keepers. Vacuity guard first:
    # the INPUT corpus must actually carry ids in that range (the r11
    # stale-constant version of this test passed on an empty set)
    from pyspark.sql import functions as F

    from udacity_data_engineer_capstone_spark.operators.dedup import corpus

    planted_in = (
        corpus(spark, sf_dir)
        .filter((F.col("doc_id") >= off) & (F.col("doc_id") < 2 * off))
        .count()
    )
    assert planted_in > 0
    planted_exact = {d for d in kept if off <= d < 2 * off}
    assert not planted_exact

    # planted near-copies (doc_id + 2·off) should be mostly removed by
    # the LSH pass (bottom-k banding isn't 100% recall by design)
    from udacity_data_engineer_capstone_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    near_total = sum(1 for d in range(n_docs) if d % 50 == 7)
    near_kept = len({d for d in kept if d >= 2 * off})
    assert near_kept <= near_total // 2, f"{near_kept} of {near_total} near-dups survived"

    # originals of the exact dups must still be present (quality permitting)
    originals = {d for d in kept if d % 50 == 0 and d < off}
    assert originals
