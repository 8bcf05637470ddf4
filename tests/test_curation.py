"""Semantic checks for the end-to-end corpus curation chain."""

from __future__ import annotations

import udacity_data_engineer_capstone_spark as engine

engine.load_all()
Q = engine.QUERIES


def test_curation_removes_planted_duplicates(spark, sf_dir):
    kept = {r.doc_id for r in Q["curate_training_corpus"].fn(spark, sf_dir).collect()}
    assert kept

    # planted exact copies (doc_id + 1_000_000) must all be gone — their
    # originals (smaller ids) are the keepers
    planted_exact = {d for d in kept if 1_000_000 <= d < 2_000_000}
    assert not planted_exact

    # planted near-copies (doc_id + 2_000_000) should be mostly removed by
    # the LSH pass (bottom-k banding isn't 100% recall by design)
    from udacity_data_engineer_capstone_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    near_total = sum(1 for d in range(n_docs) if d % 50 == 7)
    near_kept = len({d for d in kept if d >= 2_000_000})
    assert near_kept <= near_total // 2, f"{near_kept} of {near_total} near-dups survived"

    # originals of the exact dups must still be present (quality permitting)
    originals = {d for d in kept if d % 50 == 0 and d < 1_000_000}
    assert originals
