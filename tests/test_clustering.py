"""Structural properties of the round-2 wave: duplicate clustering,
decontamination, embedding quantization, and the subquery plans.

The Spark-vs-DuckDB hash parity for all of these lives in
test_oracle_parity (auto-parametrized); these tests pin the *semantics
and plans* the parity check can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import udacity_data_engineer_capstone_spark as engine
from udacity_data_engineer_capstone_spark.plans.audit import plan_text

engine.load_all()
Q = engine.QUERIES


def test_cluster_cc_groups_planted_duplicates(spark, sf_dir):
    """Every planted exact copy (doc_id + off) and near copy
    (doc_id + 2·off) must land in its original's cluster, and the
    cluster id must be the least member (the canonical keeper).
    ``off`` is the DERIVED MAX(doc_id)+1 range width (dedup.doc_offset,
    round-11 fix of the fixed +1e6/+2e6 collision class)."""
    from udacity_data_engineer_capstone_spark.operators.dedup import doc_offset

    off = doc_offset(spark, sf_dir).first()["off"]
    rows = Q["dedup_cluster_cc"].fn(spark, sf_dir).collect()
    label = {r.doc_id: r.cluster_id for r in rows}
    exact_copies = [d for d in label if off <= d < 2 * off]
    near_copies = [d for d in label if d >= 2 * off]
    assert exact_copies and near_copies
    for d in exact_copies + near_copies:
        orig = d % off
        assert label[d] == label[orig], (d, label[d], label[orig])
    # cluster id is the minimum of its members
    members: dict[int, list[int]] = {}
    for d, c in label.items():
        members.setdefault(c, []).append(d)
    for c, ms in members.items():
        assert c == min(ms)


def test_contamination_flags_benchmark_overlap(spark, sf_dir):
    """Benchmark docs are excluded from scoring; ratios are in [0, 1];
    hits never exceed the shingle count."""
    rows = Q["curate_contamination"].fn(spark, sf_dir).collect()
    assert all(r.doc_id % 97 != 3 for r in rows)
    for r in rows:
        assert 0 <= r.n_hits <= r.n_shingles
        assert 0.0 <= r.contamination <= 1.0
        assert r.is_contaminated == (r.contamination >= 0.2)


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    """The eval-gram vocabulary must be the broadcast side — shipping
    the candidate grams instead would shuffle the whole corpus."""
    df = Q["curate_contamination"].fn(spark, sf_dir)
    assert "BroadcastHashJoin" in plan_text(df)


def test_quantize_bounds_and_unit_norm(spark, sf_dir):
    """Quantized dims stay within int8 range for unit-normed input and
    the reported norm is positive for the synthetic embeddings."""
    rows = Q["emb_normalize_quantize"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.norm_e6 > 0
        assert r.n_dims == 64
        assert all(-127 <= q <= 127 for q in r.q)


def test_exists_subquery_plans_as_semi_anti_join(spark, sf_dir):
    """Catalyst must decorrelate EXISTS/NOT EXISTS into semi/anti hash
    joins — no per-row subquery node may survive."""
    text = plan_text(Q["sub_exists_corr"].fn(spark, sf_dir))
    assert "LeftSemi" in text and "LeftAnti" in text
    assert "InSubquery" not in text


def test_scalar_subquery_decorrelates_to_aggregate_join(spark, sf_dir):
    """Correlated scalar subqueries become aggregate + left join; the
    uncorrelated one becomes a reusable (broadcast) one-row subquery."""
    text = plan_text(Q["sub_scalar"].fn(spark, sf_dir))
    assert "HashAggregate" in text
    assert "LeftOuter" in text or "BroadcastHashJoin" in text
