"""ANN quality tests: LSH recall vs the exact brute-force baseline."""

from __future__ import annotations

from udacity_data_engineer_capstone_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    ann_pq_topk,
    sim_topk_bruteforce,
)


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    exact = _pairs(sim_topk_bruteforce(spark, sf_dir))
    approx = _pairs(ann_lsh_topk(spark, sf_dir))
    assert exact, "brute force returned nothing"
    recall = len(exact & approx) / len(exact)
    # 16 tables × 4 hyperplanes on random 64-d data: recall is imperfect by
    # design but must be substantial
    assert recall >= 0.5, f"ANN recall too low: {recall:.2f}"


def test_ann_deterministic(spark, sf_dir):
    a = _pairs(ann_lsh_topk(spark, sf_dir))
    b = _pairs(ann_lsh_topk(spark, sf_dir))
    assert a == b


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = _pairs(sim_topk_bruteforce(spark, sf_dir))
    approx = _pairs(ann_ivf_topk(spark, sf_dir))
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of 16 cells on near-uniform data: neighbors are spread
    # across cells, so recall is modest by construction — but must beat
    # the ~25% a random 4-of-16-cell scan would give
    assert recall >= 0.35, f"IVF recall too low: {recall:.2f}"


def test_ivf_deterministic(spark, sf_dir):
    assert _pairs(ann_ivf_topk(spark, sf_dir)) == _pairs(ann_ivf_topk(spark, sf_dir))


def test_pq_recall_and_determinism(spark, sf_dir):
    """sim_ann_pq (ADC + exact rerank) must reach high recall vs the
    exact baseline (params tuned on uniform random vectors — the
    no-cluster worst case) and be run-to-run deterministic (seeded
    codebooks, total-order tie-breaks)."""
    exact = _pairs(sim_topk_bruteforce(spark, sf_dir))
    got1 = ann_pq_topk(spark, sf_dir).collect()
    pq = {(r.query_id, r.neighbor_id) for r in got1}
    assert len(exact & pq) / len(exact) >= 0.8
    got2 = ann_pq_topk(spark, sf_dir).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))


def test_binary_hamming_beats_random_baseline(spark, sf_dir):
    """Sign-bit Hamming top-10 must retrieve a meaningfully better set
    than chance: overlap with the exact cosine top-10 well above the
    random baseline (10/n ~ 0.5%), though below the float ANN tiers —
    it is the coarse pass, not the final ranking."""
    import udacity_data_engineer_capstone_spark as engine

    exact = {
        (r.query_id, r.neighbor_id)
        for r in engine.QUERIES["sim_topk_bruteforce"].fn(spark, sf_dir).collect()
    }
    ham = {
        (r.query_id, r.neighbor_id)
        for r in engine.QUERIES["sim_binary_hamming"].fn(spark, sf_dir).collect()
    }
    recall = len(exact & ham) / len(exact)
    assert recall >= 0.2, f"binary recall {recall} not above chance"


def test_ann_recall_eval_table(spark, sf_dir):
    """The registered recall@k eval artifact: all four variants
    present across the two tables (the SQL-reproducible tiers in the
    oracled ``sim_ann_recall_eval``, the trained tiers in the
    rows-only ``sim_ann_recall_eval_trained``), every query counted
    (zero-hit queries average in as 0), and the recall floors of the
    quality tests reproduced from the table itself."""
    import udacity_data_engineer_capstone_spark as engine

    engine.load_all()
    rows = {
        r["variant"]: r
        for r in engine.QUERIES["sim_ann_recall_eval"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"lsh", "hamming"}
    rows.update(
        {
            r["variant"]: r
            for r in engine.QUERIES["sim_ann_recall_eval_trained"]
            .fn(spark, sf_dir)
            .collect()
        }
    )
    assert set(rows) == {"lsh", "ivf", "pq", "hamming"}
    for v, r in rows.items():
        assert r["n_queries"] == 5, (v, r)
    # bucketed/quantized tiers: recall >= 0.5 at worst on random 64-d
    for v in ("lsh", "ivf", "pq"):
        assert rows[v]["recall_ppm"] >= 500_000, (v, rows[v])
    # 1-bit Hamming is the cheap tier: nonzero but lossy by design
    assert rows["hamming"]["recall_ppm"] > 0
