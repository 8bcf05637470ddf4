"""Approximate early-exit graph variants (VERDICT r5 directive #6).

The ``_approx`` twins have no SQL oracle (their round count is
data-dependent by design), so agreement with the exact variants and
the exit actually FIRING are pinned here instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import udacity_data_engineer_capstone_spark as engine

engine.load_all()

SF = "/root/testdata/sf0.01"


def _run(spark, name):
    return engine.QUERIES[name].fn(spark, SF)


def test_pagerank_approx_agrees_with_exact_topk(spark):
    approx = _run(spark, "graph_pagerank_approx").collect()
    rounds = approx[0]["rounds_run"]
    assert 1 <= rounds <= 6
    top_approx = {r["node_id"] for r in approx}
    exact = (
        _run(spark, "graph_pagerank")
        .orderBy(F.col("pr_rank").desc(), F.col("node_id").asc())
        .limit(100)
        .collect()
    )
    top_exact = {r["node_id"] for r in exact}
    overlap = len(top_approx & top_exact) / 100
    # ranking-stability exit must still surface essentially the same
    # top set the full fixed-round run finds
    assert overlap >= 0.9, (rounds, overlap)


def test_pagerank_approx_exit_fires_before_cap(spark):
    # degree-dominated ranks stabilize their ORDER long before their
    # values: the observable win of the approx variant
    rounds = _run(spark, "graph_pagerank_approx").first()["rounds_run"]
    assert rounds < 6, "ranking-stability exit never fired"


def test_lpa_approx_multilevel_converges(spark):
    out = _run(spark, "graph_lpa_approx")
    rounds = out.first()["rounds_run"]
    # the coarse solve runs to actual convergence (changed == 0), well
    # inside the iteration cap — unlike flat synchronous LPA, which
    # oscillates period-2 on this bipartite graph and never converges
    assert 1 <= rounds < 50, "coarse LPA did not converge under the cap"
    # full labeling: one row per node
    n_nodes = _run(spark, "graph_pagerank").count()
    assert out.count() == n_nodes
    # communities are anchored at suppliers: every label is a supplier
    # node id (odd in the 2c / 2s+1 node encoding)
    assert out.filter(F.col("community") % 2 == 0).count() == 0


def test_lpa_approx_distributed_fallback_agrees(spark, monkeypatch):
    from udacity_data_engineer_capstone_spark.operators import graph as G

    single = _run(spark, "graph_lpa_approx")
    n_single = single.select("community").distinct().count()
    # force the size gate so the distributed coarse loop runs instead
    # of the single-task solve
    monkeypatch.setattr(G, "_LPA_COARSE_MAX_EDGES", 0)
    fb = _run(spark, "graph_lpa_approx")
    assert fb.count() == single.count()
    assert fb.filter(F.col("community") % 2 == 0).count() == 0
    # both paths solve the same coarse graph; at this SF the converged
    # structure matches (community count is the stable observable)
    assert fb.select("community").distinct().count() == n_single


def test_hits_approx_agrees_with_exact_authorities(spark):
    approx = _run(spark, "graph_hits_approx").collect()
    rounds = approx[0]["rounds_run"]
    assert 1 <= rounds <= 6
    top_approx = {r["node_id"] for r in approx}
    exact = (
        _run(spark, "graph_hits")
        .filter(F.col("role") == "authority")
        .orderBy(F.col("score_milli").desc(), F.col("node_id").asc())
        .limit(20)
        .collect()
    )
    top_exact = {r["node_id"] for r in exact}
    assert len(top_approx & top_exact) / 20 >= 0.7, (rounds, top_approx)
