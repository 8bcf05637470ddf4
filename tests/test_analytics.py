"""Targeted tests for the analytics surface beyond oracle parity."""

from __future__ import annotations

import udacity_data_engineer_capstone_spark as engine

engine.load_all()
Q = engine.QUERIES


def test_approx_distinct_error_bounded(spark, sf_dir):
    exact = {
        r.l_returnflag: r.n_parts
        for r in Q["agg_distinct_count"].fn(spark, sf_dir).collect()
    }
    rows = Q["agg_approx_distinct"].fn(spark, sf_dir).collect()
    got = {r.l_returnflag: (r.n_parts_exact, r.approx_within_5pct) for r in rows}
    assert set(exact) == set(got)
    for k, (n_exact, within) in got.items():
        assert n_exact == exact[k]
        assert within, f"{k}: HLL estimate drifted beyond 5% of {n_exact}"


def test_asof_prior_click_strictly_before(spark, sf_dir):
    rows = Q["join_asof_event"].fn(spark, sf_dir).collect()
    assert rows
    with_click = [r for r in rows if r.last_click_ts is not None]
    assert with_click, "no purchase had a prior click"
    for r in with_click:
        assert r.last_click_ts < r.purchase_ts


def test_global_topk_is_sorted(spark, sf_dir):
    rows = Q["ord_global_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_rollup_has_grand_total(spark, sf_dir):
    rows = Q["agg_rollup"].fn(spark, sf_dir).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    assert grand[0].n_items == sum(
        r.n_items for r in rows if r.l_returnflag is not None and r.l_linestatus is not None
    )


def test_approx_percentile_within_bound(spark, sf_dir):
    """The emitted exact quartiles must agree with agg_percentiles and
    the sketch-error boolean must hold."""
    rows = Q["agg_approx_percentile"].fn(spark, sf_dir).collect()
    got = {
        r.l_returnflag: (r.q1_exact, r.med_exact, r.q3_exact, r.approx_within_5pct)
        for r in rows
    }
    exact = {
        r.l_returnflag: (r.q1, r.q2, r.q3)
        for r in Q["agg_percentiles"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for flag, (q1, q2, q3) in exact.items():
        g1, g2, g3, within = got[flag]
        assert (g1, g2, g3) == (q1, q2, q3)
        assert within, f"{flag}: approx_percentile beyond 5% of exact"
