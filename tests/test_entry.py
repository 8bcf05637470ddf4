"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "region",
        "nation",
        "revenue_ten_thousandths",
        "n_items",
    }


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
