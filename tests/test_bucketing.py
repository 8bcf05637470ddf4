"""Bucketed-table join: proof that pre-bucketing deletes the shuffle.

At 100 TB, the lineitem⋈orders shuffle is the dominant cost of the star
join; writing both tables bucketed on the order key at ingest time makes
every subsequent join on that key shuffle-free. This test pins that: the
bucketed join plan must contain no Exchange.
"""

from __future__ import annotations

import pytest

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.plans.audit import plan_text


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")
        # a stale location survives when a fresh metastore never knew the
        # table — DROP can't clean what it can't see
        shutil.rmtree(f"{warehouse}/b_{name}", ignore_errors=True)
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"b_{name}")
        )
    li = spark.table("b_lineitem")
    orders = spark.table("b_orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_totalprice"
    )
    text = plan_text(joined, execute=True)
    assert "Exchange" not in text, text
    # sanity: 1:1 with lineitem (every line item has exactly one order)
    assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
