"""Skew-mitigation ACTIVATION proofs (VERDICT r4 #9).

Oracle parity only proves the salted join is row-equivalent on uniform
TPC-H keys; these tests drive a Zipf-skewed synthetic key through the
machinery and assert the mitigation actually ENGAGES:

- manual salting: the hot key's output rows land in >= SALT_BUCKETS/2
  distinct shuffle partitions (vs exactly 1 for the unsalted shuffle
  join with AQE skew-split off), and the result still matches;
- AQE skew-join: with realistic thresholds scaled down, the executed
  adaptive plan of the PLAIN join carries the ``skew=true`` marker on
  its sort-merge join — Spark's own runtime split kicked in.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.operators.skew import (
    SALT_BUCKETS,
    salted_equijoin,
)

N_HOT = 60_000     # one key holds ~55% of the fact table
N_TAIL = 50_000    # long tail over ~997 keys


@pytest.fixture(scope="module")
def zipf(spark):
    hot = spark.range(N_HOT).select(
        F.lit(1).cast("long").alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(N_TAIL).select(
        (F.col("id") % 997 + 2).cast("long").alias("k"),
        (F.col("id") + N_HOT).alias("payload"),
    )
    fact = hot.unionAll(tail).repartition(8).localCheckpoint()
    dim = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(1, 1000)], "dk long, name string"
    ).localCheckpoint()
    return fact, dim


class _conf:
    """Temporarily set spark confs, restoring previous values."""

    def __init__(self, spark, **kv):
        self.spark = spark
        self.kv = {k.replace("__", "."): v for k, v in kv.items()}

    def __enter__(self):
        self.old = {}
        for k, v in self.kv.items():
            try:
                self.old[k] = self.spark.conf.get(k)
            except Exception:
                self.old[k] = None
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_salting_spreads_hot_key_across_partitions(spark, zipf):
    fact, dim = zipf
    # control: plain shuffle join with AQE fully off (its partition
    # COALESCING would otherwise merge this small test shuffle into one
    # partition and mask the placement) -> the hot key's entire output
    # sits in ONE shuffle partition (the straggler)
    with _conf(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__enabled": "false",
        },
    ):
        plain = fact.join(dim, fact["k"] == dim["dk"])
        plain_parts = (
            plain.filter(F.col("k") == 1)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert plain_parts == 1

        salted = salted_equijoin(
            fact, dim, "k", "dk", F.col("payload") % SALT_BUCKETS
        )
        salted_parts = (
            salted.filter(F.col("k") == 1)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        # the hot key genuinely spread over the salt space
        assert salted_parts >= SALT_BUCKETS // 2

        # and the mitigation changed nothing about the answer
        cols = ["k", "payload", "name"]
        assert sorted(map(tuple, salted.select(cols).collect())) == sorted(
            map(tuple, plain.select(cols).collect())
        )


def test_salting_with_signed_hash_salt_loses_no_rows(spark, zipf):
    """ADVICE r5: Spark's hash() is signed and % keeps the sign, so the
    natural production salt ``F.hash(...) % buckets`` used to yield
    negative salts with no matching dim replica — silently dropping fact
    rows. The helper now pmod-folds the salt itself; a signed hash salt
    must produce the exact plain-join result."""
    fact, dim = zipf
    with _conf(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__enabled": "false",
        },
    ):
        # hash() is signed: roughly half these salts are negative pre-pmod
        salted = salted_equijoin(
            fact, dim, "k", "dk", F.hash("payload") % SALT_BUCKETS
        )
        plain = fact.join(dim, fact["k"] == dim["dk"])
        assert salted.count() == plain.count() == N_HOT + N_TAIL


def test_aqe_skew_join_split_engages_on_zipf_key(spark, zipf):
    fact, dim = zipf
    with _conf(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__skewJoin__enabled": "true",
            # scale production thresholds down to the test data: the hot
            # partition (~1.5 MB) must exceed both the absolute floor
            # and factor x median
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
        },
    ):
        joined = fact.join(dim, fact["k"] == dim["dk"]).select(
            "k", "payload", "name"
        )
        # materialize THIS DataFrame's query execution (count() would
        # plan a separate tree and leave this one isFinalPlan=false)
        assert len(joined.collect()) == N_HOT + N_TAIL
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE skew-join split did not engage on the Zipf key:\n" + plan
        )
