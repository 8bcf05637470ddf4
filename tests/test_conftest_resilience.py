"""The spark fixture must survive a mid-suite session death
(round-11 directive 7b): a stopped/crashed session is detected by the
per-test health check and transparently rebuilt, so one crash costs
one test, not every test after it (round 10 lost 177 to one JVM
death). Tests run in file order: the first kills the shared session,
the second proves the next fixture request got a live rebuild."""

from __future__ import annotations


def test_kill_shared_session(spark):
    assert spark.sql("SELECT 1").collect()[0][0] == 1
    spark.stop()  # simulate the mid-suite death


def test_fixture_rebuilds_after_death(spark):
    assert spark.sql("SELECT 1 + 1").collect()[0][0] == 2


def test_rebuilt_session_runs_real_work(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/region.parquet").count()
    assert n == 5
