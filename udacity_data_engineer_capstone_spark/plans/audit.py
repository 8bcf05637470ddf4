"""Physical-plan inspection helpers.

The scale posture rests on Catalyst behaviors — filter/column pushdown
into the parquet scan, broadcast joins for dims, outer-join elimination,
whole-stage codegen, no Python eval on the fact path. These helpers turn
those properties into assertable strings so tests pin them down
(SURVEY §4's dependency table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted", execute: bool = False) -> str:
    """The plan as a string (same text ``df.explain(mode)`` prints).

    With AQE on, codegen markers and final join strategies only appear in
    the *final* plan — pass ``execute=True`` to run the query first so the
    adaptive plan is finalized before reading it.
    """
    if execute:
        # collect (not count): count() builds a different wrapper plan and
        # would leave this df's own adaptive plan unfinalized
        df.collect()
    jdf = df._jdf  # classic-mode internals; fine for a local audit helper
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    text = plan_text(df)
    missing = [n for n in needles if n not in text]
    assert not missing, f"plan missing {missing}\n---\n{text}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    text = plan_text(df)
    present = [n for n in needles if n in text]
    assert not present, f"plan unexpectedly contains {present}\n---\n{text}"
