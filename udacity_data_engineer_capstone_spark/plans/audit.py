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


# --- single-partition global-window detection ------------------------------

_LIMIT_NODE_MARKERS = ("Limit", "TakeOrderedAndProject")


def _jchildren(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _input_bounded(node) -> bool:
    """Is this plan subtree's OUTPUT row count visibly bounded by a
    limit? Structural recursion (not "any Limit anywhere below" — a
    limit in one branch of a join must not green-light a window fed by
    the join's unbounded other branch):

    - a Limit-class node (GlobalLimit/LocalLimit/CollectLimit/
      WindowGroupLimit/TakeOrderedAndProject) bounds its subtree;
    - a join is bounded by join type: inner/cross — either side
      bounded bounds the output (<= bounded side x per-key matches);
      left outer/semi/anti — the left side must be bounded; right
      outer — the right side; full outer — both;
    - any other node is bounded iff all its children are (unary
      pass-throughs inherit; leaves are unbounded).

    Known limitation (accepted): the inner-join rule assumes per-key
    match counts are O(1) — a top-k side equi-joined on a DUPLICATED
    key against an unbounded side can have unbounded output, which
    this structural check cannot see (key uniqueness is a data
    property, not a plan property). The residual risk is a window fed
    by such a join being under-flagged; the per-query plan tests and
    the sf1 scale smoke are the backstop for that shape.
    """
    name = node.nodeName()
    if any(m in name for m in _LIMIT_NODE_MARKERS):
        return True
    kids = _jchildren(node)
    if not kids:
        return False
    if "Join" in name and len(kids) == 2:
        try:
            jt = node.joinType().toString()
        except Exception:
            jt = ""
        lb, rb = _input_bounded(kids[0]), _input_bounded(kids[1])
        if jt in ("Inner", "Cross"):
            return lb or rb
        if jt.startswith("Left"):  # LeftOuter / LeftSemi / LeftAnti
            return lb
        if jt == "RightOuter":
            return rb
        return lb and rb  # FullOuter / unknown: conservative
    return all(_input_bounded(c) for c in kids)


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec whose input is not
    visibly row-bounded — the single-partition global-window trap.

    An empty ``partitionSpec`` forces an ``Exchange SinglePartition``
    under the Window at execution: the entire input frame serializes
    through ONE task. That is exactly the plan shape
    ``operators.ordinal.global_row_number`` exists to replace, so the
    registry-wide audit flags it mechanically.

    Inspects the physical ``sparkPlan`` (pre-AQE — structure, not
    runtime stats). For a STREAMING DataFrame — whose physical plan
    cannot be materialized before ``writeStream.start()`` — the walk
    runs over the ANALYZED logical plan instead: logical ``Window``
    nodes expose the same empty-``partitionSpec`` signature, and the
    Limit-class markers (``GlobalLimit``/``LocalLimit``) still match.
    (``WindowGroupLimit`` only exists post-optimization, so a
    rank-limit shape on a stream would flag — correctly: streaming
    doesn't support that shape anyway.) A global window is
    auto-allowed only when its input is VISIBLY row-bounded per
    :func:`_input_bounded` — a
    Limit-class node (``GlobalLimit``/``LocalLimit``/``CollectLimit``
    /``WindowGroupLimit``/``TakeOrderedAndProject``; Spark 4 compiles
    ``row_number <= k`` filters into TakeOrderedAndProject, a true
    distributed top-k) on every unbounded path into the window.
    Frames bounded by CONSTRUCTION (e.g. a groupBy on a <=10-value
    key) are invisible to a structural check — those need a documented
    allowlist entry at the audit site.

    Returns one descriptive string per offending Window node (empty
    list = clean plan).
    """
    qe = df._jdf.queryExecution()
    offenders: list[str] = []

    def visit(node) -> None:
        name = node.nodeName()
        if name.startswith("Window") and "GroupLimit" not in name:
            try:
                part_empty = node.partitionSpec().isEmpty()
            except Exception:
                part_empty = False  # node without a partitionSpec method
            if part_empty and not _input_bounded(node):
                offenders.append(node.simpleString(25))
        for c in _jchildren(node):
            visit(c)

    visit(qe.analyzed() if df.isStreaming else qe.sparkPlan())
    return offenders
