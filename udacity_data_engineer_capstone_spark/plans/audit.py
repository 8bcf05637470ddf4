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


# unary nodes through which per-key uniqueness provably survives on
# the way DOWN from a join to its distinct-producer: they preserve the
# row multiset 1:1 (Project/Sort/Exchange/codegen wrappers/Window) or
# shrink it (Filter/Limit-class) — never multiply rows.  Anything else
# (Generate/Expand/MapInPandas/unions/joins) fails closed.
_UNIQ_PASS_PREFIXES = (
    "Project",
    "Filter",
    "Sort",
    "Exchange",
    "ShuffleExchange",
    "BroadcastExchange",
    "ReusedExchange",
    "WholeStageCodegen",
    "InputAdapter",
    "ColumnarToRow",
    "RowToColumnar",
    "Coalesce",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "Window",  # window functions add columns, preserve rows 1:1
    "AdaptiveSparkPlan",
    "LocalTableScan",  # leaf; recursion never reaches it with children
)

_AGG_NODE_MARKERS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def _expr_strs(scala_seq) -> set[str]:
    return {scala_seq.apply(i).toString() for i in range(scala_seq.size())}


def _keys_unique_below(node, key_strs: set[str]) -> bool:
    """Is the tuple of join keys ``key_strs`` (exprId-qualified
    ``toString`` forms) provably UNIQUE per output row of this plan
    subtree?  True only when the rows are produced by an aggregate
    (groupBy/dropDuplicates both compile to *Aggregate nodes) whose
    grouping expressions are a SUBSET of the join keys — grouping ⊆
    keys ⇒ one row per grouping tuple ⇒ at most one row per join-key
    tuple — reached through unary nodes that cannot multiply rows
    (:data:`_UNIQ_PASS_PREFIXES`).  Attribute matching is by
    exprId-qualified string, so any aliasing on the path fails CLOSED
    (returns False), never open."""
    name = node.nodeName()
    if any(m in name for m in _AGG_NODE_MARKERS):
        try:
            grouping = _expr_strs(node.groupingExpressions())
        except Exception:
            return False
        return grouping.issubset(key_strs)
    kids = _jchildren(node)
    if len(kids) != 1:
        return False
    if not name.startswith(_UNIQ_PASS_PREFIXES):
        return False
    return _keys_unique_below(kids[0], key_strs)


def _input_bounded(node) -> bool:
    """Is this plan subtree's OUTPUT row count visibly bounded by a
    limit? Structural recursion (not "any Limit anywhere below" — a
    limit in one branch of a join must not green-light a window fed by
    the join's unbounded other branch):

    - a Limit-class node (GlobalLimit/LocalLimit/CollectLimit/
      WindowGroupLimit/TakeOrderedAndProject) bounds its subtree;
    - an INNER equi-join accepts a bounded side only when the join key
      is provably UNIQUE on that side (:func:`_keys_unique_below`: a
      distinct-aggregate/top-k-distinct producer whose grouping keys
      are a subset of the join keys, reached through row-preserving
      nodes) — the round-9 fix of the accepted false negative, where
      a top-k frame with a DUPLICATED join key against an unbounded
      side has unbounded output; joins without extractable equi-keys
      (cross, nested-loop theta) require BOTH sides bounded;
    - left outer/semi/anti — the left side must be bounded; right
      outer — the right side; full outer — both;
    - any other node is bounded iff all its children are (unary
      pass-throughs inherit; leaves are unbounded).

    Residual assumption (now confined to the key-unique case): with k
    DISTINCT bounded-side keys the output is sum of the unbounded
    side's per-key match counts over those k keys — the k-keys
    enrichment shape.  A data distribution concentrating the unbounded
    side on the surviving keys is invisible to any structural check;
    the per-query plan tests and the scale-smoke ladder remain the
    backstop for that.
    """
    name = node.nodeName()
    if any(m in name for m in _LIMIT_NODE_MARKERS):
        return True
    if any(m in name for m in _AGG_NODE_MARKERS):
        # a GLOBAL aggregate (empty grouping) emits EXACTLY one row —
        # the broadcast-scalar attach shape (corpus total, high-water
        # mark) is bounded by construction and the rule is sound
        try:
            if node.groupingExpressions().isEmpty():
                return True
        except Exception:
            pass
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
            if lb and rb:
                return True
            try:
                lk = _expr_strs(node.leftKeys())
                rk = _expr_strs(node.rightKeys())
            except Exception:
                lk = rk = set()  # no equi-keys: cross/theta — need both
            if lb and lk and _keys_unique_below(kids[0], lk):
                return True
            if rb and rk and _keys_unique_below(kids[1], rk):
                return True
            return False
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


def exchange_arguments(text: str) -> list[str]:
    """Argument strings of every ``Exchange`` node in a FORMATTED plan
    text (``plan_text(df)``), in plan order — e.g.
    ``hashpartitioning(o_orderkey#1L, 32), ENSURE_REQUIREMENTS, ...``
    or ``SinglePartition, ENSURE_REQUIREMENTS, ...``.

    Lets plan tests count MAIN-LANE shuffles separately from the
    1-row ``SinglePartition`` exchange a scalar aggregate (e.g. the
    derived ``doc_offset`` / high-water-mark attach) plans — that
    exchange moves exactly one row per partition regardless of data
    size and is irrelevant to the shuffle-count posture the tests pin.
    """
    import re

    return re.findall(
        r"\(\d+\) Exchange[^\n]*\nInput[^\n]*\nArguments: ([^\n]+)", text
    )


def unbounded_bnlj_builds(df: DataFrame) -> list[str]:
    """``BroadcastNestedLoopJoin`` nodes whose BUILD side is not
    visibly row-bounded per :func:`_input_bounded`.

    A BNLJ against a bounded build side is the broadcast-scalar attach
    (``crossJoin(F.broadcast(one_row_aggregate))`` — e.g. the derived
    ``doc_offset`` MAX(key)+1 frame, a corpus total, a high-water
    mark): the build side is a GLOBAL aggregate that emits exactly one
    row by construction, so the "nested loop" is one comparison per
    probe row at any scale. A BNLJ whose build side is data-sized is
    an all-pairs product in disguise and must keep failing plan tests.

    Returns one descriptive string per offending node (empty = every
    BNLJ in the plan is a bounded-build scalar attach).
    """
    plan = df._jdf.queryExecution().sparkPlan()
    offenders: list[str] = []

    def visit(node) -> None:
        name = node.nodeName()
        if "BroadcastNestedLoopJoin" in name:
            kids = _jchildren(node)
            if len(kids) == 2:
                try:
                    side = node.buildSide().toString()
                except Exception:
                    side = "BuildRight"
                build = kids[1] if side == "BuildRight" else kids[0]
                if not _input_bounded(build):
                    offenders.append(node.simpleString(25))
            else:
                offenders.append(node.simpleString(25))
        for c in _jchildren(node):
            visit(c)

    visit(plan)
    return offenders
