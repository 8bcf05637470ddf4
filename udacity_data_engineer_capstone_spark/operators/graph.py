"""Graph analytics over the order graph: iterative PageRank.

The customer–supplier purchase relation (who bought from whom, via
orders ⋈ lineitem) is a bipartite graph; PageRank over it scores
centrality — which suppliers anchor the network, which customers span
many suppliers. The same dataflow is how you rank domains in a crawl
graph when curating a pretraining corpus.

Determinism at the hash gate: classic PageRank is double arithmetic,
and a distributed SUM(double) is fold-order dependent — no two runs
(let alone two engines) agree bitwise. This implementation therefore
does the whole computation in **exact integer micro-units** (rank mass
scaled by 1e9): contributions are integer division ``r DIV deg``, the
damping step is ``(85 * Σ) DIV 100``, and integer sums are
fold-order-free, so Spark and DuckDB agree exactly, at any parallelism.
(Headroom: 85·N·SCALE must fit in int64 → fine to ~10^8 nodes at
SCALE=1e9; shrink SCALE for bigger graphs.)

Scale shape: each iteration is one equi-join of the static
(src, dst, deg) adjacency against the current rank vector plus one
partial+final integer aggregate — hash-width shuffles, no driver data
collect at all (fixed iteration count, no convergence scalar even).
``localCheckpoint`` per round truncates lineage so the plan stays O(1)
per iteration. The DuckDB oracle unrolls the same recurrence as chained
CTEs — identical integer semantics, declaratively.

Reference parity: the reference (``/root/reference/etl.py``) has no
graph stage; extension surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

ITERS = 6
SCALE = 1_000_000_000  # rank mass per node, in micro-units
BASE = 150_000_000  # (1 - d) * SCALE with damping d = 0.85

# Node ids: customers even (custkey*2), suppliers odd (suppkey*2+1).
# Edges are the distinct purchase pairs, symmetrized so the bipartite
# graph has no dangling nodes (every node has out-degree >= 1).
_GRAPH_CTES = """
edges AS (
  SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
bidir AS (SELECT s, d FROM edges UNION ALL SELECT d, s FROM edges),
deg AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM bidir GROUP BY s),
pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM deg)
"""

_PR_STEP = """
pr{i} AS (
  SELECT b.d AS node,
         {base} + (85 * CAST(SUM(p.r // g.deg) AS BIGINT)) // 100 AS r
  FROM bidir b
  JOIN pr{prev} p ON p.node = b.s
  JOIN deg g ON g.node = b.s
  GROUP BY b.d
)
"""


def _pagerank_oracle() -> str:
    ctes = [_GRAPH_CTES.format(scale=SCALE)]
    for i in range(1, ITERS + 1):
        ctes.append(_PR_STEP.format(i=i, prev=i - 1, base=BASE))
    return (
        "WITH "
        + ",".join(ctes)
        + f"SELECT node AS node_id, r AS pr_rank FROM pr{ITERS}"
    )


@query("graph_pagerank", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six damped PageRank iterations over the purchase graph in exact
    integer micro-units (see module docstring). The adjacency (src, dst,
    src-degree) is built once and checkpointed; each round joins it to
    the rank vector and re-aggregates. Rank mass ≈ conserved (modulo
    integer truncation), so high-degree suppliers surface with rank ≫
    SCALE."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("s"),
            (F.col("l_suppkey") * 2 + 1).alias("d"),
        )
        .distinct()
    )
    bidir = edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    deg = bidir.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    adj = (
        bidir.join(deg.withColumnRenamed("s", "node"), bidir["s"] == F.col("node"))
        .select("s", "d", "deg")
        .localCheckpoint(eager=False)  # static across rounds: scan once
    )
    ranks = deg.select(
        F.col("s").alias("node"), F.lit(SCALE).cast("long").alias("r")
    )
    for _ in range(ITERS):
        ranks = (
            adj.join(ranks, adj["s"] == ranks["node"])
            .select(F.col("d"), F.expr("r DIV deg").alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("mass"))
            .select(
                F.col("d").alias("node"),
                F.expr(f"CAST({BASE} + (85 * mass) DIV 100 AS BIGINT)").alias("r"),
            )
            .localCheckpoint(eager=False)  # O(1) lineage per round
        )
    return ranks.select(F.col("node").alias("node_id"), F.col("r").alias("pr_rank"))
