"""Embedding-column preprocessing: L2 normalization + int8 quantization.

A training-data pipeline that carries an ``array<float>`` embedding column
needs two staple transforms before ANN indexing or storage:

- **L2 normalize** so cosine similarity degrades to a dot product (what
  the ANN operators in :mod:`.similarity` assume), and
- **scalar int8 quantization** (x → round(x/‖v‖·127)) which cuts the
  column to a quarter of its float32 footprint — at 100 TB the dominant
  storage/shuffle cost of an embedding table.

Everything is per-row array expressions — embarrassingly parallel, zero
shuffle, full whole-stage codegen. Cross-engine exactness: the squared-norm
is folded strictly left-to-right in BOTH engines (Spark ``aggregate`` ≙
DuckDB ``list_reduce`` over the same element order), every element is
widened float32→float64 (exact), and rounding is expressed as
``floor(x + 0.5)`` — a single IEEE-deterministic formula, unlike the
engines' differing ``round()`` tie policies. The norm is reported as
``floor(norm·1e6)`` so no decimal re-rounding is involved anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import (
    load_table_scaled,
    register_views,
)
from udacity_data_engineer_capstone_spark.registry import query

_QUANT_SCALE = 127.0

_NORMQ_ORACLE = f"""
WITH s AS (
  SELECT vec_id,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (a, b) -> a + b) AS sumsq,
         embedding
  FROM embeddings
),
n AS (
  SELECT vec_id, embedding,
         CASE WHEN sumsq > 0 THEN sqrt(sumsq) END AS norm
  FROM s
)
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS n_dims,
       CAST(floor(norm * 1000000) AS BIGINT) AS norm_e6,
       list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) / norm * {_QUANT_SCALE} + 0.5)
                   AS INT)) AS q
FROM n
"""


@query("emb_normalize_quantize", oracle=_NORMQ_ORACLE, tags=("embedding",))
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize each embedding and quantize to int8 range
    (round(x/‖v‖·127) per dimension, NULL for zero vectors)."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")
    sumsq = F.expr(
        "aggregate(embedding, CAST(0 AS DOUBLE),"
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return (
        emb.withColumn("sumsq", sumsq)
        .withColumn(
            "norm", F.when(F.col("sumsq") > 0, F.sqrt("sumsq"))
        )
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("n_dims"),
            F.floor(F.col("norm") * 1000000).cast("long").alias("norm_e6"),
            F.expr(
                "transform(embedding,"
                f" x -> CAST(floor(CAST(x AS DOUBLE) / norm * {_QUANT_SCALE}"
                " + 0.5) AS INT))"
            ).alias("q"),
        )
    )


# ---------------------------------------------------------------------------
# per-label centroids
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
SELECT label, dim,
       CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1000000 AS centroid
FROM (
  SELECT label,
         unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
)
GROUP BY label, dim
"""


@query("emb_label_centroids", oracle=_CENTROID_ORACLE, tags=("embedding", "agg"))
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroid, dimension-wise — the nearest-
    class-mean classifier / cluster-profile primitive. Elements are
    integer-quantized (µ-units) *before* summing so the aggregate is
    fold-order exact; the mean is one double division at the end. The
    posexplode fans 64 rows per vector into a (label, dim)-keyed
    partial-aggregated shuffle — at 100 TB the map-side combine reduces
    each task's output to |labels|·64 rows regardless of input size."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("dim", "xq"),
    )
    return (
        ex.groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(
            F.sum("xq").alias("sum_e6"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .withColumn(
            "centroid",
            F.col("sum_e6").cast("double") / F.col("n_vectors") / 1000000,
        )
    )


# ---------------------------------------------------------------------------
# matryoshka truncation
# ---------------------------------------------------------------------------

MRL_DIMS = 16

_MRL_ORACLE = f"""
WITH emb AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sums AS (
  SELECT vec_id,
         list_sum(list_transform(v[1:{MRL_DIMS}], x -> x * x)) AS ss16,
         list_sum(list_transform(v, x -> x * x)) AS ss64
  FROM emb
)
SELECT vec_id,
       CAST({MRL_DIMS} AS INT) AS kept_dims,
       CASE WHEN ss64 > 0
            THEN CAST(FLOOR(1000000 * (ss16 / ss64)) AS BIGINT) END
         AS energy_e6
FROM sums
"""


@query("emb_matryoshka_energy", oracle=_MRL_ORACLE, tags=("embeddings",))
def emb_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation audit: the fraction of each vector's
    L2 energy retained by its first ``MRL_DIMS`` dimensions — the number
    that tells you whether serving can use the short prefix instead of
    the full vector. Pure column expressions (slice + widened left-fold
    sum of squares, one IEEE divide, floor-quantized), so both engines
    agree bit-for-bit and the op is a map-only pass at any scale."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")
    fold = "aggregate({0}, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    ss16 = F.expr(fold.format(f"slice(embedding, 1, {MRL_DIMS})"))
    ss64 = F.expr(fold.format("embedding"))
    return emb.select(
        "vec_id",
        F.lit(MRL_DIMS).cast("int").alias("kept_dims"),
        F.when(
            ss64 > 0, F.floor(F.lit(1000000) * (ss16 / ss64)).cast("long")
        ).alias("energy_e6"),
    )


# ---------------------------------------------------------------------------
# PCA top component via integer power iteration
# ---------------------------------------------------------------------------
#
# The leading principal direction of the embedding cloud (un-centered
# Gram PCA), computed so that Spark and DuckDB agree BITWISE despite
# being an iterative numeric algorithm: vectors are quantized to int64
# milli-units, the 64×64 Gram matrix A = QᵀQ is exact integer sums, and
# each power-iteration step v ← (A·v) with L∞ fixed-point rescale
# (x * 1000 div max|x|) is pure int64 arithmetic. Truncating division
# is matched explicitly (Spark DIV truncates toward zero; DuckDB // is
# floor, so the oracle wraps negatives in a sign-split CASE).
#
# Headroom: |q| ≤ 500 ⇒ |A| ≤ 2.5e5·n, A·v ≤ 64·|A|·1000 ≈ 1.6e13 at
# n = 1e6 rows — comfortably int64 to corpus sizes ~1e8 vectors.

_PCA_ITERS = 8
_PCA_DIM = 64

_PCA_Q_CTE = """
q AS MATERIALIZED (
  SELECT vec_id, u.i, CAST(floor(CAST(u.x AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qx
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i) u
),
gram AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS a_ij
  FROM q a JOIN q b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
),
v0 AS MATERIALIZED (
  SELECT i, CAST(1000 AS BIGINT) AS vx FROM range(1, 65) t(i)
)
"""

# one iteration: mv = A·v, then L∞ fixed-point rescale with
# truncation-toward-zero division on both engines
_PCA_STEP = """
mv{i} AS MATERIALIZED (
  SELECT g.i, CAST(SUM(g.a_ij * v.vx) AS BIGINT) AS mx
  FROM gram g JOIN v{prev} v ON v.i = g.j
  GROUP BY g.i
),
m{i} AS MATERIALIZED (SELECT MAX(ABS(mx)) AS mm FROM mv{i}),
v{i} AS MATERIALIZED (
  SELECT i,
         CASE WHEN mx >= 0 THEN (mx * 1000) // mm
              ELSE -((-mx * 1000) // mm) END AS vx
  FROM mv{i}, m{i}
)
"""


def _pca_oracle() -> str:
    ctes = [_PCA_Q_CTE]
    for t in range(1, _PCA_ITERS + 1):
        ctes.append(_PCA_STEP.format(i=t, prev=t - 1))
    return (
        "WITH "
        + ",".join(ctes)
        + f"SELECT CAST(i AS INT) AS dim, vx AS component_milli FROM v{_PCA_ITERS}"
    )


@query("emb_pca_power_iteration", oracle=_pca_oracle(), tags=("embedding", "iterative"))
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal direction of the embedding corpus by 8 rounds
    of integer power iteration over the exact int64 Gram matrix (see
    module comment for the quantization/headroom argument).

    Scale shape: the Gram build is the ONLY corpus-sized stage — an
    Arrow-batched ``mapInPandas`` that computes each batch's exact
    int64 ``QᵀQ`` as ONE vectorized numpy matmul and emits a single
    4096-cell partial per batch (the map-side-combine shape: the
    shuffle carries #batches × 4096 rows, never the corpus), summed by
    a final hash aggregate whose output is CONSTANT-sized regardless
    of corpus size. The naive alternative — explode to (vec, i, q) and
    self-join on vec_id — pushes n·d² rows through the aggregator;
    the matmul does the same multiply-adds inside BLAS and ships only
    partials, the classic distributed-covariance pattern. That matrix is
    then collected and the 8 power-iteration rounds run driver-local in
    exact integer arithmetic (the same bounded-fit pattern as the
    IVF/PQ samplers, except this collect is d² = constant, not even
    sampled): iterating a 64×64 matrix through distributed joins buys
    nothing at ANY corpus size — every round's input is the same
    constant-size frame — and costs a full job round-trip per step.
    This is how MLlib's PCA treats its covariance matrix too: cluster
    for the O(n·d²) moment build, driver for the O(d³) eigensolve.

    Exactness: Python ints are arbitrary-precision, and the documented
    headroom keeps every intermediate inside int64, so the driver-side
    fold computes bit-identical values to DuckDB's int64 CTE chain;
    truncation-toward-zero division is spelled out sign-split exactly
    as the oracle does."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")

    def _partial_gram(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((_PCA_DIM, _PCA_DIM), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # identical quantization to the oracle: floor(x*1000 + 0.5)
            qm = np.floor(x * 1000.0 + 0.5).astype(np.int64)
            acc += qm.T @ qm  # exact: |q|≤~1500 ⇒ batch sums ≪ 2^63
            seen = True
        if seen:
            ii, jj = np.meshgrid(
                np.arange(1, _PCA_DIM + 1), np.arange(1, _PCA_DIM + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "p_ij": acc.ravel()}
            )

    gram_rows = (
        emb.select("embedding")
        .mapInPandas(_partial_gram, schema="i int, j int, p_ij long")
        .groupBy("i", "j")
        .agg(F.sum("p_ij").alias("a_ij"))
        .collect()  # constant 64×64 = 4096 rows at any corpus size
    )
    a = {(r["i"], r["j"]): r["a_ij"] for r in gram_rows}
    v = [1000] * _PCA_DIM  # v[k] is component for dim k+1
    for _ in range(_PCA_ITERS):
        mv = [
            sum(a.get((i, j), 0) * v[j - 1] for j in range(1, _PCA_DIM + 1))
            for i in range(1, _PCA_DIM + 1)
        ]
        mm = max(abs(m) for m in mv)
        # truncation toward zero, matching Spark DIV / the oracle's CASE
        v = [
            (m * 1000) // mm if m >= 0 else -((-m * 1000) // mm)
            for m in mv
        ]
    return spark.createDataFrame(
        [(i + 1, vx) for i, vx in enumerate(v)], schema="dim int, component_milli long"
    )


# ---------------------------------------------------------------------------
# pairwise-cosine histogram (embedding-space calibration)
# ---------------------------------------------------------------------------

# A deterministic ~1% sample of the pair space ((a*31 + b) % 97 == 0)
# keeps the work quadratic-but-tiny and IDENTICAL in both engines; the
# cosine kernel is the same float→double-widened linear fold the dedup
# op uses, and bucketing floor(cos*10) maps the same doubles to the
# same bins everywhere.
_COSHIST_ORACLE = """
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.v AS va, b.v AS vb
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE (a.vec_id * 31 + b.vec_id) % 97 = 0
),
cos AS (
  SELECT list_sum(list_transform(range(1, 65), i -> va[i] * vb[i]))
         / (sqrt(list_sum(list_transform(va, x -> x * x)))
            * sqrt(list_sum(list_transform(vb, x -> x * x)))) AS c
  FROM pairs
)
SELECT CAST(floor(c * 10) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(c) AS min_cos,
       MAX(c) AS max_cos
FROM cos
GROUP BY 1
"""


@query("emb_cosine_histogram", oracle=_COSHIST_ORACLE, tags=("embedding", "stats"))
def emb_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of pairwise cosines over a deterministic ~1% pair
    sample — the calibration curve that tells you where to set dedup /
    retrieval thresholds for THIS embedding model. The sampled pair
    join is id-arithmetic-gated (same subset in both engines).

    Scale shape: the mod-97 gate ``(a*31 + b) % 97 == 0`` is expressed
    as an *equi-join key* — ``pmod(-31*a, 97) == pmod(b, 97)`` is the
    same congruence — so Spark hash-partitions the pair space 97 ways
    (sort-merge/shuffled-hash join, plan-pinned no-cartesian in
    tests/test_plans.py) instead of running a broadcast-nested-loop
    over all n² pairs and filtering after. The ``a < b`` dedup stays a
    join residual."""
    emb = load_table_scaled(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    a = emb.withColumn("ra", F.pmod(F.col("vec_id") * -31, F.lit(97))).alias("a")
    b = emb.withColumn("rb", F.pmod(F.col("vec_id"), F.lit(97))).alias("b")
    pairs = a.join(
        b,
        (F.col("a.ra") == F.col("b.rb"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    na = F.sqrt(F.expr("aggregate(transform(a.v, x -> x * x), 0D, (acc, x) -> acc + x)"))
    nb = F.sqrt(F.expr("aggregate(transform(b.v, x -> x * x), 0D, (acc, x) -> acc + x)"))
    cos = (dot / (na * nb)).alias("c")
    return (
        pairs.select(cos)
        .groupBy(F.floor(F.col("c") * 10).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("min_cos"),
            F.max("c").alias("max_cos"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup-style centroid pruning
# ---------------------------------------------------------------------------

# All-integer cosine gate at tau = 0.3, compared as
# 100·num² ≥ 9·|v|²·|c|²  (0.3² = 9/100) — exact rational, no sqrt.
# (tau is one constant: the synthetic test embeddings are diffuse — max
# centroid cosine ≈ 0.46 — so 0.3 exercises both branches; production
# SemDeDup on L2-normalized model embeddings runs the same gate at
# ≈0.95, i.e. 400·num² ≥ 361·|v|²·|c|², still inside int64.)
# Quantization is milli-units (|xq| ≤ 1000 for unit-scale embeddings):
# num ≤ 64e6, so 400·num² ≤ 1.6e18 and 361·|v|²·|c|² ≤ 1.5e18 — both
# inside int64. The centroid element is floor(mean) in DOUBLE (exact
# below 2^53, and floor — not DIV — because sums go negative and
# truncation semantics differ between engines).

_SEMDEDUP_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS xq,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
),
sums AS (
  SELECT label, dim, CAST(SUM(xq) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ex GROUP BY label, dim
),
cent AS (
  SELECT label, dim,
         CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c
  FROM sums
),
normc AS (SELECT label, CAST(SUM(c * c) AS BIGINT) AS nc FROM cent GROUP BY label),
pv AS (
  SELECT e.vec_id, e.label,
         CAST(SUM(e.xq * c.c) AS BIGINT) AS num,
         CAST(SUM(e.xq * e.xq) AS BIGINT) AS nv
  FROM ex e JOIN cent c ON c.label = e.label AND c.dim = e.dim
  GROUP BY e.vec_id, e.label
),
flags AS (
  SELECT p.vec_id, p.label, p.num,
         CAST(p.num > 0 AND 100 * p.num * p.num >= 9 * p.nv * n2.nc
              AS BOOLEAN) AS near
  FROM pv p JOIN normc n2 ON n2.label = p.label
),
rep AS (
  SELECT label, MIN(CASE WHEN near THEN vec_id END) AS min_near
  FROM flags GROUP BY label
)
SELECT f.vec_id, f.label, f.num AS cos_num_q, f.near,
       CAST((NOT f.near) OR f.vec_id = r.min_near AS BOOLEAN) AS keep
FROM flags f JOIN rep r ON r.label = f.label
"""


@query(
    "curate_semdedup",
    oracle=_SEMDEDUP_ORACLE,
    tags=("curation", "embedding", "dedup"),
)
def curate_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): inside each
    embedding cluster (label), vectors whose cosine to the cluster
    centroid clears τ (0.3 here; see gate note) are semantic near-duplicates of the cluster
    core — keep one representative (min vec_id) and drop the rest;
    peripheral vectors all survive. The cheap high-recall companion to
    pairwise `dedup_embedding_cosine` when clusters are already known.

    Scale shape: the centroid build is the `emb_label_centroids`
    partial-aggregated (label, dim) shuffle; scoring joins each
    exploded vector against the broadcast-sized centroid table
    (|labels|·64 rows) and re-aggregates per vec_id — two map-side-
    combining passes, no pairwise joins anywhere. The cosine gate is
    exact integer arithmetic (milli-quantized, τ² as an integer rational), so
    the keep/drop decisions are bit-identical cross-engine."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            )
        ).alias("dim", "xq"),
    ).select("vec_id", "label", F.col("dim").cast("long").alias("dim"), "xq")
    sums = ex.groupBy("label", "dim").agg(
        F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cent = sums.select(
        "label",
        "dim",
        F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("c"),
    )
    normc = cent.groupBy("label").agg(F.sum(F.col("c") * F.col("c")).alias("nc"))
    pv = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("xq") * F.col("c")).alias("num"),
            F.sum(F.col("xq") * F.col("xq")).alias("nv"),
        )
    )
    flags = pv.join(F.broadcast(normc), "label").select(
        "vec_id",
        "label",
        F.col("num").alias("cos_num_q"),
        (
            (F.col("num") > 0)
            & (
                F.lit(100) * F.col("num") * F.col("num")
                >= F.lit(9) * F.col("nv") * F.col("nc")
            )
        ).alias("near"),
    )
    w = Window.partitionBy("label")
    return flags.select(
        "vec_id",
        "label",
        "cos_num_q",
        "near",
        (
            (~F.col("near"))
            | (
                F.col("vec_id")
                == F.min(F.when(F.col("near"), F.col("vec_id"))).over(w)
            )
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (signed ±1, md5-derived)
# ---------------------------------------------------------------------------

# 64-dim -> 16-dim sign-matrix projection (Achlioptas: ±1 entries
# preserve pairwise distances in expectation like Gaussians do, at
# integer cost). Signs derive from md5 parity — engine-neutral and
# reproducible — and are baked identically into the Spark-side numpy
# matrix and the generated oracle SQL, so the projected integers match
# bit-for-bit. Quantization first (milli-units), then exact int64
# accumulation: |q| <= ~1500 ⇒ |p_j| <= 64·1500 ≪ 2^63.
_RP_DIM = 64
_RP_OUT = 16


def _rp_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[-1], 16) % 2
            == 0
            else -1
            for j in range(_RP_OUT)
        ]
        for i in range(_RP_DIM)
    ]


_RP_SIGN_MATRIX = _rp_signs()


def _rp_oracle() -> str:
    cols = []
    for j in range(_RP_OUT):
        terms = " ".join(
            ("+" if _RP_SIGN_MATRIX[i][j] > 0 else "-") + f" q[{i + 1}]"
            for i in range(_RP_DIM)
        )
        cols.append(f"CAST(0 {terms} AS BIGINT) AS p{j:02d}")
    col_sql = ",\n       ".join(cols)
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
)
SELECT vec_id,
       {col_sql}
FROM q
"""


@query("emb_random_projection", oracle=_rp_oracle(), tags=("embedding",))
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64→16 dims with a deterministic ±1 sign
    matrix — the dimensionality-reduction step a 100 TB embedding lake
    runs before indexing/clustering when 4x less vector IO matters more
    than the last few recall points (cf. ``emb_matryoshka_energy`` for
    the learned-truncation alternative).

    Scale shape: ONE Arrow-batched pandas matmul per batch (the
    ``sim_ann_lsh`` bucketing shape) — narrow map, no shuffle, no
    driver participation; output is 17 integer columns per vector.

    Determinism: milli-quantize then exact int64 matmul against the
    md5-parity sign matrix; the oracle unrolls the identical +/- sums
    per output dim."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")

    def _project(batches):
        import numpy as np
        import pandas as pd

        s = np.array(_RP_SIGN_MATRIX, dtype=np.int64)  # (dim, out)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
            p = q @ s  # exact int64
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for j in range(_RP_OUT):
                out[f"p{j:02d}"] = p[:, j]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"p{j:02d} long" for j in range(_RP_OUT)
    )
    return emb.select("vec_id", "embedding").mapInPandas(_project, schema=schema)


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd's algorithm, exact integer lanes)
# ---------------------------------------------------------------------------

# Unlike sim_ann_ivf (whose cells fit on a bounded driver SAMPLE), this
# is the full distributed Lloyd iteration: every assignment pass sees
# every vector. Exactness: vectors quantize to milli-units once;
# squared-L2 distances are exact int64 (|q| <= ~1500 ⇒ d <= 64·3000² ≪
# 2^63); ties break to the smallest centroid id; centroid updates are
# floor(double) per dimension on <2^53 numerators. A centroid that
# loses all members drops out (both engines assign only against
# existing centroids), which keeps the unrolled SQL and the DataFrame
# loop in lockstep.
_KM_K = 8
_KM_ITERS = 2
_KM_DIM = 64


def km_ctes(k: int, iters: int, p: str = "") -> list[str]:
    """Unrolled exact-integer Lloyd CTEs (DuckDB SQL) — the oracle twin
    of :func:`int_lloyd`; the two must stay in lockstep. ``p`` prefixes
    every CTE name so callers (the deterministic-trained ANN eval)
    can embed a Lloyd chain beside other CTE chains in one statement.
    The quantize CTE is ``{p}q``; the final centroid arrays are
    ``{p}c{iters}``; the final update table is ``{p}e{iters}``."""
    ctes = [
        f"""{p}q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
)""",
        f"{p}c0 AS (SELECT vec_id AS cid, q AS c FROM {p}q WHERE vec_id < {k})",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""{p}a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT q.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, {_KM_DIM + 1}),
                        j -> (q.q[j] - c.c[j]) * (q.q[j] - c.c[j]))), c.cid)
             AS rn
    FROM {p}q q CROSS JOIN {p}c{i - 1} c
  ) t WHERE rn = 1
)""")
        ctes.append(
            f"""{p}e{i} AS (
  SELECT a.cid, u.j,
         CAST(floor(CAST(SUM(q.q[u.j]) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS c_milli,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM {p}a{i} a JOIN {p}q q ON q.vec_id = a.vec_id,
       LATERAL (SELECT unnest(range(1, {_KM_DIM + 1})) AS j) u
  GROUP BY a.cid, u.j
)""")
        ctes.append(
            f"""{p}c{i} AS (
  SELECT cid, list(c_milli ORDER BY j) AS c
  FROM {p}e{i} GROUP BY cid
)""")
    return ctes


def _km_oracle() -> str:
    return (
        "WITH "
        + ",\n".join(km_ctes(_KM_K, _KM_ITERS))
        + f"""
SELECT cid AS centroid_id, CAST(j AS BIGINT) AS dim, c_milli, n_members
FROM e{_KM_ITERS}
"""
    )


@query("emb_kmeans_lloyd", oracle=_km_oracle(), tags=("embedding", "iterative"))
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus (k=8, 2
    synchronous rounds, first-8 seeding): the full-data clustering pass
    a corpus runs when the IVF sample fit isn't enough. Output is the
    long-format centroid table (centroid, dim, coordinate, member
    count).

    Scale shape per round: assignment is ONE Arrow-batched pandas UDF
    holding the k x d centroid matrix (constant-size, collected like
    the PCA Gram — k·d integers, not data) and computing all distances
    as a single int64 matmul — narrow map, no shuffle. The update is
    one (centroid, dim) hash aggregate with map-side partials (shuffle
    carries k·d partials per task, never vectors). The oracle unrolls
    the identical rounds as CTEs.

    Determinism: exact integer distances with smallest-id tie-break
    (numpy argmin picks the first minimum = smallest cid because the
    matrix rows are ordered by cid), floor(double) centroid updates."""
    emb = load_table_scaled(spark, sf_dir, "embeddings")
    q = milli_quantize(emb).localCheckpoint()
    _cents, last_update = int_lloyd(q, _KM_K, _KM_ITERS)

    return last_update.select(
        F.col("cid").alias("centroid_id"),
        F.col("j").cast("long").alias("dim"),
        "c_milli",
        "n_members",
    )


def milli_quantize(emb: DataFrame) -> DataFrame:
    """(vec_id, q: array<bigint>) — embeddings milli-quantized to exact
    integers, the shared lane of every exact-arithmetic vector op
    (Lloyd, the deterministic-trained ANN eval tiers)."""
    return emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
        ).alias("q"),
    )


def int_lloyd_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """One exact-int64 Lloyd assignment pass: (vec_id, cid) of each
    vector's nearest centroid with smallest-cid tie-break. The k×d
    centroid coordinates are a constant-size driver fetch (the
    PCA-Gram pattern); assignment is ONE Arrow-batched int64 matmul —
    narrow map, no shuffle."""
    cent_rows = sorted(
        ((r["cid"], list(r["c"])) for r in cents.collect()),
        key=lambda t: t[0],
    )
    cids = [c for c, _ in cent_rows]

    def _assign(batches, _cent_rows=cent_rows, _cids=cids):
        import numpy as np
        import pandas as pd

        cmat = np.array([v for _, v in _cent_rows], dtype=np.int64)
        cnorm = (cmat * cmat).sum(axis=1)  # (k,)
        cid_arr = np.array(_cids, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            d = (
                (qm * qm).sum(axis=1, keepdims=True)
                - 2 * (qm @ cmat.T)
                + cnorm[None, :]
            )  # exact int64 squared L2
            pick = cid_arr[np.argmin(d, axis=1)]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cid": pick}
            )

    return q.mapInPandas(_assign, schema="vec_id long, cid long")


def int_lloyd(q: DataFrame, k: int, iters: int):
    """The exact-integer Lloyd round machinery (first-k seeding,
    smallest-cid tie-break, floor(double) centroid updates) shared by
    ``emb_kmeans_lloyd`` and the deterministic-trained ANN eval's IVF
    tier. Returns ``(cents, last_update)``: the centroid-array table
    after the final round and the long-format (cid, j, c_milli,
    n_members) update table that produced it. Its unrolled-SQL twin is
    :func:`_km_ctes` — the two must stay in lockstep."""
    cents = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    last_update = None
    for _ in range(iters):
        assigned = int_lloyd_assign(q, cents)
        upd = (
            assigned.join(q, "vec_id")
            .select("cid", F.posexplode("q").alias("j0", "qv"))
            .groupBy("cid", (F.col("j0") + 1).alias("j"))
            .agg(
                F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("c_milli"),
                F.count(F.lit(1)).cast("long").alias("n_members"),
            )
        ).localCheckpoint()
        cents = upd.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(j, c_milli))),"
                " s -> s.c_milli)"
            ).alias("c")
        )
        last_update = upd
    return cents, last_update


def lloyd_fit(
    df: DataFrame,
    k: int,
    iters: int = 5,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Distributed Lloyd's k-means FIT returning only the k×d centroid
    list to the driver — the ``emb_kmeans_lloyd`` round machinery
    exposed for index-training callers (``sim_ann_ivf``'s coarse
    quantizer trains through this instead of collecting a data
    sample). Per round: assignment is one Arrow-batched ``mapInPandas``
    against the closed-over k×d centroid matrix (narrow map, no
    shuffle); the update is one (cell, dim) hash aggregate with
    map-side partials. The ONLY rows that ever reach the driver are
    the k seed vectors and the k×d centroid coordinates per round —
    never a data sample, so driver residency is O(k·d) regardless of
    table size or embedding width. Seeding: the k lowest-id vectors
    (deterministic). A cell that loses all members keeps its previous
    centroid (a fit detail; the exact-arithmetic query variant drops
    it to stay in lockstep with its unrolled SQL oracle)."""
    q = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint()
    cents = [list(map(float, r.v)) for r in q.orderBy("vec_id").limit(k).collect()]
    dim = len(cents[0])

    for _ in range(iters):
        cent_list = [list(c) for c in cents]

        def _fit_partials(batches, _c=cent_list, _k=k):
            """Assign AND pre-reduce in one Arrow pass: per input
            partition, yield one (cell, n, sums) partial per non-empty
            cell — the PCA-Gram pattern, so the shuffle carries
            #partitions × k rows of d-wide arrays, never the corpus
            (the join+posexplode spelling shuffled n×d rows/round:
            sim_ann_ivf 1.7 → 6.2 s in the r5 bench until this)."""
            import numpy as np
            import pandas as pd

            cmat = np.asarray(_c, dtype=np.float64)
            cn = (cmat * cmat).sum(axis=1)
            dimn = cmat.shape[1]
            sums = np.zeros((_k, dimn))
            counts = np.zeros(_k, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                d = (
                    (V * V).sum(axis=1, keepdims=True)
                    - 2 * (V @ cmat.T)
                    + cn[None, :]
                )
                a = np.argmin(d, axis=1)
                np.add.at(sums, a, V)
                counts += np.bincount(a, minlength=_k)
            live = np.nonzero(counts)[0]
            if len(live):
                yield pd.DataFrame(
                    {
                        "cell": live.astype("int32"),
                        "n": counts[live],
                        "sums": [list(map(float, sums[c])) for c in live],
                    }
                )

        upd = (
            q.mapInPandas(_fit_partials, schema="cell int, n long, sums array<double>")
            .select("cell", "n", F.posexplode("sums").alias("j", "x"))
            .groupBy("cell", "j")
            .agg(F.sum("x").alias("sx"), F.sum("n").alias("cnt"))
            .collect()  # k×d rows — constant-size driver fetch
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r.cell, {})[r.j] = r.sx / r.cnt
        cents = [
            [by_cell[c][j] for j in range(dim)] if c in by_cell else cents[c]
            for c in range(k)
        ]
    return cents


# ---------------------------------------------------------------------------
# embedding drift: centroid shift between two ingestion cohorts
# ---------------------------------------------------------------------------

# Cosine is scale-invariant, so we compare per-label SUM vectors (exact
# micro-unit integers) instead of mean vectors — no division ever
# happens before the one final cosine expression. The per-dim sums
# stay exact BIGINT (headroom ~9e12 vectors/label at 1e6
# quantization); the dot/norm ACCUMULATIONS run in DOUBLE, which has
# no overflow cliff — sa*sb would wrap int64 past ~3e5 vectors per
# label-cohort, and cosine tolerates the ~1e-14 relative float error
# (dims-count terms per label) with a 1e-3 output quantum.
_DRIFT_TEMPLATE = """
WITH parts AS (
  SELECT label,
         CAST(vec_id % 2 AS BIGINT) AS cohort,
         {DIM_COL} AS dim,
         CAST(floor(CAST({X_COL} AS DOUBLE) * 1000000) AS BIGINT) AS x_e6
  FROM {UNNESTED}
),
sums AS (
  SELECT label, cohort, dim,
         CAST(SUM(x_e6) AS BIGINT) AS s
  FROM parts GROUP BY label, cohort, dim
),
paired AS (
  SELECT a.label, a.dim, a.s AS sa, b.s AS sb
  FROM sums a JOIN sums b
    ON a.label = b.label AND a.dim = b.dim
   AND a.cohort = 0 AND b.cohort = 1
),
dots AS (
  SELECT label,
         SUM(CAST(sa AS DOUBLE) * sb) AS dot,
         SUM(CAST(sa AS DOUBLE) * sa) AS na2,
         SUM(CAST(sb AS DOUBLE) * sb) AS nb2
  FROM paired GROUP BY label
),
counts AS (
  SELECT label,
         CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b
  FROM embeddings GROUP BY label
)
SELECT d.label, c.n_a, c.n_b,
       CAST(FLOOR(
         CAST(d.dot AS DOUBLE) / SQRT(CAST(d.na2 AS DOUBLE) * d.nb2) * 1000
       ) AS BIGINT) AS centroid_cos_milli,
       CAST(d.dot AS DOUBLE) / SQRT(CAST(d.na2 AS DOUBLE) * d.nb2) < 0.95
         AS drift_detected
FROM dots d JOIN counts c ON c.label = d.label
"""

_DRIFT_ORACLE = _DRIFT_TEMPLATE.format(
    DIM_COL="dim",
    X_COL="x",
    UNNESTED="(SELECT label, vec_id, unnest(embedding) AS x,"
    " unnest(range(0, len(embedding))) AS dim FROM embeddings)",
)


@query(
    "emb_drift_centroid_shift",
    oracle=_DRIFT_ORACLE,
    tags=("embedding", "quality"),
)
def emb_drift_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split each label's vectors
    into two deterministic cohorts (old/new ingestion halves stand-in:
    vec_id parity), compare per-label centroid DIRECTIONS via cosine.
    Cosine is scale-invariant, so the comparison runs on exact integer
    SUM vectors — means are never materialized and no float is summed.
    A label whose cohorts' centroids diverge below 0.95 cosine is the
    retrain/recalibrate trigger every vector-index deployment monitors.

    Scale shape: one posexplode + hash aggregate keyed by
    (label, cohort, dim) — map-side combinable, output is
    labels × dims × 2 rows (model-sized); everything after is
    label-sized. The only data-sized pass is the explode scan."""
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(
        _DRIFT_TEMPLATE.format(
            DIM_COL="dim",
            X_COL="x",
            UNNESTED="(SELECT label, vec_id, pe.dim, pe.x FROM embeddings"
            " LATERAL VIEW posexplode(embedding) pe AS dim, x) AS t",
        )
    )


# ---------------------------------------------------------------------------
# embedding outlier score: diagonal Mahalanobis against the corpus
# ---------------------------------------------------------------------------

# Per-dimension mean/variance from one exploded moment aggregate
# (exact micro-unit integers), joined back onto the exploded vectors
# and re-aggregated per vector — no driver collect, no broadcast of
# raw data. The per-dim standardized squares are quantized to exact
# integers before the per-vector sum (fold-order exact).
_EMB_OUTLIER_TEMPLATE = """
WITH parts AS (
  SELECT vec_id, {DIM} AS dim,
         CAST(floor(CAST({X} AS DOUBLE) * 1000000) AS BIGINT) AS x_e6
  FROM {UNNESTED}
),
dimstats AS (
  SELECT dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_e6) AS BIGINT) AS s,
         CAST(SUM(x_e6 * x_e6) AS BIGINT) AS q
  FROM parts GROUP BY dim
),
scored AS (
  SELECT p.vec_id,
         CAST(FLOOR(
           (p.x_e6 - CAST(d.s AS DOUBLE) / d.n)
           * (p.x_e6 - CAST(d.s AS DOUBLE) / d.n)
           / ((CAST(d.q AS DOUBLE) - CAST(d.s AS DOUBLE) * d.s / d.n)
              / (d.n - 1))
           * 1000) AS BIGINT) AS z2_milli
  FROM parts p JOIN dimstats d ON d.dim = p.dim
)
SELECT vec_id,
       CAST(SUM(z2_milli) AS BIGINT) AS mahalanobis2_milli,
       SUM(z2_milli) > 2 * 64 * 1000 AS outlier_flag
FROM scored
GROUP BY vec_id
"""

_EMB_OUTLIER_ORACLE = _EMB_OUTLIER_TEMPLATE.format(
    DIM="dim",
    X="x",
    UNNESTED="(SELECT vec_id, unnest(embedding) AS x,"
    " unnest(range(0, len(embedding))) AS dim FROM embeddings)",
)


@query("emb_outlier_score", oracle=_EMB_OUTLIER_ORACLE, tags=("embedding", "quality"))
def emb_outlier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier audit: diagonal-Mahalanobis distance of every
    vector from the corpus distribution (per-dimension standardized
    squares, summed) — the cheap detector for corrupt, zeroed, or
    off-manifold vectors before they poison an ANN index. Flag fires
    at 2× the expected value (≈ dims for in-distribution vectors).
    Per-dim stats come from one exploded moment aggregate joined back
    — no driver collect, no raw-vector broadcast.

    Scale shape: two posexplode passes (stats, scoring) + one
    vector-keyed sum; the dim-stats side is dims-sized and
    broadcasts."""
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(
        _EMB_OUTLIER_TEMPLATE.format(
            DIM="dim",
            X="x",
            UNNESTED="(SELECT vec_id, pe.dim, pe.x FROM embeddings"
            " LATERAL VIEW posexplode(embedding) pe AS dim, x) AS t",
        )
    )
