"""The sanctioned Python-boundary shapes, demonstrated and verified.

The engine's rule (SCALE.md): native expressions wherever possible; when
Python is genuinely needed, only Arrow-batched forms — never row-at-a-time
UDFs. This module exercises the two shapes not covered elsewhere
(mapInPandas lives in multimodal, applyInPandasWithState in streaming):

- ``applyInPandas`` grouped-map: per-group pandas transform (z-score
  normalization per event type) — the custom-UDAF escape hatch;
- ``pandas_udf`` scalar: vectorized elementwise compute over Arrow
  batches (~10-100× over row-at-a-time Python UDFs).

Both carry DuckDB oracles: the pandas math must agree with the SQL
formulation to float tolerance, which keeps the Python path honest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table, register_views
from udacity_data_engineer_capstone_spark.registry import query

# Cross-engine bit-exactness without rounding: values quantize to exact
# 1e-4-unit integers, the group moments (n, Σc, Σc²) are exact integer
# sums, and every float op afterwards is the SAME IEEE expression tree
# in numpy and DuckDB — identical operands + identical op order =
# identical doubles, so raw z hashes match. (The previous version
# ROUNDed engine-divergent doubles to 4 dp: pandas rounds half-even,
# DuckDB half-away, so exact ties diverged — and the sd==0 NULL guard
# existed only on the pandas side.) Σc² stays within int64 for groups
# up to ~2×10⁸ rows at this value range; beyond that, widen to DECIMAL
# cents on both sides.
_ZSCORE_ORACLE = """
WITH g AS (
  SELECT event_id, event_type,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS c
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(c) AS DOUBLE) AS s,
         CAST(SUM(c * c) AS DOUBLE) AS q
  FROM g GROUP BY event_type
)
SELECT g.event_id, g.event_type,
       CASE WHEN m.n = 1 OR m.q - m.s * m.s / m.n <= 0 THEN NULL
            ELSE (CAST(g.c AS DOUBLE) - m.s / m.n)
                 / sqrt((m.q - m.s * m.s / m.n) / (m.n - 1.0))
       END AS z
FROM g JOIN m USING (event_type)
"""


@query("udaf_grouped_zscore", oracle=_ZSCORE_ORACLE, tags=("udf", "python"))
def udaf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via ``applyInPandas``: each event type's group
    arrives as one pandas DataFrame (Arrow transfer), normalized in
    vectorized numpy. Shuffle is one hash partition per group key — the
    same shape as any aggregation; group size bounds worker memory, so
    keys with huge groups should pre-aggregate or salt first.

    z is computed over values quantized to 1e-4 units from exact integer
    moments (see oracle note: bit-identical to the SQL formulation, and
    the sd=0 / single-row NULL guard is mirrored on both sides)."""
    import math

    import numpy as np

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(pdf["value"].to_numpy() * 10000.0 + 0.5).astype(np.int64)
        n = len(c)
        s_f = float(int(c.sum()))
        q_f = float(int((c * c).sum()))
        n_f = float(n)
        var_num = q_f - s_f * s_f / n_f
        if n == 1 or var_num <= 0:
            z = pd.Series([None] * n, dtype="float64")
        else:
            sd = math.sqrt(var_num / (n_f - 1.0))
            z = pd.Series((c.astype(np.float64) - s_f / n_f) / sd)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "event_type": pdf["event_type"].to_numpy(),
                "z": z.to_numpy(),
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


_SCALAR_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
FROM lineitem
"""


@query("udf_pandas_scalar", oracle=_SCALAR_ORACLE, tags=("udf", "python"))
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas scalar UDF over Arrow batches. (This particular
    formula belongs in a native expression — see the oracle — the query
    exists to verify the Arrow path end-to-end against it.)"""

    @F.pandas_udf("double")
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


# ---------------------------------------------------------------------------
# Python UDTF: fixed-size text chunking (Spark 4 table function)
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 20

# The oracle rebuilds the chunking relationally: words with subscripts,
# grouped by (i-1) // chunk_size, re-joined in order. Same tokens, same
# boundaries, same text — so the UDTF's row expansion is verified
# value-exact, not just by row count.
_CHUNK_ORACLE = f"""
WITH words AS (
  SELECT doc_id, u.w, u.i
  FROM documents, LATERAL (
    SELECT unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i) u
)
SELECT doc_id, CAST((i - 1) // {_CHUNK_TOKENS} AS INT) AS chunk_idx,
       string_agg(w, ' ' ORDER BY i) AS chunk_text,
       CAST(COUNT(*) AS INT) AS n_tokens
FROM words
GROUP BY doc_id, (i - 1) // {_CHUNK_TOKENS}
"""


@query("udtf_chunk_text", oracle=_CHUNK_ORACLE, tags=("udf", "python", "text"))
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking as a Spark 4 Python UDTF — the
    embedding-prep primitive (one row in, N chunk rows out, each ≤ 20
    whitespace tokens). A UDTF is the right shape when the expansion
    logic is imperative (overlap windows, sentence packing, markup-aware
    splits live here later); for THIS plain fixed-size split a lateral
    posexplode would also do — the op exists to pin the UDTF machinery
    end-to-end against a relational oracle.

    Scale shape: the UDTF is a narrow per-row map (no shuffle, no
    state); each worker expands its partition's rows independently and
    the output inherits the input partitioning."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class ChunkText:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split(" ")
            for ci in range(0, len(toks), _CHUNK_TOKENS):
                chunk = toks[ci : ci + _CHUNK_TOKENS]
                yield ci // _CHUNK_TOKENS, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_text", ChunkText)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
        "FROM documents d, LATERAL chunk_text(d.text) c"
    )
