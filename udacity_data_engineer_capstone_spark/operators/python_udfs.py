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

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

_ZSCORE_ORACLE = """
SELECT event_id, event_type,
       ROUND((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
FROM events
"""


@query("udaf_grouped_zscore", oracle=_ZSCORE_ORACLE, tags=("udf", "python"))
def udaf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via ``applyInPandas``: each event type's group
    arrives as one pandas DataFrame (Arrow transfer), normalized in
    vectorized numpy. Shuffle is one hash partition per group key — the
    same shape as any aggregation; group size bounds worker memory, so
    keys with huge groups should pre-aggregate or salt first."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)
        # SQL NULL semantics: stddev_samp of a 1-row group is NULL (pandas
        # gives NaN), and a constant group would divide by zero
        if pd.isna(sd) or sd == 0:
            pdf = pdf.assign(z=pd.Series([None] * len(pdf), dtype="float64"))
        else:
            # fixed 4-dp output: pandas and SQL window folds differ in the
            # last ulps, so raw doubles would never hash-match cross-engine
            pdf = pdf.assign(z=((v - v.mean()) / sd).round(4))
        return pdf[["event_id", "event_type", "z"]]

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
