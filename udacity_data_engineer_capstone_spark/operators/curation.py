"""End-to-end training-corpus curation (north-star showcase).

Chains the pipeline a 100 TB pretraining-data run actually executes —
quality gate → exact dedup → near-dup removal — into one dataflow over
the planted-duplicate corpus, and verifies the whole chain against a
single DuckDB oracle. Every stage is a narrow, shuffle-bounded operator
from this package:

1. quality gate: token count threshold (pure projection+filter);
2. exact dedup: keep the min doc_id per md5(text) group — survivors via
   LEFT SEMI join against the keeper set;
3. near-dup removal: MinHash-LSH verified pairs (a_id < b_id), dropping
   every b_id via LEFT ANTI join — the deterministic "keep the earliest"
   policy.

Semi/anti joins keep the document rows on one side only — the keeper and
pair sets that cross the shuffle are id-width, never text-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.operators.dedup import (
    CORPUS_CTE,
    _MINHASH_ORACLE,
    corpus,
    dedup_exact,
    dedup_minhash_lsh,
)
from udacity_data_engineer_capstone_spark.registry import query

MIN_TOKENS = 20

_CURATE_ORACLE = f"""
WITH {CORPUS_CTE},
q AS (
  SELECT doc_id, text,
         len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens
  FROM corpus
),
keepers AS (
  SELECT MIN(doc_id) AS keep_id FROM corpus GROUP BY md5(text)
),
pairs AS (
  {_MINHASH_ORACLE}
)
SELECT doc_id, n_tokens
FROM q
WHERE n_tokens >= {MIN_TOKENS}
  AND doc_id IN (SELECT keep_id FROM keepers)
  AND doc_id NOT IN (SELECT b_id FROM pairs)
"""


@query("curate_training_corpus", oracle=_CURATE_ORACLE, tags=("pipeline", "dedup"))
def curate_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → near-dup removal in one dataflow."""
    docs = corpus(spark, sf_dir).withColumn(
        "n_tokens", F.size(F.split(F.lower("text"), r"\s+"))
    )
    quality = docs.filter(F.col("n_tokens") >= MIN_TOKENS)

    # reuse the registered exact-dedup operator so the keep policy has a
    # single definition (any change there propagates here)
    keepers = dedup_exact(spark, sf_dir).select("keep_id")
    near_dup_losers = dedup_minhash_lsh(spark, sf_dir).select("b_id")

    return (
        quality.join(keepers, quality.doc_id == keepers.keep_id, "left_semi")
        .join(
            near_dup_losers,
            quality.doc_id == near_dup_losers.b_id,
            "left_anti",
        )
        .select("doc_id", "n_tokens")
    )
