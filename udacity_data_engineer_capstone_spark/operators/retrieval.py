"""Lexical retrieval scoring over the ``documents`` table: TF-IDF,
BM25, and unigram language-model log-probability (north-star extension;
the reference has no text surface — SURVEY §2.8).

These are the ranking/quality primitives of a training-data pipeline:
TF-IDF surfaces each document's most characteristic terms, BM25 ranks
documents against a query, and the unigram LM log-probability is the
cheapest fluency/perplexity filter (documents far below the corpus LM
are boilerplate or noise).

Cross-engine determinism: term/document frequencies and lengths are
exact BIGINTs from hash aggregates. The only transcendental is ``ln``,
which is NOT correctly rounded and can differ between JVM ``Math.log``
and libm in the last ulp — so every log-bearing score is quantized to
micro-units (``floor(x * 1e6)``) where a 1-ulp input wobble is ~1e-9 of
the grid step and cannot straddle a boundary on real data. All other
ops in the score trees (int→double casts, division, multiplication)
are IEEE-correctly-rounded, hence bit-identical.

Scale shape: tokenize = narrow per-row explode (no shuffle); the corpus
statistics (df table, vocabulary counts) are one hash aggregate whose
result is vocabulary-sized — tiny next to the corpus — and re-enter the
per-token stream via a broadcast-sized equi-join on the term. Nothing
here is quadratic in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import (
    load_table_scaled,
    register_views,
)
from udacity_data_engineer_capstone_spark.operators.ordinal import (
    global_rank_segments,
)
from udacity_data_engineer_capstone_spark.registry import query

# Whitespace tokenizer contract shared with text_tokens (operators/text.py):
# split on runs of whitespace, lowercase.
_TOKENS_CTE = """
tokens AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
)
"""

# micro-quantization grid for log-bearing scores (see module docstring)
_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# TF-IDF: top-5 characteristic terms per document
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH {_TOKENS_CTE},
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tokens GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tokens GROUP BY term
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tokens),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * {_MICRO})
              AS BIGINT) AS tfidf_micro
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf_micro,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_micro DESC, term) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS INT) AS rk, term, tfidf_micro
FROM ranked WHERE rk <= 5
"""


@query("text_tfidf_topterms", oracle=_TFIDF_ORACLE, tags=("text", "retrieval"))
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per document by TF-IDF — the classic "what is this
    document about" signal. tf and df come from two hash aggregates over
    the exploded token stream; idf re-enters via an equi-join on term
    (the df table is vocabulary-sized → Spark broadcasts it); the per-doc
    top-5 is a WindowGroupLimit-pushed rank. Scores are micro-quantized
    BIGINTs so the ln() is deterministic cross-engine; ties break on the
    term string for a total order."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = tokens.select(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.floor(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df"))
                * _MICRO
            ).alias("tfidf_micro"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "term", "tfidf_micro")
    )


# ---------------------------------------------------------------------------
# BM25: rank documents against a fixed query
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "query", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = f"""
WITH {_TOKENS_CTE},
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tokens GROUP BY doc_id
),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tokens
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln((CAST(c.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1)
           * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                + {_BM25_B} * dl.dl * c.n_docs / CAST(c.total_len AS DOUBLE)))
           * {_MICRO}) AS BIGINT) AS c_micro
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus c
)
SELECT doc_id, CAST(SUM(c_micro) AS BIGINT) AS bm25_micro,
       CAST(COUNT(*) AS INT) AS n_matched_terms
FROM contrib
GROUP BY doc_id
"""


@query("text_bm25_search", oracle=_BM25_ORACLE, tags=("text", "retrieval"))
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Okapi, k1=1.2 b=0.75) scores for the fixed query
    {spark, query, join} — full-text search ranking as one pass: doc
    lengths and corpus totals from hash aggregates, query-term tf from a
    filtered aggregate (the IN-list prunes the token stream before the
    shuffle), per-term contributions micro-quantized then summed
    per-document in exact integers. The df/corpus sides are tiny and
    broadcast; cost is ∝ corpus tokens, dominated by the tokenize map."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    # doc length = token-array SIZE: a per-row expression, equal by
    # construction to COUNT(*) over the exploded stream but with no
    # explode and no doc-keyed shuffle (the r5 bench showed two
    # corpus-sized explodes here; this removes the bigger one)
    dl = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), r"\s+")).alias("dl")
    )
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    # query-term tf: substring-prefilter docs map-side, then explode
    # only the matching sliver
    tf = (
        docs.filter(F.lower(F.col("text")).rlike("|".join(_BM25_TERMS)))
        .select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
        )
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B
                        * F.col("dl")
                        * F.col("n_docs")
                        / F.col("total_len").cast("double")
                    )
                )
                * _MICRO
            ).alias("c_micro"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("c_micro").alias("bm25_micro"),
        F.count("*").cast("int").alias("n_matched_terms"),
    )


# ---------------------------------------------------------------------------
# unigram LM log-probability (the perplexity filter)
# ---------------------------------------------------------------------------

_LM_ORACLE = f"""
WITH {_TOKENS_CTE},
vocab AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tokens GROUP BY term
),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
tok_lp AS (
  SELECT t.doc_id,
         CAST(floor(ln(CAST(v.cnt AS DOUBLE) / tt.total) * {_MICRO})
              AS BIGINT) AS lp_micro
  FROM tokens t JOIN vocab v USING (term) CROSS JOIN total tt
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lp_micro) AS BIGINT) AS logprob_micro,
       CAST(SUM(lp_micro) AS DOUBLE) / ({_MICRO} * COUNT(*))
         AS avg_logprob
FROM tok_lp
GROUP BY doc_id
"""


@query("text_lm_logprob", oracle=_LM_ORACLE, tags=("text", "retrieval", "quality"))
def text_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model log-probability per document — the
    perplexity-style fluency filter: train the LM (term→count) on the
    corpus itself in one hash aggregate, then score every token via an
    equi-join on term and sum per document. Per-token log-probs are
    micro-quantized BIGINTs, so the per-doc sum is exact integer
    arithmetic — deterministic under any partitioning and fold order
    (a float sum of 60k logs would NOT be). The vocabulary join carries
    NO static broadcast hint: at test scale AQE promotes it to a
    broadcast from its observed size, while a hapax-heavy 100 TB vocab
    (the curate_dsir lesson — a vocabulary is corpus-sized in the
    tail) falls back to a term-keyed shuffle instead of OOMing the
    driver. Everything else is the token-stream map plus one per-doc
    aggregate."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    # r12 (guide §2.3 "aggregate before you shuffle"): fold the token
    # stream to (doc, term, tf) ONCE and materialize it — the previous
    # form evaluated the corpus explode THREE times (vocab build,
    # scoring join, and the totals scalar re-deriving vocab; no
    # ReusedExchange fired), and shuffled per-token rows. Every
    # downstream stage is pairs-sized. Exactness is unchanged: each
    # token of a term carries the identical quantized lp_micro, so
    # tf * lp_micro == the per-token sum, n_tokens == sum(tf), and the
    # avg double divides the same two integers.
    pairs = (
        tokens.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    return _lm_scores_from_pairs(pairs)


def _lm_scores_from_pairs(pairs: DataFrame) -> DataFrame:
    """The unigram-LM scoring dataflow over a prebuilt (doc_id, term,
    tf) frame — the seam that lets ``pipe_pretrain_mix`` feed the LM
    and the DSIR featurizer from ONE materialized token fold (r13,
    guide §2.3/§6) while ``text_lm_logprob`` keeps its own. Extra
    grouping columns (e.g. lang) are permitted upstream: (doc_id, term)
    stays unique because they are functionally dependent on doc_id."""
    pairs = pairs.select("doc_id", "term", "tf")
    vocab = pairs.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    tok_lp = (
        # no broadcast hint on vocab — see text_lm_logprob docstring
        # (AQE promotes when small; a tail-heavy vocab shuffles instead)
        pairs.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "tf",
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("total")) * _MICRO
            ).alias("lp_micro"),
        )
    )
    return tok_lp.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("lp_micro")).alias("logprob_micro"),
        (
            F.sum(F.col("tf") * F.col("lp_micro")).cast("double")
            / (F.lit(_MICRO) * F.sum("tf"))
        ).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# bigram LM: condition on the previous token
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH words AS (
  SELECT doc_id, u.w, u.i
  FROM documents, LATERAL (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w,
           generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS i) u
),
bigrams AS (
  SELECT doc_id,
         LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS w1,
         w AS w2
  FROM words
),
bg AS (SELECT * FROM bigrams WHERE w1 IS NOT NULL),
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
),
c1 AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
),
scored AS (
  SELECT bg.doc_id,
         CAST(floor(ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * {_MICRO})
              AS BIGINT) AS lp_micro
  FROM bg JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
  JOIN c1 ON bg.w1 = c1.w1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lp_micro) AS BIGINT) AS logprob_micro
FROM scored
GROUP BY doc_id
"""


@query("text_lm_bigram", oracle=_BIGRAM_ORACLE, tags=("text", "retrieval", "quality"))
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model log-probability per document — the
    sequence-aware upgrade of ``text_lm_logprob``: p(w2|w1) =
    count(w1,w2)/count(w1,·), trained on the corpus in one pass. The
    per-doc window (LAG over token position) forms the bigram stream;
    two hash aggregates build the model; scoring re-joins the
    bigram-vocabulary-sized count tables back onto the stream WITHOUT
    static broadcast hints — a bigram vocab grows ~linearly with
    corpus tail mass, so AQE promotes to broadcast from observed size
    at small scale and falls back to a key-shuffle join when the model
    outgrows a broadcast (the curate_dsir vocab lesson). Per-bigram
    log-probs are micro-quantized BIGINTs, so the per-doc sum is exact
    integer arithmetic. One shuffle on doc_id (window) + model-sized
    aggregates — never quadratic in corpus size."""
    from pyspark.sql.window import Window

    docs = load_table_scaled(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("i", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    bg = (
        toks.select(
            "doc_id", F.lag("w").over(w).alias("w1"), F.col("w").alias("w2")
        )
        .filter(F.col("w1").isNotNull())
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        # no broadcast hints on the model tables — see docstring
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select(
            "doc_id",
            F.floor(
                F.log(F.col("c2").cast("double") / F.col("c1")) * _MICRO
            ).alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp_micro").alias("logprob_micro"),
    )


# ---------------------------------------------------------------------------
# typo/variant pair mining (SymSpell deletion-neighborhood blocking)
# ---------------------------------------------------------------------------

# The ORACLE does the O(|V|^2) self-join (fine for an oracle); the
# ENGINE uses symmetric-delete blocking: every edit-distance-1 pair
# shares a 1-deletion (or identity) variant, so candidates come from an
# equi-join on the variant key — ~(len+1) keys per term, linear in
# vocabulary size — and only candidates pay the exact levenshtein
# verification. Complete for distance 1 by construction.
_TYPO_ORACLE = f"""
WITH {_TOKENS_CTE},
vocab AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
  FROM tokens GROUP BY term
)
SELECT a.term AS w1, b.term AS w2, a.c AS c1, b.c AS c2
FROM vocab a JOIN vocab b ON a.term < b.term
WHERE levenshtein(a.term, b.term) = 1
"""


@query("text_typo_pairs", oracle=_TYPO_ORACLE, tags=("text", "dedup"))
def text_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 vocabulary pairs (typo/variant candidates for
    normalization dictionaries), mined with SymSpell-style symmetric
    deletes: each term emits itself plus its 1-deletion variants, pairs
    sharing a variant are the complete distance-1 candidate set, and
    exact ``levenshtein`` verifies survivors. The self-join is an
    equi-join on the variant key — never all-pairs — so it scales to
    web-corpus vocabularies where the oracle's quadratic check cannot.
    Variant generation is a builtin higher-order function (no Python)."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    variants = vocab.select(
        "term",
        "c",
        F.explode(
            F.expr(
                "array_append("
                "  transform(sequence(1, length(term)),"
                "    i -> concat(substring(term, 1, i-1),"
                "                substring(term, i+1, length(term)))),"
                "  term)"
            )
        ).alias("variant"),
    )
    pairs = (
        variants.alias("a")
        .join(variants.alias("b"), "variant")
        .filter(F.col("a.term") < F.col("b.term"))
        .select(
            F.col("a.term").alias("w1"),
            F.col("b.term").alias("w2"),
            F.col("a.c").alias("c1"),
            F.col("b.c").alias("c2"),
        )
        .distinct()
    )
    return pairs.filter(F.levenshtein("w1", "w2") == 1)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion of two retrieval rankings
# ---------------------------------------------------------------------------

# RRF (Cormack et al.): fused(d) = sum over rankers of 1/(60 + rank_d).
# Contributions are exact integers (1e6 // (60+rank)) so the fusion is
# fold-order-independent; candidate lists only contain docs matching a
# query term, so every stage past the token scan is query-bounded.
_RRF_K = 60
_RRF_TOPN = 20
# per-ranker candidate depth: each list is cut to its top-_RRF_CAND
# BEFORE fusing (rank-window + rk filter → Spark's WindowGroupLimit
# prunes per partition, so a broad query never funnels its full match
# set through one task). Standard RRF fuses fixed-depth lists; with
# K=60, a doc ranked >100 in BOTH lists cannot reach the top-20 fused
# output it would need rrf > ~2*1e6/160.
_RRF_CAND = 100

_RRF_ORACLE = f"""
WITH bm AS (
  SELECT * FROM ({_BM25_ORACLE}) _bm
),
ti AS (
  WITH {_TOKENS_CTE},
  tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tokens WHERE term IN {_BM25_TERMS!r}
    GROUP BY doc_id, term
  ),
  df AS (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM tokens WHERE term IN {_BM25_TERMS!r}
    GROUP BY term
  ),
  n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tokens)
  SELECT tf.doc_id,
         CAST(SUM(CAST(floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)
                             * {_MICRO}) AS BIGINT)) AS BIGINT) AS tfidf_micro
  FROM tf JOIN df USING (term) CROSS JOIN n
  GROUP BY tf.doc_id
),
ra AS (
  SELECT doc_id, rk FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS rk
    FROM bm
  ) _ra WHERE rk <= {_RRF_CAND}
),
rb AS (
  SELECT doc_id, rk FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY tfidf_micro DESC, doc_id) AS rk
    FROM ti
  ) _rb WHERE rk <= {_RRF_CAND}
),
fused AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         CAST(COALESCE({_MICRO} // ({_RRF_K} + a.rk), 0)
              + COALESCE({_MICRO} // ({_RRF_K} + b.rk), 0) AS BIGINT)
           AS rrf_micro,
         CAST(a.rk AS INT) AS bm25_rank,
         CAST(b.rk AS INT) AS tfidf_rank
  FROM ra a FULL OUTER JOIN rb b ON a.doc_id = b.doc_id
)
SELECT doc_id, rrf_micro, bm25_rank, tfidf_rank, rk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT)
              AS rk
  FROM fused
) WHERE rk <= {_RRF_TOPN}
"""


@query("text_rrf_fusion", oracle=_RRF_ORACLE, tags=("text", "retrieval"))
def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 ranking and the query-restricted
    TF-IDF ranking for the fixed query {spark, query, join} — the
    standard way hybrid retrieval combines incommensurable scores
    without calibration (only RANKS cross lists, never raw scores).
    Reuses :func:`text_bm25_search` verbatim as ranker A so the BM25
    definition lives in exactly one place.

    Scale shape: each ranked list is cut to its top-100 (_RRF_CAND)
    candidates BEFORE fusing — the rank-filter compiles to Spark's
    WindowGroupLimit (per-partition top-k, k-width merge), so even a
    broad query whose match set is corpus-sized never funnels through
    a single-partition window; the fusion then joins two
    constant-depth lists. The only corpus-sized stage is the token
    scan already inside the rankers."""
    bm = text_bm25_search(spark, sf_dir).select("doc_id", "bm25_micro")
    docs = load_table_scaled(spark, sf_dir, "documents")
    # substring prefilter before the explode: docs with no query term
    # contribute nothing to tf/df, and the rlike is a map-side gate the
    # scan evaluates without materializing the token stream (the r5
    # bench showed three corpus-sized explode scans here)
    pat = "|".join(_BM25_TERMS)
    qdocs = docs.filter(F.lower(F.col("text")).rlike(pat))
    qtoks = (
        qdocs.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
        )
        .filter(F.col("term").isin(*_BM25_TERMS))
        .localCheckpoint(eager=False)  # tf AND df read it: one explode
    )
    tf = qtoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = qtoks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # |tokens-bearing docs| == |documents| (split of any string yields
    # >= 1 token), so the corpus-wide token DISTINCT degenerates to a
    # metadata-served row count
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    ti = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.floor(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df"))
                * _MICRO
            ).alias("c_micro"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c_micro").alias("tfidf_micro"))
    )
    from pyspark.sql.window import Window

    ra = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_micro").desc(), F.col("doc_id")))
        .alias("rk"),
    ).filter(F.col("rk") <= _RRF_CAND)
    rb = ti.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("tfidf_micro").desc(), F.col("doc_id")))
        .alias("rk"),
    ).filter(F.col("rk") <= _RRF_CAND)
    a = ra.alias("a")
    b = rb.alias("b")
    fused = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
        (
            F.coalesce(F.expr(f"{_MICRO} DIV ({_RRF_K} + a.rk)"), F.lit(0))
            + F.coalesce(F.expr(f"{_MICRO} DIV ({_RRF_K} + b.rk)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_micro"),
        F.col("a.rk").cast("int").alias("bm25_rank"),
        F.col("b.rk").cast("int").alias("tfidf_rank"),
    )
    return (
        fused.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id")))
            .cast("int"),
        )
        .filter(F.col("rk") <= _RRF_TOPN)
        .select("doc_id", "rrf_micro", "bm25_rank", "tfidf_rank", "rk")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (head / middle / tail)
# ---------------------------------------------------------------------------

# The CCNet recipe: score every document with an LM, split the corpus
# into perplexity tertiles, and treat 'head' as the high-quality slice
# (train), 'middle' as usable, 'tail' as suspect. Reuses
# text_lm_logprob verbatim as the scorer so the LM definition lives in
# one place; the tertile rule is exact integer arithmetic (rk*3 vs n).
_CCNET_ORACLE = f"""
WITH lm AS (
  SELECT * FROM ({_LM_ORACLE}) _lm
),
ranked AS (
  SELECT doc_id, n_tokens, logprob_micro,
         ROW_NUMBER() OVER (
           ORDER BY CAST(logprob_micro AS DOUBLE) / n_tokens DESC, doc_id)
           AS rk,
         COUNT(*) OVER () AS n
  FROM lm
)
SELECT doc_id, n_tokens, logprob_micro,
       CASE WHEN rk * 3 <= n THEN 'head'
            WHEN rk * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
"""


@query(
    "curate_ccnet_buckets", oracle=_CCNET_ORACLE, tags=("pipeline", "quality")
)
def curate_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality tiering: rank documents by per-token LM
    log-probability (fluency) and cut the corpus into head/middle/tail
    tertiles — the published recipe behind CCNet/RedPajama's quality
    slices. Head docs read like the LM's training distribution; tail
    docs are boilerplate/garbled candidates for ``text_quality`` /
    ``text_encoding_artifacts`` review.

    Scale shape: scoring is text_lm_logprob's one token scan + per-doc
    aggregate; the tertile CODE never needs the rank itself, so the
    cut is boundary-only (``operators.ordinal.global_rank_segments``:
    histogram buckets → per-bucket counts → ONE small job sorting just
    the two cut-rank buckets → literal comparisons) — identical
    buckets to the oracle's rank rule, and the output stage is a pure
    map with NO window and NO exchange. Tie-break on doc_id keeps the
    cut deterministic."""
    return _ccnet_buckets_from_lm(text_lm_logprob(spark, sf_dir))


def _ccnet_buckets_from_lm(lm: DataFrame) -> DataFrame:
    """The tertile cut over a prebuilt LM-score frame — the seam that
    lets ``pipe_pretrain_mix`` run the CCNet tiering over its shared
    token fold (r13) while the registered query keeps its own LM."""
    per_tok = F.col("logprob_micro").cast("double") / F.col("n_tokens")
    # rk*3 <= n  ⟺  rk <= n//3 (segment 0); rk*3 <= 2n ⟺ rk <= 2n//3
    seg, _n = global_rank_segments(
        lm,
        per_tok,
        F.col("doc_id"),
        lambda n: [n // 3, 2 * n // 3],
        descending=True,
        out="__seg",
    )
    return seg.select(
        "doc_id",
        "n_tokens",
        "logprob_micro",
        F.when(F.col("__seg") == 0, F.lit("head"))
        .when(F.col("__seg") == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking over the embedding candidates
# ---------------------------------------------------------------------------

_MMR_LAMBDA10 = 7   # λ = 0.7 in tenths: obj = 7·rel − 3·max_sim (decimicro)
_MMR_CAND = 20
_MMR_K = 5


def _mmr_cand_sql(dot_qe: str, norm: str) -> str:
    """Candidate CTE body: corpus-sized top-CAND cosine scoring."""
    return f"""
  SELECT vec_id, v, rel_micro FROM (
    SELECT e.vec_id, e.v,
           CAST(floor({dot_qe} / ({norm.format(s='q')} * {norm.format(s='e')})
                      * 1000000) AS BIGINT) AS rel_micro
    FROM emb e CROSS JOIN (SELECT v FROM emb WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
  ) s ORDER BY rel_micro DESC, vec_id LIMIT {_MMR_CAND}"""


def _mmr_greedy_sql(dot_ab: str, norm: str) -> str:
    """Unrolled greedy Maximal-Marginal-Relevance selection as CTEs
    (expects a ``cand`` CTE in scope).

    All scores are floor-quantized to micro units BEFORE any
    comparison, so every argmax is an integer comparison with a vec_id
    tie-break — the greedy trace is bit-identical across engines. The
    objective is kept in integer 'deci-micro' lanes: obj = 7·rel_micro
    − 3·maxsim_micro (λ=0.7 scaled by 10)."""
    ctes = [
        f"""pair AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(floor({dot_ab} / ({norm.format(s='a')} * {norm.format(s='b')})
                    * 1000000) AS BIGINT) AS sim_micro
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
)""",
        f"""s1 AS (
  SELECT CAST(1 AS BIGINT) AS pick_rank, vec_id, rel_micro,
         CAST(10 * rel_micro AS BIGINT) AS obj_decimicro
  FROM cand ORDER BY rel_micro DESC, vec_id LIMIT 1
)""",
    ]
    for i in range(2, _MMR_K + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT pick_rank, vec_id, rel_micro, obj_decimicro FROM s{j}"
            for j in range(1, i)
        )
        ctes.append(f"sel{i - 1} AS ({sel_union})")
        ctes.append(
            f"""s{i} AS (
  SELECT CAST({i} AS BIGINT) AS pick_rank, vec_id, rel_micro, obj_decimicro
  FROM (
    SELECT c.vec_id, c.rel_micro,
           CAST({_MMR_LAMBDA10} * c.rel_micro
                - {10 - _MMR_LAMBDA10} * MAX(p.sim_micro) AS BIGINT)
             AS obj_decimicro
    FROM cand c
    JOIN pair p ON p.a_id = c.vec_id
               AND p.b_id IN (SELECT vec_id FROM sel{i - 1})
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
    GROUP BY c.vec_id, c.rel_micro
  ) t ORDER BY obj_decimicro DESC, vec_id LIMIT 1
)"""
        )
    final = " UNION ALL ".join(
        f"SELECT * FROM s{j}" for j in range(1, _MMR_K + 1)
    )
    return ",\n".join(ctes) + f"\n{final}"


_MMR_DUCK = (
    "WITH emb AS (SELECT vec_id, list_transform(embedding,"
    " x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\ncand AS ("
    + _mmr_cand_sql(
        "list_sum(list_transform(range(1, 65), i -> q.v[i] * e.v[i]))",
        "sqrt(list_sum(list_transform({s}.v, x -> x * x)))",
    )
    + "),\n"
    + _mmr_greedy_sql(
        "list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))",
        "sqrt(list_sum(list_transform({s}.v, x -> x * x)))",
    )
)

_MMR_SPARK_CAND = (
    "WITH emb AS (SELECT vec_id, transform(embedding,"
    " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)\n"
    + _mmr_cand_sql(
        "aggregate(zip_with(q.v, e.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)",
        "sqrt(aggregate(transform({s}.v, x -> x * x), 0D, (acc, x) -> acc + x))",
    )
)

_MMR_SPARK_PAIR = (
    "WITH cand AS (SELECT * FROM mmr_cand_m) "
    "SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
    "CAST(floor(aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D,"
    " (acc, x) -> acc + x)"
    " / (sqrt(aggregate(transform(a.v, x -> x * x), 0D, (acc, x) -> acc + x))"
    " * sqrt(aggregate(transform(b.v, x -> x * x), 0D, (acc, x) -> acc + x)))"
    " * 1000000) AS BIGINT) AS sim_micro "
    "FROM cand a JOIN cand b ON a.vec_id <> b.vec_id"
)


@query("sim_mmr_rerank", oracle=_MMR_DUCK, tags=("similarity", "retrieval"))
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversified top-k every RAG retriever runs after ANN:
    from the query's top-20 cosine candidates, greedily pick 5
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked
    (λ=0.7), so near-duplicate passages don't crowd out coverage. The
    greedy trace is exact: scores quantize to integer micro-units
    before every argmax, ties break on vec_id, and the oracle unrolls
    the identical 5 rounds.

    Scale shape: candidate generation is the ANN/brute-force stage
    (here the top-20 window); the greedy runs on the CANDIDATE set
    only. The corpus-sized work (candidate scoring) is distributed and
    materialized ONCE (Spark inlines CTEs — the unrolled-SQL spelling
    re-ran the corpus scan per greedy round, 14.1 s at sf0.1); the
    pairwise candidate similarities are one more Spark job over the
    20-row frame (exact same quantized expressions as the oracle); the
    greedy itself then runs driver-side over ≤ |cand| ids and
    |cand|² integer sims — SERVING-LAYER-sized by construction (the
    rerank of a top-k always is), a bounded collect like the PQ lookup
    tables. Pure integer argmax with vec_id tie-breaks reproduces the
    oracle's unrolled trace bit-for-bit."""
    register_views(spark, sf_dir, ("embeddings",))
    cand = spark.sql(_MMR_SPARK_CAND).localCheckpoint()
    cand.createOrReplaceTempView("mmr_cand_m")
    rel = {
        r["vec_id"]: r["rel_micro"]
        for r in cand.select("vec_id", "rel_micro").collect()
    }
    sim = {
        (r["a_id"], r["b_id"]): r["sim_micro"]
        for r in spark.sql(_MMR_SPARK_PAIR).collect()
    }
    first = sorted(rel, key=lambda i: (-rel[i], i))[0]
    out = [(1, first, rel[first], 10 * rel[first])]
    picked = [first]
    for k in range(2, _MMR_K + 1):
        rest = [i for i in rel if i not in picked]
        obj = {
            i: _MMR_LAMBDA10 * rel[i]
            - (10 - _MMR_LAMBDA10) * max(sim[(i, p)] for p in picked)
            for i in rest
        }
        pick = sorted(rest, key=lambda i: (-obj[i], i))[0]
        out.append((k, pick, rel[pick], obj[pick]))
        picked.append(pick)
    return spark.createDataFrame(
        out, "pick_rank long, vec_id long, rel_micro long, obj_decimicro long"
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: dense (embedding cosine) + sparse (BM25) RRF fusion
# ---------------------------------------------------------------------------
#
# The production RAG retrieval shape: a lexical index and a vector
# index each return a bounded top-N candidate list; reciprocal-rank
# fusion merges them (rank-based, so the two score scales never need
# calibrating). Everything past the two index scans is candidate-list
# sized — the fusion cost is O(N), independent of corpus size, which
# is what makes hybrid retrieval deployable at 100 TB.

_HY_CAND = 50     # per-list candidate depth
_HY_TOP = 20      # fused results returned
_HY_RRF_K = 60    # standard RRF damping
_HY_QVEC = 0      # vec_id of the dense query vector (doc_id == vec_id)

_HYBRID_ORACLE = f"""
WITH {_TOKENS_CTE},
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tokens GROUP BY doc_id
),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tokens WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
),
idf AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
),
bm25 AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(floor(
           ln((CAST(c.n_docs AS DOUBLE) - idf.df + 0.5) / (idf.df + 0.5) + 1)
           * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                + {_BM25_B} * dl.dl * c.n_docs / CAST(c.total_len AS DOUBLE)))
           * {_MICRO}) AS BIGINT)) AS BIGINT) AS bm25_micro
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus c
  GROUP BY tf.doc_id
),
sparse AS (
  SELECT doc_id, bm25_micro,
         CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS BIGINT)
           AS r_sparse
  FROM bm25
  QUALIFY row_number() OVER (ORDER BY bm25_micro DESC, doc_id) <= {_HY_CAND}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qv AS (SELECT v FROM emb WHERE vec_id = {_HY_QVEC}),
cos AS (
  SELECT e.vec_id,
         CAST(floor(
           list_sum(list_transform(range(1, 65), i -> q.v[i] * e.v[i]))
           / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
              * sqrt(list_sum(list_transform(e.v, x -> x * x))))
           * {_MICRO}) AS BIGINT) AS cos_micro
  FROM emb e CROSS JOIN qv q
  WHERE e.vec_id <> {_HY_QVEC}
),
dense AS (
  SELECT vec_id, cos_micro,
         CAST(row_number() OVER (ORDER BY cos_micro DESC, vec_id) AS BIGINT)
           AS r_dense
  FROM cos
  QUALIFY row_number() OVER (ORDER BY cos_micro DESC, vec_id) <= {_HY_CAND}
),
fused AS (
  SELECT COALESCE(s.doc_id, d.vec_id) AS doc_id,
         s.r_sparse, d.r_dense,
         CAST(COALESCE(1000000000 // ({_HY_RRF_K} + s.r_sparse), 0)
              + COALESCE(1000000000 // ({_HY_RRF_K} + d.r_dense), 0)
              AS BIGINT) AS fused_ppb
  FROM sparse s FULL JOIN dense d ON d.vec_id = s.doc_id
)
SELECT doc_id, r_sparse, r_dense, fused_ppb FROM fused
QUALIFY row_number() OVER (ORDER BY fused_ppb DESC, doc_id) <= {_HY_TOP}
"""


@query(
    "sim_hybrid_retrieval",
    oracle=_HYBRID_ORACLE,
    tags=("similarity", "retrieval"),
)
def sim_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense+sparse retrieval with reciprocal-rank fusion: the
    BM25 top-50 for the fixed lexical query and the cosine top-50
    against the fixed dense query vector (vec_id 0; doc_id == vec_id
    aligns the two indexes) are full-outer merged on
    1e9 DIV (60 + rank), integer-exact; top-20 fused results out.

    Scale shape: each index side ends in a TakeOrdered/top-k (the
    window-group-limited shapes already pinned for BM25 and cosine
    top-k) — the fusion join and re-rank touch only the <=100 candidate
    rows, so fusion cost is independent of corpus size. Ranks, not raw
    scores, cross the fusion boundary: no score calibration between
    the lexical and vector index is ever needed."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    # --- sparse side: reuse the registered BM25 scorer's output shape
    bm25 = text_bm25_search(spark, sf_dir).select("doc_id", "bm25_micro")
    w_s = Window.orderBy(F.col("bm25_micro").desc(), "doc_id")
    sparse = (
        bm25.orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(_HY_CAND)
        .withColumn("r_sparse", F.row_number().over(w_s).cast("long"))
    )
    # --- dense side: cosine vs the broadcast query vector
    emb = load_table_scaled(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == _HY_QVEC).select(F.col("v").alias("qv"))
    dot = "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nrm = "sqrt(aggregate(transform({c}, x -> x * x), 0D, (a, x) -> a + x))"
    cos = (
        emb.filter(F.col("vec_id") != _HY_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.expr(
                f"CAST(floor({dot} / ({nrm.format(c='qv')} * {nrm.format(c='v')})"
                f" * {_MICRO}) AS BIGINT)"
            ).alias("cos_micro"),
        )
    )
    w_d = Window.orderBy(F.col("cos_micro").desc(), "vec_id")
    dense = (
        cos.orderBy(F.col("cos_micro").desc(), "vec_id")
        .limit(_HY_CAND)
        .withColumn("r_dense", F.row_number().over(w_d).cast("long"))
    )
    fused = (
        sparse.join(dense, sparse["doc_id"] == dense["vec_id"], "full_outer")
        .select(
            F.coalesce("doc_id", "vec_id").alias("doc_id"),
            "r_sparse",
            "r_dense",
            (
                F.coalesce(
                    F.expr(f"CAST(1000000000 DIV ({_HY_RRF_K} + r_sparse) AS BIGINT)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(f"CAST(1000000000 DIV ({_HY_RRF_K} + r_dense) AS BIGINT)"),
                    F.lit(0),
                )
            ).cast("long").alias("fused_ppb"),
        )
    )
    return fused.orderBy(F.col("fused_ppb").desc(), "doc_id").limit(_HY_TOP)


# ---------------------------------------------------------------------------
# ranking-quality evaluation: NDCG@k and MRR over the corpus
# ---------------------------------------------------------------------------

# Discounts are PRE-QUANTIZED integers (round(1e6 / log2(rank+1))) in a
# literal lookup both engines share, so the whole metric stays in exact
# BIGINT arithmetic — no float log in either engine, no ulp drift.
_NDCG_K = 10
_NDCG_DISCOUNTS = (
    (1, 1_000_000), (2, 630_930), (3, 500_000), (4, 430_677),
    (5, 386_853), (6, 356_207), (7, 333_333), (8, 315_465),
    (9, 301_030), (10, 289_065),
)
# two queries carry the corpus's rare term; the third is the all-common
# control whose NDCG should sit near 1
_NDCG_QUERIES = (
    (1, ("dup", "spark", "query")),
    (2, ("dup", "merge", "sort")),
    (3, ("filter", "group", "window")),
)
# rarity-weighted graded relevance: a matched term contributes 3 if its
# document frequency is under 10% of the corpus, else 1 — relevance
# rewards the rare term that the TF ranker drowns in common-term counts
_NDCG_RARE_W = 3
_NDCG_REL_THRESHOLD = 4  # MRR: rare term + at least one common term

_NDCG_QT_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _NDCG_QUERIES for t in terms
)
_NDCG_D_VALUES = ", ".join(f"({r}, {d})" for r, d in _NDCG_DISCOUNTS)

_NDCG_ORACLE = f"""
WITH {_TOKENS_CTE},
qt(query_id, term) AS (VALUES {_NDCG_QT_VALUES}),
disc(rnk, d) AS (VALUES {_NDCG_D_VALUES}),
ndocs AS (SELECT COUNT(*) AS n FROM documents),
tw AS (
  SELECT t.term,
         CASE WHEN COUNT(DISTINCT t.doc_id) * 10 < MAX(ndocs.n)
              THEN {_NDCG_RARE_W} ELSE 1 END AS w
  FROM tokens t, ndocs
  WHERE t.term IN (SELECT term FROM qt)
  GROUP BY t.term
),
per_term AS (
  SELECT qt.query_id, t.doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS occ
  FROM tokens t JOIN qt ON qt.term = t.term
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT p.query_id, p.doc_id,
         CAST(SUM(p.occ) AS BIGINT) AS occurrences,
         CAST(SUM(tw.w) AS BIGINT) AS rel
  FROM per_term p JOIN tw ON tw.term = p.term
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY occurrences DESC, doc_id) AS rnk
  FROM scored
),
dcg AS (
  SELECT query_id,
         SUM(rel * d) AS dcg_w,
         MIN(CASE WHEN rel >= {_NDCG_REL_THRESHOLD} THEN rnk END)
           AS first_rel
  FROM ranked JOIN disc USING (rnk)
  WHERE rnk <= {_NDCG_K}
  GROUP BY 1
),
ideal AS (
  SELECT query_id, doc_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS rnk
  FROM scored
),
idcg AS (
  SELECT query_id, SUM(rel * d) AS idcg_w
  FROM ideal JOIN disc USING (rnk)
  WHERE rnk <= {_NDCG_K}
  GROUP BY 1
)
SELECT d.query_id AS query_id,
       CAST(d.dcg_w AS BIGINT) AS dcg_w,
       CAST(i.idcg_w AS BIGINT) AS idcg_w,
       CAST(d.dcg_w * {_MICRO} // i.idcg_w AS BIGINT) AS ndcg_ppm,
       CAST(COALESCE({_MICRO} // d.first_rel, 0) AS BIGINT) AS mrr_ppm
FROM dcg d JOIN idcg i USING (query_id)
"""


@query("text_ndcg_eval", oracle=_NDCG_ORACLE, tags=("retrieval", "eval"))
def text_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation — NDCG@10 (_NDCG_K) and MRR per query —
    of a term-frequency ranker (total query-term occurrences) against
    RARITY-WEIGHTED graded relevance (a matched term scores 3 when its
    document frequency is <10% of the corpus, else 1): the eval
    quantifies exactly how a TF ranker drowns the rare, discriminative
    term in common-term counts — the IDF lesson as a measured artifact.
    Completes the retrieval eval story next to ``sim_ann_recall_eval``
    (set recall) with the ORDER-sensitive metrics an offline search/RAG
    eval loop reports; query 3 is the all-common control whose NDCG
    sits near 1.

    Exactness: rank discounts 1/log2(r+1) are pre-quantized to a
    10-row integer ppm lookup shared verbatim by both engines, so
    DCG/IDCG/NDCG/MRR are pure BIGINT sums and divisions — float logs
    never touch either plan. Scale shape: one corpus token scan
    equi-joined with the broadcast 9-row query-term table (an inverted
    index probe), per-(query, doc, term) aggregate, two
    query-partitioned top-k windows (WindowGroupLimit keeps all-but-k
    rows out of the final shuffle), then candidate-sized discount
    joins — per-query cost follows posting-list length, never
    corpus x queries."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    n_docs = docs.count()  # bounded driver scalar (df rarity threshold)
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    )
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _NDCG_QUERIES for t in terms],
        "query_id int, term string",
    )
    disc = spark.createDataFrame(list(_NDCG_DISCOUNTS), "rnk int, d long")
    qterms = sorted({t for _, terms in _NDCG_QUERIES for t in terms})
    tw = (
        tokens.where(F.col("term").isin(qterms))
        .groupBy("term")
        .agg(
            F.when(
                F.count_distinct("doc_id") * 10 < F.lit(n_docs),
                F.lit(_NDCG_RARE_W),
            )
            .otherwise(F.lit(1))
            .cast("long")
            .alias("w")
        )
    )
    per_term = (
        tokens.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    scored = (
        per_term.join(F.broadcast(tw), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("occ").alias("occurrences"),
            F.sum("w").alias("rel"),
        )
        # scored feeds BOTH the DCG and the IDCG branch: without a
        # checkpoint each branch re-runs the whole tokenize→explode→
        # score pipeline (the corpus scan twice over — measured as the
        # bulk of this query's 2.7 s at sf0.1). Materialize the small
        # (query, doc) frame once; candidates only, never corpus text.
        .localCheckpoint(eager=False)
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("occurrences").desc(), F.col("doc_id")
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    dcg = (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= _NDCG_K)
        .join(F.broadcast(disc), "rnk")
        .groupBy("query_id")
        .agg(
            F.sum(F.col("rel") * F.col("d")).alias("dcg_w"),
            F.min(
                F.when(
                    F.col("rel") >= _NDCG_REL_THRESHOLD, F.col("rnk")
                )
            ).alias("first_rel"),
        )
    )
    idcg = (
        scored.withColumn("rnk", F.row_number().over(w_ideal))
        .where(F.col("rnk") <= _NDCG_K)
        .join(F.broadcast(disc), "rnk")
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") * F.col("d")).alias("idcg_w"))
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        "dcg_w",
        "idcg_w",
        F.expr(f"dcg_w * {_MICRO} DIV idcg_w").alias("ndcg_ppm"),
        F.coalesce(
            F.expr(f"{_MICRO} DIV first_rel"), F.lit(0).cast("long")
        ).alias("mrr_ppm"),
    )
