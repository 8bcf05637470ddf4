"""Corpus-structure operators: content-defined chunk dedup and RAKE
keyword extraction.

Extension surface (the reference — ``/root/reference/etl.py`` — has no
text processing at all): two classic corpus-curation primitives that an
LLM-training data pipeline runs between raw crawl and training shards.

Both are pure column-expression + window dataflows — no Python row
loops — and every score that crosses the engine/oracle hash is exact
integer arithmetic (parts-per-million integer division), so results are
bit-identical between Spark and DuckDB at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import load_table
from udacity_data_engineer_capstone_spark.registry import query

# ---------------------------------------------------------------------------
# content-defined chunking dedup
# ---------------------------------------------------------------------------
#
# Fixed-size chunking (text_chunk_dedup) misses duplicated passages that
# are SHIFTED by an insertion upstream; content-defined chunking (CDC —
# the rsync/LBFS boundary trick) cuts where the CONTENT says to cut, so
# a shifted copy still yields the same chunks. Boundary rule: a token
# opens a new chunk when the first hex digit of md5(token) is '0'
# (p = 1/16 → ~16-token expected chunks), a content-only predicate both
# engines evaluate identically.

_CDC_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS tok,
                       generate_subscripts(arr, 1) - 1 AS pos) u
),
marked AS (
  SELECT doc_id, tok, pos,
         CASE WHEN pos = 0 OR substring(md5(tok), 1, 1) = '0'
              THEN 1 ELSE 0 END AS boundary
  FROM toks
),
segmented AS (
  SELECT doc_id, tok, pos,
         SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS chunk_id
  FROM marked
),
chunks AS (
  SELECT doc_id, chunk_id,
         string_agg(tok, ' ' ORDER BY pos) AS chunk,
         MIN(pos) AS start_pos,
         COUNT(*) AS n_tokens
  FROM segmented
  GROUP BY doc_id, chunk_id
)
SELECT md5(chunk) AS chunk_hash,
       CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id * 100000 + start_pos) // 100000 AS keep_doc,
       MIN(doc_id * 100000 + start_pos) % 100000 AS keep_pos
FROM chunks
GROUP BY md5(chunk)
HAVING COUNT(*) >= 2
"""


@query("dedup_cdc_chunks", oracle=_CDC_ORACLE, tags=("dedup", "text"))
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-robust repeated-passage detection via content-defined
    chunking: cut chunks at md5-boundary tokens, hash each chunk, and
    report every chunk occurring more than once corpus-wide with a
    deterministic keep pointer (min (doc_id, start_pos)).

    Scale shape: one window pass partitioned by doc_id (sorted by token
    position — bounded by document length, not corpus size), one
    group-by on (doc_id, chunk_id) co-partitioned with the window, then
    a hash-width shuffle keyed on md5(chunk) — the chunk text itself
    crosses the final shuffle only once per (doc, chunk)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "tok"),
    )
    boundary = F.when(
        (F.col("pos") == 0) | (F.substring(F.md5("tok"), 1, 1) == "0"), 1
    ).otherwise(0)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segmented = toks.select(
        "doc_id", "tok", "pos", F.sum(boundary).over(w).alias("chunk_id")
    )
    chunks = (
        segmented.groupBy("doc_id", "chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
            ).alias("chunk"),
            F.min("pos").alias("start_pos"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    key = F.col("doc_id") * 100000 + F.col("start_pos")
    return (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(key).alias("k"),
        )
        .where(F.col("n_copies") >= 2)
        .select(
            "chunk_hash",
            "n_tokens",
            "n_copies",
            "n_docs",
            # integer DIV, matching the oracle's // exactly (float
            # division drifts once doc_id approaches 2^53/1e5)
            F.expr("k DIV 100000").alias("keep_doc"),
            (F.col("k") % 100000).alias("keep_pos"),
        )
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------
#
# RAKE (Rose et al. 2010, public method): candidate phrases are maximal
# runs of non-stopword tokens; each word scores degree/frequency where
# degree(w) = Σ over phrases containing w of phrase length and
# freq(w) = number of occurrences; a phrase scores the sum of its word
# scores. Scores are computed in exact integer parts-per-million
# (degree * 1_000_000 // freq) so the cross-engine hash is stable.

_STOPWORDS = (
    "the a an and or of to in is are was were be been on at for with "
    "as by it this that from not"
).split()

_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

_RAKE_TOP_N = 3

_RAKE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS tok,
                       generate_subscripts(arr, 1) - 1 AS pos) u
),
marked AS (
  SELECT doc_id, tok, pos,
         CASE WHEN tok IN ({_STOP_SQL}) OR tok = '' THEN 1 ELSE 0 END AS stop
  FROM toks
),
segmented AS (
  SELECT doc_id, tok, pos, stop,
         SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS seg
  FROM marked
),
phrase_words AS (
  SELECT doc_id, seg, tok, pos FROM segmented WHERE stop = 0
),
phrases AS (
  SELECT doc_id, seg,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM phrase_words
  GROUP BY doc_id, seg
),
word_stats AS (
  SELECT w.tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen) AS BIGINT) AS degree
  FROM phrase_words w
  JOIN phrases p ON p.doc_id = w.doc_id AND p.seg = w.seg
  GROUP BY w.tok
),
scored AS (
  SELECT w.doc_id, w.seg,
         CAST(SUM(s.degree * 1000000 // s.freq) AS BIGINT) AS score_ppm
  FROM phrase_words w
  JOIN word_stats s ON s.tok = w.tok
  GROUP BY w.doc_id, w.seg
),
ranked AS (
  SELECT p.doc_id, p.phrase, s.score_ppm,
         row_number() OVER (PARTITION BY p.doc_id
                            ORDER BY s.score_ppm DESC, p.phrase) AS rnk
  FROM phrases p
  JOIN scored s ON s.doc_id = p.doc_id AND s.seg = p.seg
)
SELECT doc_id, phrase, score_ppm, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {_RAKE_TOP_N}
"""


@query("text_rake_keywords", oracle=_RAKE_ORACLE, tags=("text", "nlp"))
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 RAKE keyword phrases per document (stopword-delimited runs
    scored by summed word degree/frequency ratios, in exact integer ppm).

    Scale shape: the segmentation window and the phrase group-by are
    both partitioned by doc_id; word_stats is a hash aggregate on token
    (vocabulary-sized, Zipf-bounded); the score join broadcasts nothing
    blindly — Catalyst/AQE picks broadcast when word_stats is small.
    Final top-N is a per-doc window (WindowGroupLimit prunes to N per
    partition before the sort at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("pos", "tok"),
    )
    marked = toks.select(
        "doc_id",
        "tok",
        "pos",
        F.when(F.col("tok").isin(*_STOPWORDS) | (F.col("tok") == ""), 1)
        .otherwise(0)
        .alias("stop"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segmented = marked.select(
        "doc_id", "tok", "pos", "stop", F.sum("stop").over(w).alias("seg")
    )
    phrase_words = segmented.where(F.col("stop") == 0).select(
        "doc_id", "seg", "tok", "pos"
    )
    phrases = phrase_words.groupBy("doc_id", "seg").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    word_stats = (
        phrase_words.join(phrases.select("doc_id", "seg", "plen"), ["doc_id", "seg"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
    )
    scored = (
        phrase_words.join(word_stats, "tok")
        .groupBy("doc_id", "seg")
        .agg(
            F.sum(F.expr("degree * 1000000 DIV freq")).alias("score_ppm")
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("phrase")
    )
    return (
        phrases.join(scored, ["doc_id", "seg"])
        .select(
            "doc_id",
            "phrase",
            "score_ppm",
            F.row_number().over(rank_w).alias("rnk"),
        )
        .where(F.col("rnk") <= _RAKE_TOP_N)
    )


# ---------------------------------------------------------------------------
# windowed co-occurrence counts (GloVe-style)
# ---------------------------------------------------------------------------

_COOC_WINDOW = 2  # token distance; weight 1/d -> ppm integers 1e6, 5e5

_COOC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS tok,
                       generate_subscripts(arr, 1) - 1 AS pos) u
  WHERE u.tok <> ''
)
SELECT a.tok AS left_tok,
       b.tok AS right_tok,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(1000000 // (b.pos - a.pos)) AS BIGINT) AS weight_ppm
FROM toks a
JOIN toks b
  ON a.doc_id = b.doc_id
 AND b.pos - a.pos BETWEEN 1 AND {_COOC_WINDOW}
GROUP BY a.tok, b.tok
HAVING COUNT(*) >= 3
"""


@query("text_glove_cooccur", oracle=_COOC_ORACLE, tags=("text", "nlp"))
def text_glove_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-weighted token co-occurrence counts (window ±2, weight
    1/d in exact ppm integers) — the input statistic GloVe-style
    embedding training consumes. Pairs come from a positional self-join
    per document (fan-out ≤ window size per token, corpus-linear); the
    aggregate is vocabulary²-bounded with map-side combine. The ≥3
    support cut keeps the result the hot co-occurrence matrix, not the
    long noise tail."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias(
                "pos", "tok"
            ),
        )
        .where(F.col("tok") != "")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).between(1, _COOC_WINDOW),
        )
        .groupBy(
            F.col("a.tok").alias("left_tok"), F.col("b.tok").alias("right_tok")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.expr("1000000 DIV (b.pos - a.pos)")).alias("weight_ppm"),
        )
        .where(F.col("n_pairs") >= 3)
    )


# ---------------------------------------------------------------------------
# link extraction + domain counts (crawl-graph input)
# ---------------------------------------------------------------------------

_URL_RE = "https?://[a-z0-9.-]+/[a-z0-9/]*"

# URLs planted deterministically (testdata text contains none): every
# 10th doc links one site, every 10th+1 links two — same CTE on both
# engines, like the planted-PII corpus.
_LINKS_CTE = """
linked AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
                THEN text || ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
                     || '.example.com/page' || CAST(doc_id AS VARCHAR) || ' ok'
              WHEN doc_id % 10 = 1
                THEN text || ' via http://hub' || CAST(doc_id % 20 AS VARCHAR)
                     || '.example.org/idx and https://site'
                     || CAST(doc_id % 50 AS VARCHAR) || '.example.com/ref'
              ELSE text END AS text
  FROM documents
)
"""

_LINKS_ORACLE = f"""
WITH {_LINKS_CTE},
urls AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_URL_RE}')) AS url
  FROM linked
)
SELECT regexp_extract(url, 'https?://([a-z0-9.-]+)', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(url) AS sample_url
FROM urls
GROUP BY 1
"""


@query("text_link_extract", oracle=_LINKS_ORACLE, tags=("text", "crawl"))
def text_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction over a planted-URL corpus: pull every URL with
    one regexp pass, explode, and aggregate per domain (count, doc
    spread, deterministic sample URL) — the inlink/outlink statistic a
    crawl scheduler ranks domains by. Pure regexp/explode column
    expressions; the aggregate is domain-cardinality-bounded with
    map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" see https://site"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(".example.com/page"),
                F.col("doc_id").cast("string"),
                F.lit(" ok"),
            ),
        )
        .when(
            F.col("doc_id") % 10 == 1,
            F.concat(
                F.col("text"),
                F.lit(" via http://hub"),
                (F.col("doc_id") % 20).cast("string"),
                F.lit(".example.org/idx and https://site"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(".example.com/ref"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    urls = planted.select(
        "doc_id",
        F.explode(F.expr(f"regexp_extract_all(text, '{_URL_RE}', 0)")).alias("url"),
    )
    return urls.groupBy(
        F.regexp_extract("url", "https?://([a-z0-9.-]+)", 1).alias("domain")
    ).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("url").alias("sample_url"),
    )


# ---------------------------------------------------------------------------
# intra-document repetition filter (Gopher-style quality rule)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS tok,
                       generate_subscripts(arr, 1) - 1 AS pos) u
  WHERE u.tok <> ''
),
bigrams AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
counts AS (
  SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c
  FROM bigrams GROUP BY doc_id, bigram
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_bigrams, top_bigram_count,
       CAST(top_bigram_count * 1000000 // n_bigrams AS BIGINT)
         AS top_share_ppm,
       (top_bigram_count * 1000000 // n_bigrams) < 180000 AS keep
FROM per_doc
WHERE n_bigrams > 0
"""


@query("curate_repetition_filter", oracle=_REPETITION_ORACLE, tags=("curation", "text"))
def curate_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: the share (exact ppm) of a doc's
    most frequent word bigram; docs above 18% are template/boilerplate
    suspects and get keep=false. Bigrams come from a positional
    self-join per document; both aggregates are keyed by doc_id, so the
    whole operator shares one hash partitioning and never shuffles
    token-level data twice."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    a = toks.alias("a")
    b = toks.alias("b")
    bigrams = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.concat_ws(" ", F.col("a.tok"), F.col("b.tok")).alias("bigram"),
    )
    counts = bigrams.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_count"),
    )
    share = F.expr("top_bigram_count * 1000000 DIV n_bigrams")
    return per_doc.where(F.col("n_bigrams") > 0).select(
        "doc_id",
        "n_bigrams",
        "top_bigram_count",
        share.alias("top_share_ppm"),
        (share < 180000).alias("keep"),
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate statistics (tokenizer-training input)
# ---------------------------------------------------------------------------

_BPE_ORACLE = """
WITH chars AS (
  SELECT doc_id, u.i,
         substring(lower(text), u.i, 1) AS c0,
         substring(lower(text), u.i + 1, 1) AS c1
  FROM documents,
       LATERAL (SELECT unnest(range(1,
                  CAST(length(text) AS INT))) AS i) u
),
pairs AS (
  SELECT c0 || c1 AS pair, CAST(COUNT(*) AS BIGINT) AS n
  FROM chars
  WHERE regexp_matches(c0, '^[a-z0-9]$') AND regexp_matches(c1, '^[a-z0-9]$')
  GROUP BY c0 || c1
),
ranked AS (
  SELECT pair, n,
         row_number() OVER (ORDER BY n DESC, pair) AS rnk
  FROM pairs
)
SELECT pair, n, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 20
"""


@query("text_bpe_pair_counts", oracle=_BPE_ORACLE, tags=("text", "nlp"))
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge decision, as data: corpus-wide counts of
    adjacent alphanumeric character pairs, top-20 by (count, pair) —
    what a tokenizer trainer computes every merge round. Character
    pairs come from a substring explode (corpus-linear, no Python);
    the aggregate is alphabet²-bounded with map-side combine, and the
    final top-20 is a tie-broken total order."""
    docs = load_table(spark, sf_dir, "documents")
    # length >= 2 pre-filter guards single-char docs: Spark's
    # sequence(1, 0) defaults to step -1 (descending) and would emit a
    # spurious i=0 self-pair where the oracle's range(1, length) is empty
    chars = docs.where(F.length("text") >= 2).select(
        F.posexplode(
            F.expr("sequence(1, CAST(length(text) AS INT) - 1)")
        ).alias("j", "i"),
        F.lower("text").alias("t"),
    ).select(
        F.expr("substr(t, i, 1)").alias("c0"),
        F.expr("substr(t, i + 1, 1)").alias("c1"),
    )
    pairs = (
        chars.where(
            F.col("c0").rlike("^[a-z0-9]$") & F.col("c1").rlike("^[a-z0-9]$")
        )
        .groupBy(F.concat("c0", "c1").alias("pair"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        pairs.select("pair", "n", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 20)
    )


# ---------------------------------------------------------------------------
# n-gram novelty (memorization-risk screen)
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS tok,
                       generate_subscripts(arr, 1) - 1 AS pos) u
  WHERE u.tok <> ''
),
trigrams AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
gram_docs AS (
  SELECT g, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM trigrams GROUP BY g
),
per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN gd.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
  FROM trigrams t JOIN gram_docs gd ON gd.g = t.g
  GROUP BY t.doc_id
)
SELECT doc_id, n_grams, n_unique,
       CAST(n_unique * 1000000 // n_grams AS BIGINT) AS novelty_ppm
FROM per_doc
"""


@query("curate_ngram_novelty", oracle=_NOVELTY_ORACLE, tags=("curation", "text"))
def curate_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: the exact-ppm share of a doc's
    word trigrams that occur in NO other document — low novelty marks
    boilerplate/templated docs (duplication risk), high novelty marks
    uniquely-informative ones. Trigram document frequency is one
    hash aggregate keyed by the gram; the per-doc roll-up joins back on
    the same key. At corpus scale the df table is the same vocabulary-
    bounded object every dedup/contamination op here shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    a, b, c = toks.alias("a"), toks.alias("b"), toks.alias("c")
    trigrams = (
        a.join(b, (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("b.pos") == F.col("a.pos") + 1))
        .join(c, (F.col("c.doc_id") == F.col("a.doc_id")) & (F.col("c.pos") == F.col("a.pos") + 2))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.tok"), F.col("b.tok"), F.col("c.tok")).alias("g"),
        )
    )
    gram_docs = trigrams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("df")
    )
    per_doc = (
        trigrams.join(gram_docs, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_unique",
        F.expr("CAST(n_unique * 1000000 DIV n_grams AS BIGINT)").alias(
            "novelty_ppm"
        ),
    )
