"""Text-analysis operators over the ``documents`` table (north-star
extension; BASELINE.json).

Everything here is pure column expressions — tokenization, language ID,
quality scoring, and fingerprinting all stay inside whole-stage codegen
with zero Python workers, so per-document cost is constant and the whole
family scales linearly with document count (embarrassingly parallel: no
shuffle except the final small aggregates, none here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import (
    load_table,
    load_table_scaled,
    register_views,
)
from udacity_data_engineer_capstone_spark.registry import query

# BPE-ish pre-tokenizer: letter runs, single digits, single non-alnum marks
# (the shape GPT-style byte-pair pre-tokenizers use).
BPE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# marker vocabularies for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "of", "and", "is", "to"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "que", "es", "y"),
    "zh": ("的", "是", "了", "在", "不"),
}


_TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '\\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars_computed
FROM documents
"""


@query("text_tokens", oracle=_TOKENS_ORACLE, tags=("text",))
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars_computed"),
    )


_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(text), '\\s+') AS toks,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(length(array_to_string(toks, '')) AS DOUBLE) / len(toks)
         AS avg_token_len,
       CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS DOUBLE) / len(toks)
         AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       (CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS DOUBLE) / len(toks))
         - (CAST(n_punct AS DOUBLE) / n_chars)
         + 0.1 * (least(len(toks), 100) / 100.0) AS quality_score
FROM t
"""


@query("text_quality", oracle=_QUALITY_ORACLE, tags=("text",))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, punctuation
    ratio (the C4/Gopher-style cheap filters)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.lower("text"), r"\s+").alias("toks"),
        F.length("text").alias("n_chars"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)).alias(
            "n_punct"
        ),
    )
    n_tokens = F.size("toks")
    stop_hits = F.expr(f"size(filter(toks, x -> x IN ({_STOP_IN})))")
    stop_ratio = stop_hits.cast("double") / n_tokens
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (
            F.length(F.concat_ws("", F.col("toks"))).cast("double") / n_tokens
        ).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (
            stop_ratio
            - punct_ratio
            + 0.1 * (F.least(n_tokens, F.lit(100)) / F.lit(100.0))
        ).alias("quality_score"),
    )


def _marker_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(toks, x -> x IN ({words})))"


_LANGID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
  FROM documents
), h AS (
  SELECT doc_id,
         {_marker_hits_sql('en')} AS h_en,
         {_marker_hits_sql('de')} AS h_de,
         {_marker_hits_sql('fr')} AS h_fr,
         {_marker_hits_sql('es')} AS h_es,
         {_marker_hits_sql('zh')} AS h_zh
  FROM t
)
SELECT doc_id,
       CASE
         WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0 AND h_zh = 0
           THEN 'und'
         WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh
           THEN 'en'
         WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
         WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
         WHEN h_es >= h_zh THEN 'es'
         ELSE 'zh'
       END AS lang_pred
FROM h
"""


@query("text_langid", oracle=_LANGID_ORACLE, tags=("text",))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (dictionary heuristic; deterministic
    priority order en>de>fr>es>zh on ties, 'und' when no hits)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    hits = {}
    for lang, words in LANG_MARKERS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        hits[lang] = F.expr(f"size(filter(toks, x -> x IN ({in_list})))")
    h = docs.select(
        "doc_id", *[hits[lang].alias(f"h_{lang}") for lang in LANG_MARKERS]
    )
    c = {lang: F.col(f"h_{lang}") for lang in LANG_MARKERS}
    pred = (
        F.when(
            (c["en"] == 0) & (c["de"] == 0) & (c["fr"] == 0)
            & (c["es"] == 0) & (c["zh"] == 0),
            F.lit("und"),
        )
        .when(
            (c["en"] >= c["de"]) & (c["en"] >= c["fr"])
            & (c["en"] >= c["es"]) & (c["en"] >= c["zh"]),
            F.lit("en"),
        )
        .when((c["de"] >= c["fr"]) & (c["de"] >= c["es"]) & (c["de"] >= c["zh"]), "de")
        .when((c["fr"] >= c["es"]) & (c["fr"] >= c["zh"]), "fr")
        .when(c["es"] >= c["zh"], "es")
        .otherwise("zh")
    )
    return h.select("doc_id", pred.alias("lang_pred"))


_EXPLODE_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, toks[u.i] AS token
FROM t, unnest(range(1, least(len(toks), 5) + 1)) AS u(i)
"""


@query("fn_explode_pos", oracle=_EXPLODE_ORACLE, tags=("text", "lateral"))
def fn_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view): first 5 tokens of each document
    as (doc_id, pos, token) rows — the array→rows pivot every tokenized
    pipeline needs. Slicing *before* exploding keeps the row blow-up
    bounded (5·n, not tokens·n)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split(F.lower("text"), r"\s+"), 1, 5).alias("toks")
    )
    return docs.select("doc_id", F.posexplode("toks").alias("pos", "token"))


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(array_to_string(
             list_sort(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\\s+'))), ' '))
         AS fingerprint
FROM documents
"""


# rolling k-gram fingerprint: hash every k-char window, keep windows
# whose hash falls in a 1/16 sample (first hex digit '0' — the MOSS-style
# mod-p selection), fingerprint = md5 of the sorted sampled set. Robust
# to small edits: only windows overlapping the edit change.
_ROLL_K = 8

_ROLLING_ORACLE = f"""
SELECT doc_id,
       md5(coalesce(array_to_string(list_sort(list_distinct(list_filter(
             list_transform(range(1, greatest(length(text) - {_ROLL_K} + 2, 2)),
                            i -> md5(substring(text, i, {_ROLL_K}))),
             h -> substring(h, 1, 1) = '0'))), ' '), '')) AS rolling_fp,
       len(list_distinct(list_filter(
             list_transform(range(1, greatest(length(text) - {_ROLL_K} + 2, 2)),
                            i -> md5(substring(text, i, {_ROLL_K}))),
             h -> substring(h, 1, 1) = '0'))) :: INT AS n_sampled
FROM documents
"""


@query("text_rolling_fingerprint", oracle=_ROLLING_ORACLE, tags=("text",))
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: hash all k-char windows, keep a
    deterministic 1/16 sample (first hex digit 0), fingerprint the sorted
    sample. Unlike the whole-set fingerprint below, small edits perturb
    only the windows they overlap — the basis of winnowing/MOSS-style
    near-copy detection. Per-row array expressions, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = (
        f"array_distinct(filter(transform("
        f"sequence(1, greatest(length(text) - {_ROLL_K} + 1, 1)), "
        f"i -> md5(substring(text, i, {_ROLL_K}))), "
        f"h -> substring(h, 1, 1) = '0'))"
    )
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.expr(sampled)))).alias("rolling_fp"),
        F.size(F.expr(sampled)).alias("n_sampled"),
    )


@query("text_fingerprint", oracle=_FINGERPRINT_ORACLE, tags=("text",))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (catches shuffled/reordered copies that exact hashing
    misses)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.array_sort(
                    F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
                ),
            )
        ).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# corpus-level chunk dedup (boilerplate removal)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 10

# 0-based chunk c covers tokens [c*10, c*10+10) — Spark slice() is
# 1-based, DuckDB list slicing is 1-based end-inclusive
_CHUNKS_SPARK = (
    "transform(sequence(0, CAST(floor((size(toks) - 1) / {n}) AS INT)), "
    "c -> concat_ws(' ', slice(toks, c * {n} + 1, {n})))"
).format(n=CHUNK_TOKENS)

_CHUNKS_DUCK = (
    "list_transform(range(0, CAST(floor((len(toks) - 1) / {n}) AS INT) + 1), "
    "c -> array_to_string(toks[c * {n} + 1 : c * {n} + {n}], ' '))"
).format(n=CHUNK_TOKENS)

_CHUNK_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id, unnest({_CHUNKS_DUCK}) AS chunk,
         generate_subscripts({_CHUNKS_DUCK}, 1) - 1 AS pos
  FROM toks
)
SELECT md5(chunk) AS chunk_hash,
       COUNT(*) AS n_copies,
       MIN(doc_id * 100000 + pos) // 100000 AS keep_doc,
       MIN(doc_id * 100000 + pos) % 100000 AS keep_pos
FROM chunks
GROUP BY md5(chunk)
"""


@query("text_chunk_dedup", oracle=_CHUNK_DEDUP_ORACLE, tags=("text", "dedup"))
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate removal: split every document into
    10-token chunks and keep the first occurrence (min (doc_id, pos))
    of each distinct chunk — the repeated-passage dedup LLM pipelines
    run before training.

    Scale: the group-by key is md5(chunk) (32 bytes crossing the
    shuffle, never the chunk text); the argmin is encoded as
    min(doc_id*C + pos) so it rides partial aggregation map-side."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    chunks = toks.select(
        "doc_id", F.posexplode(F.expr(_CHUNKS_SPARK)).alias("pos", "chunk")
    )
    key = F.col("doc_id") * 100000 + F.col("pos")
    return (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(key).alias("k"),
        )
        .select(
            "chunk_hash",
            "n_copies",
            (F.col("k") / 100000).cast("long").alias("keep_doc"),
            (F.col("k") % 100000).alias("keep_pos"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
_PHONE_RE = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"

# derived corpus with planted PII (the testdata itself is clean)
_PII_CTE = """
pii AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com now'
              WHEN doc_id % 20 = 1
                THEN text || ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
                     || '-0199 today'
              ELSE text END AS text
  FROM documents
)
"""

_PII_ORACLE = f"""
WITH {_PII_CTE}
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       (regexp_matches(text, '{_EMAIL_RE}')
        OR regexp_matches(text, '{_PHONE_RE}')) AS had_pii
FROM pii
"""


@query("text_pii_scrub", oracle=_PII_ORACLE, tags=("text", "privacy"))
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, US-style phone numbers) over a corpus with
    deterministically planted PII — a standard pre-training cleanup
    pass. Pure regexp column expressions (patterns restricted to syntax
    shared by Java regex and RE2); embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 20 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                (100 + F.col("doc_id") % 900).cast("string"),
                F.lit("-0199 today"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    had = F.col("text").rlike(_EMAIL_RE) | F.col("text").rlike(_PHONE_RE)
    return planted.select(
        "doc_id", scrubbed.alias("clean_text"), had.alias("had_pii")
    )


# ---------------------------------------------------------------------------
# corpus-statistic token rarity
# ---------------------------------------------------------------------------

_RARITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(
           regexp_split_to_array(lower(text), '\\s+'))) AS tok
  FROM documents
),
df AS (
  SELECT tok, COUNT(*) AS doc_freq FROM toks GROUP BY tok
)
SELECT t.doc_id,
       COUNT(*) AS n_distinct_tokens,
       CAST(SUM(d.doc_freq) AS BIGINT) AS sum_df,
       CAST(SUM(d.doc_freq) AS DOUBLE) / COUNT(*) AS mean_df
FROM toks t JOIN df d ON d.tok = t.tok
GROUP BY t.doc_id
"""


@query("text_token_rarity", oracle=_RARITY_ORACLE, tags=("text",))
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass corpus statistic: per-token document frequency, joined
    back to score each document by its tokens' mean DF — the cheap
    "commonness" signal quality filters use (rare-token-heavy docs are
    OCR noise; common-token-heavy docs are boilerplate).

    Pass 1 shuffles (token, count) pairs — vocabulary-sized, not
    corpus-sized, thanks to map-side partial aggregation. Pass 2 is an
    equi-join on token; at web scale the DF table is Zipf-concentrated,
    so AQE's skew split handles the hot tokens (or pre-bucket by token).
    Integer sums + one final division keep the hash exact."""
    toks = (
        load_table_scaled(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower("text"), r"\s+"))
            ).alias("tok"),
        )
    )
    df_tbl = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        toks.join(df_tbl, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum("doc_freq").alias("sum_df"),
        )
        .withColumn(
            "mean_df",
            F.col("sum_df").cast("double") / F.col("n_distinct_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# corpus-wide top tokens
# ---------------------------------------------------------------------------

TOP_TOKENS_K = 50

_TOP_TOKENS_ORACLE = f"""
SELECT tok, COUNT(*) AS n_docs
FROM (
  SELECT doc_id, unnest(list_distinct(
           regexp_split_to_array(lower(text), '\\s+'))) AS tok
  FROM documents
)
GROUP BY tok
ORDER BY n_docs DESC, tok
LIMIT {TOP_TOKENS_K}
"""


@query("text_top_tokens", oracle=_TOP_TOKENS_ORACLE, tags=("text",))
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary heavy hitters: document frequency of every
    distinct token, global top-50 with a lexicographic tiebreak. The
    aggregate partial-combines map-side (vocabulary-width shuffle) and
    the ORDER BY + LIMIT plans as TakeOrderedAndProject — per-partition
    top-k then a driver merge of k·partitions rows, never a global
    sort. For stream-scale heavy hitters, swap in count-min sketches;
    exact is right here because the oracle is exact."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.array_distinct(F.split(F.lower("text"), r"\s+"))
        ).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "tok")
        .limit(TOP_TOKENS_K)
    )


# ---------------------------------------------------------------------------
# sentence segmentation statistics
# ---------------------------------------------------------------------------

_SENTENCES_SQL_DUCK = """
WITH sents AS (
  SELECT doc_id, trim(u.s) AS s
  FROM (SELECT doc_id, string_split_regex(text, '[.!?]+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS s) u
  WHERE trim(u.s) <> ''
),
measured AS (
  SELECT doc_id, s,
         CAST(len(string_split_regex(s, '\\s+')) AS BIGINT) AS n_tokens
  FROM sents
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tokens) * 1000000 // COUNT(*) AS BIGINT)
         AS mean_len_ppm,
       CAST(MAX(n_tokens) AS BIGINT) AS longest
FROM measured
GROUP BY doc_id
"""


@query("text_sentences", oracle=_SENTENCES_SQL_DUCK, tags=("text", "nlp"))
def text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats per document: split on terminal
    punctuation runs, drop empties, report sentence count, token total,
    exact-ppm mean sentence length, and the longest sentence — the
    structural features readability/quality scoring builds on. One
    explode + one doc-keyed aggregate, all column expressions."""
    docs = load_table(spark, sf_dir, "documents")
    sents = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s0"),
        )
        .select("doc_id", F.trim(F.col("s0")).alias("s"))
        .where(F.col("s") != "")
    )
    measured = sents.select(
        "doc_id", F.size(F.split(F.col("s"), r"\s+")).cast("long").alias("n_tokens")
    )
    return (
        measured.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("n_tokens").alias("n_tokens"),
            F.max("n_tokens").alias("longest"),
        )
        .select(
            "doc_id",
            "n_sentences",
            "n_tokens",
            F.expr("CAST(n_tokens * 1000000 DIV n_sentences AS BIGINT)").alias(
                "mean_len_ppm"
            ),
            "longest",
        )
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization audit
# ---------------------------------------------------------------------------

# Mixed-normalization corpora (NFD from macOS filenames, NFC from the
# web) silently split token statistics and break exact dedup — 'á' and
# 'a'+U+0301 hash differently while rendering identically. Spark has no
# built-in normalizer, so this is the sanctioned Python boundary: an
# Arrow-vectorized pandas UDF over pandas' .str.normalize (ICU-free,
# stdlib unicodedata under the hood). The corpus plants NFD-style
# decomposed accents ('a' -> 'a'+combining-acute) on doc_id % 17 == 0
# so the audit is non-vacuous; the oracle replays the plant with
# chr(769) and DuckDB's nfc_normalize — two independent Unicode
# implementations agreeing is the point of the test.
_NFC_ORACLE = """
WITH planted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 17 = 0
              THEN replace(text, 'a', 'a' || chr(769))
              ELSE text END AS raw
  FROM documents
),
norm AS (
  SELECT doc_id, source, raw, nfc_normalize(raw) AS nfc FROM planted
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN raw <> nfc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_denormalized,
       CAST(SUM(length(raw) - length(nfc)) AS BIGINT) AS codepoints_saved
FROM norm
GROUP BY source
"""


@query("text_unicode_nfc", oracle=_NFC_ORACLE, tags=("text", "quality"))
def text_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source NFC normalization audit: how many documents are not
    NFC-normal and how many codepoints composition removes. The
    normalizer is an Arrow-batched pandas UDF (the only Python in the
    plan — narrow map, no shuffle); counts aggregate as exact integers.
    At 100 TB the normalize pass is embarrassingly parallel and the
    audit shuffle carries 3 numbers per source."""
    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which pandas_udf's signature inference can't resolve
    nfc = F.pandas_udf(lambda s: s.str.normalize("NFC"), "string")

    docs = load_table_scaled(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.regexp_replace("text", "a", "a\u0301"),
        )
        .otherwise(F.col("text"))
        .alias("raw"),
    )
    norm = docs.withColumn("nfc", nfc("raw"))
    return norm.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("raw") != F.col("nfc")).cast("long")).alias(
            "n_denormalized"
        ),
        F.sum(F.length("raw") - F.length("nfc")).cast("long").alias(
            "codepoints_saved"
        ),
    )


# ---------------------------------------------------------------------------
# vocabulary scaling laws: Zipf rank-frequency and Heaps vocabulary growth
# ---------------------------------------------------------------------------
#
# The two classical corpus-statistics curves every tokenizer/vocab
# decision leans on: Zipf (freq ∝ 1/rank — is the corpus's head
# natural-language-shaped or spam-degenerate?) and Heaps (vocab ∝ docsᵝ —
# how fast does the vocabulary grow as the corpus scales, i.e. what will
# a 100 TB crawl do to the tokenizer's OOV rate?). Both are emitted in
# EXACT integer units (the law "fit" ships as per-rank products and
# floor-quantized cumulative shares, not double log-log OLS, so the
# engines agree bit-for-bit; the analyst's log-log plot is a client-side
# rendering of these exact rows).

ZIPF_TOP_K = 50

_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents
),
freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM freq),
top AS (
  SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rnk
  FROM freq
  QUALIFY rnk <= {ZIPF_TOP_K}
)
SELECT CAST(rnk AS INT) AS rank, tok, n,
       CAST(rnk * n AS BIGINT) AS zipf_product,
       CAST(SUM(n) OVER (ORDER BY rnk) * 1000000 // t AS BIGINT)
         AS cum_share_e6
FROM top, tot
"""


@query("text_zipf_ranks", oracle=_ZIPF_ORACLE, tags=("text", "stats"))
def text_zipf_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head profile: the top-50 tokens by corpus frequency with
    their rank, the rank·frequency product (constant under an ideal
    Zipf law), and the exact cumulative corpus share in parts-per-
    million.

    Scale shape: token counting is a partial+final hash aggregate
    (vocabulary-width shuffle, never corpus-width); the global top-50
    plans as TakeOrderedAndProject (per-partition top-k + driver merge
    of k·partitions rows — no global sort); ranking and the running
    share then run on a CONSTANT 50-row frame, where a single-partition
    window is the right plan, not a skew bug. The corpus token total is
    a broadcast scalar."""
    toks = load_table_scaled(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("t"))
    top = freq.orderBy(F.col("n").desc(), "tok").limit(ZIPF_TOP_K)
    w = Window.orderBy(F.col("n").desc(), "tok")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(tot))
        .withColumn("zipf_product", (F.col("rank") * F.col("n")).cast("long"))
        .withColumn(
            "cum_share_e6",
            F.expr(
                "CAST(SUM(n) OVER (ORDER BY rank) * 1000000 DIV t AS BIGINT)"
            ),
        )
        .select("rank", "tok", "n", "zipf_product", "cum_share_e6")
    )


HEAPS_BUCKETS = 10

_HEAPS_ORACLE = f"""
WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
doc_buckets AS (
  SELECT CAST(LEAST(doc_id * {HEAPS_BUCKETS} // n_docs,
                    {HEAPS_BUCKETS} - 1) AS INT) AS bucket
  FROM documents, nd
),
docs_per AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS docs_in FROM doc_buckets GROUP BY bucket
),
first_seen AS (
  SELECT tok, MIN(doc_id) AS first_doc
  FROM (
    SELECT doc_id, unnest(list_distinct(
             regexp_split_to_array(lower(text), '\\s+'))) AS tok
    FROM documents
  )
  GROUP BY tok
),
tok_buckets AS (
  SELECT CAST(LEAST(first_doc * {HEAPS_BUCKETS} // n_docs,
                    {HEAPS_BUCKETS} - 1) AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS new_tokens
  FROM first_seen, nd
  GROUP BY 1
)
SELECT d.bucket,
       CAST(SUM(d.docs_in) OVER (ORDER BY d.bucket) AS BIGINT) AS docs_seen,
       COALESCE(t.new_tokens, 0) AS new_tokens,
       CAST(SUM(COALESCE(t.new_tokens, 0)) OVER (ORDER BY d.bucket) AS BIGINT)
         AS vocab_size
FROM docs_per d LEFT JOIN tok_buckets t ON d.bucket = t.bucket
"""


@query("text_heaps_vocab_growth", oracle=_HEAPS_ORACLE, tags=("text", "stats"))
def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: split the corpus into 10 equal
    doc-id buckets and report, per bucket, cumulative documents seen,
    tokens first appearing in that bucket, and the cumulative
    vocabulary size — the curve whose flattening (or not) says what a
    10× bigger crawl does to vocabulary coverage.

    Scale shape: per-token first-occurrence is a partial+final MIN
    aggregate over (token, doc_id) pairs — vocabulary-width shuffle;
    bucket totals reduce to ``HEAPS_BUCKETS`` rows, so the running
    sums run on a constant-size frame where a single-partition window
    is correct by design."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    bucket_of = (
        "CAST(LEAST({col} * %d DIV n_docs, %d) AS INT)"
        % (HEAPS_BUCKETS, HEAPS_BUCKETS - 1)
    )
    docs_per = (
        docs.crossJoin(F.broadcast(nd))
        .select(F.expr(bucket_of.format(col="doc_id")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("docs_in"))
    )
    first_seen = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.lower("text"), r"\s+"))).alias("tok"),
        )
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    tok_buckets = (
        first_seen.crossJoin(F.broadcast(nd))
        .select(F.expr(bucket_of.format(col="first_doc")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_tokens"))
    )
    w = Window.orderBy("bucket")
    return (
        docs_per.join(tok_buckets, "bucket", "left")
        .withColumn("new_tokens", F.coalesce("new_tokens", F.lit(0)).cast("long"))
        .select(
            "bucket",
            F.sum("docs_in").over(w).cast("long").alias("docs_seen"),
            "new_tokens",
            F.sum("new_tokens").over(w).cast("long").alias("vocab_size"),
        )
    )


# ---------------------------------------------------------------------------
# tokenizer fertility (tokens per word, by language)
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = f"""
SELECT lang,
       CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
         AS n_words,
       CAST(SUM(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')))
         AS BIGINT) AS n_tokens,
       CAST(SUM(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')))
            * 1000000
            // SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
         AS fertility_ppm
FROM documents
GROUP BY lang
"""


@query("text_tokenizer_fertility", oracle=_FERTILITY_ORACLE, tags=("text", "stats"))
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens emitted per
    whitespace word, in exact ppm — the standard metric for how
    expensive a language is under a given tokenizer (fertility ≫ 1e6
    means the vocabulary splits that language's words into many
    pieces, inflating training/inference cost per word). Uses the same
    pre-tokenizer regex as ``text_tokens``.

    Scale shape: two counters per row (JVM regex expressions, no
    Python), one partial+final aggregate per language — a
    vocabulary-free map-side-combine pass at any corpus size."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(F.size(F.split("text", r"\s+"))).cast("long").alias("n_words"),
            F.sum(
                F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), 0))
            )
            .cast("long")
            .alias("n_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.expr("CAST(n_tokens * 1000000 DIV n_words AS BIGINT)").alias(
                "fertility_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# cross-source vocabulary overlap (Jaccard matrix over token sets)
# ---------------------------------------------------------------------------

_VOCAB_OVERLAP_ORACLE = r"""
WITH toks AS (
  SELECT DISTINCT source, t AS tok
  FROM documents, unnest(regexp_split_to_array(lower(text), '\s+')) AS u(t)
  WHERE t <> ''
),
sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY source
),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS vocab_inter
  FROM toks a
  JOIN toks b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b,
       sa.n AS vocab_a, sb.n AS vocab_b, i.vocab_inter,
       sa.n + sb.n - i.vocab_inter AS vocab_union,
       i.vocab_inter * 1000000 // (sa.n + sb.n - i.vocab_inter)
         AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


@query(
    "text_vocab_overlap",
    oracle=_VOCAB_OVERLAP_ORACLE,
    tags=("text", "set", "join"),
)
def text_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-mixture
    diagnostic ("how much does src2's wording overlap src0's?") that
    decides whether two crawl snapshots are near-duplicates at the
    *distribution* level before any per-document dedup runs.

    Scale shape: the corpus-sized work is one DISTINCT over
    (source, token) — vocabulary-bounded output (Heaps' law: sublinear
    in corpus size; cf. ``text_heaps_vocab_growth``), with map-side
    partials so the shuffle carries tokens once per source, not per
    occurrence. The pair join is an equi-join on token whose fan-out is
    ≤ n_sources² rows per token; with S sources the result is the
    S·(S−1)/2 matrix — bytes. At very large vocabularies, swap the
    exact DISTINCT for the KMV sketch (``agg_theta_sketch_setops``)
    and estimate the same Jaccard from bottom-k hashes."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(
                F.array_distinct(F.split(F.lower("text"), r"\s+"))
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("vocab_inter"))
    )
    sa = F.broadcast(sizes).alias("sa")
    sb = F.broadcast(sizes.alias("sb2")).alias("sb")
    return (
        inter.join(sa, F.col("sa.source") == F.col("source_a"))
        .join(sb, F.col("sb.source") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.col("sa.n").alias("vocab_a"),
            F.col("sb.n").alias("vocab_b"),
            "vocab_inter",
            (F.col("sa.n") + F.col("sb.n") - F.col("vocab_inter")).alias(
                "vocab_union"
            ),
            F.expr("vocab_inter * 1000000 DIV (sa.n + sb.n - vocab_inter)").alias(
                "jaccard_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# readability scoring (Flesch reading ease, integer heuristic)
# ---------------------------------------------------------------------------

# All three structural counts are exact integers from the same lambda
# trees in both engines; the Flesch formula then runs entirely in scaled
# integer arithmetic (milli-units, truncating DIV on non-negative
# operands — identical in Spark `DIV` and DuckDB `//`), so no float ever
# appears. Syllables use the standard cheap heuristic: one syllable per
# maximal vowel run (split on '[aeiou]+' yields runs+1 pieces).
_READABILITY_ORACLE = r"""
WITH counts AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(
           list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)),
           x -> x <> '')) AS BIGINT) AS n_sentences,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_words,
         CAST(len(string_split_regex(lower(text), '[aeiou]+')) - 1 AS BIGINT)
           AS n_syllables
  FROM documents
),
scaled AS (
  SELECT doc_id, lang, n_sentences, n_words, n_syllables,
         n_words * 1000 // greatest(n_sentences, 1) AS wps_milli,
         n_syllables * 1000 // greatest(n_words, 1) AS spw_milli
  FROM counts
)
SELECT doc_id, lang, n_sentences, n_words, n_syllables,
       CAST(206835 - (1015 * wps_milli) // 1000 - (84600 * spw_milli) // 1000
         AS BIGINT) AS flesch_milli,
       CASE
         WHEN 206835 - (1015 * wps_milli) // 1000
              - (84600 * spw_milli) // 1000 >= 60000 THEN 'easy'
         WHEN 206835 - (1015 * wps_milli) // 1000
              - (84600 * spw_milli) // 1000 >= 30000 THEN 'standard'
         ELSE 'hard'
       END AS band
FROM scaled
"""


@query("text_readability", oracle=_READABILITY_ORACLE, tags=("text", "quality"))
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from integer structural counts
    (sentences = non-empty terminal-punctuation segments, words =
    non-empty whitespace tokens, syllables = maximal vowel runs) — the
    classic readability gate a pretraining quality mix uses alongside
    ``text_quality``'s ratio features. Non-Latin scripts degrade
    gracefully (zero vowel runs -> the syllable term vanishes).

    Scale shape: pure per-row column expressions (lambda HOFs, no
    explode, no shuffle, no Python) — a map-only operator that pipelines
    with the scan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(size(filter(transform(split(text, '[.!?]+'), x -> trim(x)),"
            " x -> x <> '')) AS BIGINT)"
        ).alias("n_sentences"),
        F.expr(
            r"CAST(size(filter(split(lower(text), '\\s+'), x -> x <> ''))"
            " AS BIGINT)"
        ).alias("n_words"),
        F.expr(
            "CAST(size(split(lower(text), '[aeiou]+')) - 1 AS BIGINT)"
        ).alias("n_syllables"),
    )
    scaled = counts.select(
        "*",
        F.expr("n_words * 1000 DIV greatest(n_sentences, 1)").alias("wps_milli"),
        F.expr("n_syllables * 1000 DIV greatest(n_words, 1)").alias("spw_milli"),
    )
    fre = F.expr(
        "CAST(206835 - (1015 * wps_milli) DIV 1000"
        " - (84600 * spw_milli) DIV 1000 AS BIGINT)"
    )
    return scaled.select(
        "doc_id",
        "lang",
        "n_sentences",
        "n_words",
        "n_syllables",
        fre.alias("flesch_milli"),
        F.when(fre >= 60000, F.lit("easy"))
        .when(fre >= 30000, F.lit("standard"))
        .otherwise(F.lit("hard"))
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# code-vs-prose detection (structural symbol densities)
# ---------------------------------------------------------------------------

# The fast pre-filter a pretraining mix runs before routing documents to
# code-specific processing (different dedup granularity, different
# quality gates): pure density features — symbol characters, braces,
# semicolons per char — computed as length-difference counts (the same
# trick ``curate_model_score`` uses), thresholded into a verdict. All
# integer ppm arithmetic on non-negative operands.
_CODE_SYMBOLS = r"[{}();=<>\[\]]"
_CODE_SYMBOL_PPM = 30_000  # >=3% symbol chars
_CODE_SEMI_PPM = 10_000    # or braces present and >=1% semicolons


@query(
    "text_code_detect",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '{_CODE_SYMBOLS}', '', 'g'))
           AS BIGINT) AS n_symbols,
         CAST(length(text) - length(regexp_replace(text, '[{{}}]', '', 'g'))
           AS BIGINT) AS n_braces,
         CAST(length(text) - length(replace(text, ';', '')) AS BIGINT)
           AS n_semicolons
  FROM documents
),
ppm AS (
  SELECT doc_id, n_chars, n_symbols, n_braces, n_semicolons,
         n_symbols * 1000000 // greatest(n_chars, 1) AS symbol_ppm,
         n_semicolons * 1000000 // greatest(n_chars, 1) AS semicolon_ppm
  FROM feats
)
SELECT doc_id, n_chars, n_symbols, n_braces, n_semicolons,
       CAST(symbol_ppm AS BIGINT) AS symbol_ppm,
       CAST(semicolon_ppm AS BIGINT) AS semicolon_ppm,
       CASE WHEN symbol_ppm >= {_CODE_SYMBOL_PPM}
              OR (n_braces > 0 AND semicolon_ppm >= {_CODE_SEMI_PPM})
            THEN 'code' ELSE 'prose' END AS verdict
FROM ppm
""",
    tags=("text", "quality"),
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing verdict per document from symbol/brace/
    semicolon densities — the cheap structural screen that decides which
    dedup and quality pipeline a document enters. Map-only projection
    (length-difference counting, no explode, no Python): pipelines with
    the scan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    n_symbols = (
        F.length("text")
        - F.length(F.regexp_replace("text", _CODE_SYMBOLS, ""))
    ).cast("bigint")
    n_braces = (
        F.length("text") - F.length(F.regexp_replace("text", "[{}]", ""))
    ).cast("bigint")
    n_semi = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(";")))
    ).cast("bigint")
    feats = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_symbols.alias("n_symbols"),
        n_braces.alias("n_braces"),
        n_semi.alias("n_semicolons"),
    )
    ppm = feats.select(
        "*",
        F.expr("n_symbols * 1000000 DIV greatest(n_chars, 1)").alias(
            "symbol_ppm"
        ),
        F.expr("n_semicolons * 1000000 DIV greatest(n_chars, 1)").alias(
            "semicolon_ppm"
        ),
    )
    return ppm.select(
        "doc_id",
        "n_chars",
        "n_symbols",
        "n_braces",
        "n_semicolons",
        "symbol_ppm",
        "semicolon_ppm",
        F.when(
            (F.col("symbol_ppm") >= _CODE_SYMBOL_PPM)
            | (
                (F.col("n_braces") > 0)
                & (F.col("semicolon_ppm") >= _CODE_SEMI_PPM)
            ),
            F.lit("code"),
        )
        .otherwise(F.lit("prose"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# encoding-artifact screen (mojibake / replacement / control chars)
# ---------------------------------------------------------------------------

# The decode-garbage gate a crawl pipeline runs right after charset
# sniffing: U+FFFD replacement chars (failed decodes), C0 control
# characters (binary-in-text), and the 'Ã' fingerprint of UTF-8 read
# as Latin-1 ('é' -> 'Ã©'). All counts are length-difference
# expressions; a clean corpus yields all-clean verdicts (the crafted
# fixture in tests/test_session2_semantics.py proves detection).
_ENC_CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"


@query(
    "text_encoding_artifacts",
    oracle=rf"""
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(replace(text, chr(65533), ''))
           AS BIGINT) AS n_replacement,
         CAST(length(text)
              - length(regexp_replace(text, '{_ENC_CTRL_CLASS}', '', 'g'))
           AS BIGINT) AS n_control,
         CAST(length(text) - length(replace(text, chr(195), ''))
           AS BIGINT) AS n_mojibake
  FROM documents
)
SELECT doc_id, n_chars, n_replacement, n_control, n_mojibake,
       CASE WHEN n_replacement > 0 OR n_control > 0
              OR n_mojibake * 1000000 >= n_chars * 5000
            THEN 'suspect' ELSE 'clean' END AS verdict
FROM feats
""",
    tags=("text", "quality"),
)
def text_encoding_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact verdict per document: any U+FFFD or C0 control
    character, or an 'Ã'-density over 0.5%, marks the doc suspect for
    re-decode/drop — the screen that keeps charset wreckage out of a
    pretraining mix (pair with ``text_unicode_nfc`` for normalization
    drift). Map-only length-difference counting: no explode, no
    shuffle, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    feats = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("�")))
        ).cast("bigint").alias("n_replacement"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", _ENC_CTRL_CLASS, ""))
        ).cast("bigint").alias("n_control"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("Ã")))
        ).cast("bigint").alias("n_mojibake"),
    )
    return feats.select(
        "*",
        F.when(
            (F.col("n_replacement") > 0)
            | (F.col("n_control") > 0)
            | (F.col("n_mojibake") * 1000000 >= F.col("n_chars") * 5000),
            F.lit("suspect"),
        )
        .otherwise(F.lit("clean"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# automatic stopword detection (document-frequency ratio)
# ---------------------------------------------------------------------------

_STOPWORD_DF_PPM = 500_000  # appears in >= 50% of documents

_STOPWORD_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, u.term
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(arr) AS term) u
  WHERE u.term <> ''
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY term
)
SELECT df.term, df.df, n.n_docs,
       CAST(df.df * 1000000 // n.n_docs AS BIGINT) AS df_ppm
FROM df CROSS JOIN n
WHERE df.df * 1000000 >= n.n_docs * {_STOPWORD_DF_PPM}
"""


@query("text_stopword_autodetect", oracle=_STOPWORD_ORACLE, tags=("text",))
def text_stopword_autodetect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived stopword list: every token present in >= 50% of
    documents — the language-agnostic way multilingual pipelines get
    stopword lists without shipping per-language dictionaries (feeds
    ``text_quality``'s stopword-ratio feature and
    ``text_rake_keywords``' phrase boundaries).

    Scale shape: one DISTINCT over (doc, term) with map-side partials
    (vocabulary-bounded output per Heaps' law), a term-keyed count,
    and a scalar broadcast; the threshold test is exact integer
    cross-multiplication — no division decides membership."""
    docs = load_table_scaled(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower("text"), r"\s+"))
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    n = toks.select(F.countDistinct("doc_id").alias("n_docs"))
    df = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        df.crossJoin(F.broadcast(n))
        .filter(F.col("df") * 1000000 >= F.col("n_docs") * _STOPWORD_DF_PPM)
        .select(
            "term",
            "df",
            "n_docs",
            F.expr("df * 1000000 DIV n_docs").cast("long").alias("df_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations: word pairs glued together more than chance
# ---------------------------------------------------------------------------

# pmi(a,b) = ln( c_ab · N_bigrams / (c_a · c_b) ) over adjacent word
# pairs; all counts are exact integers, PMI is one double expression.
# The min-count floor (5) is the standard noise gate — PMI of rare
# pairs explodes.
_PMI_MIN_COUNT = 5

_PMI_TEMPLATE = """
WITH toks AS (
  {TOKENS}
),
bigrams AS (
  SELECT doc_id, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
  FROM toks
),
bg AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM bigrams WHERE w2 IS NOT NULL GROUP BY w1, w2
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
),
tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM bg)
SELECT b.w1, b.w2, b.c_ab,
       ua.c AS c_a, ub.c AS c_b,
       CAST(FLOOR(LN(CAST(b.c_ab AS DOUBLE) * t.n / (ua.c * ub.c)) * 1000000)
            AS BIGINT) AS pmi_micro
FROM bg b
JOIN uni ua ON ua.w = b.w1
JOIN uni ub ON ub.w = b.w2
CROSS JOIN tot t
WHERE b.c_ab >= {MIN_COUNT}
ORDER BY pmi_micro DESC, b.w1, b.w2
LIMIT 50
"""

_PMI_TOKENS_DUCK = """
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '\\s+')) AS w,
         generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS i
  FROM documents
"""

_PMI_TOKENS_SPARK = """
  SELECT doc_id, pe.w, pe.i
  FROM documents
  LATERAL VIEW posexplode(split(lower(text), '\\\\s+')) pe AS i, w
"""


@query(
    "text_collocations_pmi",
    oracle=_PMI_TEMPLATE.format(TOKENS=_PMI_TOKENS_DUCK, MIN_COUNT=_PMI_MIN_COUNT),
    tags=("text",),
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by pointwise mutual information: adjacent
    word pairs that co-occur far above what their individual
    frequencies predict — the phrase detector ('new york', 'machine
    learning') run before vocabulary building, and the
    information-theoretic upgrade of ``text_bpe_pair_counts``'s raw
    pair frequencies. Exact integer counts; one LN per surviving pair;
    a min-count floor keeps rare-pair PMI from exploding.

    Scale shape: tokenize map-side, one lead window per document
    (partitioned by doc), two hash aggregates; unigram counts join
    back at vocabulary width (AQE broadcasts)."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        _PMI_TEMPLATE.format(TOKENS=_PMI_TOKENS_SPARK, MIN_COUNT=_PMI_MIN_COUNT)
    )


# ---------------------------------------------------------------------------
# overlapping sliding-window chunking (RAG ingestion)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 30   # tokens per chunk
_CHUNK_STRIDE = 20  # tokens between chunk starts -> 10-token overlap

_CHUNK_OVERLAP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, ' +') AS toks
  FROM documents WHERE length(text) > 0
),
s AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, len(toks), {_CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_SIZE}, n - start) AS BIGINT) AS n_toks,
       md5(array_to_string(toks[start + 1 : least(start + {_CHUNK_SIZE}, n)],
                           ' ')) AS chunk_md5
FROM s
"""


@query("text_chunk_overlap", oracle=_CHUNK_OVERLAP_ORACLE, tags=("text",))
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG ingestion staple
    (``udtf_chunk_text`` cuts disjoint chunks; retrieval wants ~33%
    overlap so no answer span is split across a boundary with no chunk
    containing it whole): token windows of {size} starting every
    {stride} tokens, identified by an md5 over the joined window so the
    oracle pins exact chunk CONTENT, not just counts. The tail chunk
    may be short (never empty); every consecutive chunk pair shares
    ``size - stride`` tokens (pinned in test_new_ops_semantics).

    Scale shape: pure per-row array expressions (split → sequence →
    explode → slice) — a narrow map over the corpus, zero shuffle,
    whole-stage codegen; output is ~n_tokens/stride rows per doc. The
    natural downstream is ``emb``-side encoding per chunk_md5 (dedup
    of shared windows for free).""".replace(
        "{size}", str(_CHUNK_SIZE)
    ).replace("{stride}", str(_CHUNK_STRIDE))
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    t = docs.select(
        "doc_id", F.split("text", " +").alias("toks")
    ).withColumn("n", F.size("toks"))
    s = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    return s.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_tok"),
        F.least(F.lit(_CHUNK_SIZE), F.col("n") - F.col("start"))
        .cast("long")
        .alias("n_toks"),
        F.md5(
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(_CHUNK_SIZE)),
                " ",
            )
        ).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# language-ID evaluation: confusion matrix vs the labeled corpus
# ---------------------------------------------------------------------------

_LANGID_EVAL_ORACLE = f"""
WITH pred AS ({_LANGID_ORACLE}),
conf AS (
  SELECT d.lang AS lang_true, p.lang_pred,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
  GROUP BY d.lang, p.lang_pred
)
SELECT lang_true, lang_pred, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang_true) AS BIGINT)
         AS recall_ppm,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang_pred) AS BIGINT)
         AS precision_ppm
FROM conf
"""


@query("text_langid_eval", oracle=_LANGID_EVAL_ORACLE, tags=("text", "eval"))
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVALUATION as a first-class pipeline stage: the
    ``text_langid`` heuristic scored against the corpus's labeled
    ``lang`` column — full confusion matrix with per-cell recall (n /
    true-class total) and precision (n / predicted-class total) in
    exact integer ppm. A curation pipeline ships the filter AND its
    measured quality; the diagonal of this matrix is the number a
    reviewer signs off on before the filter gates terabytes.

    Scale shape: the predictor is the same narrow map as text_langid;
    the eval adds one (true, pred) hash aggregate (≤ |langs|² rows)
    and two class-keyed windows over that tiny frame."""
    register_views(spark, sf_dir, ("documents",))
    pred = text_langid(spark, sf_dir).select("doc_id", "lang_pred")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_true")
    )
    conf = (
        docs.join(pred, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_true = Window.partitionBy("lang_true")
    w_pred = Window.partitionBy("lang_pred")
    return conf.select(
        "lang_true",
        "lang_pred",
        "n",
        F.expr("n * 1000000").cast("long").alias("_num"),
    ).select(
        "lang_true",
        "lang_pred",
        "n",
        (F.col("_num") / F.sum("n").over(w_true))
        .cast("long")
        .alias("recall_ppm"),
        (F.col("_num") / F.sum("n").over(w_pred))
        .cast("long")
        .alias("precision_ppm"),
    )


# ---------------------------------------------------------------------------
# quality-threshold ablation: retention curve before committing a cutoff
# ---------------------------------------------------------------------------

_QCUTS = (-200, 0, 100, 200, 300)  # quality_score milli cutoffs

_QUALITY_ABLATION_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
cuts AS (
  {" UNION ALL ".join(f"SELECT CAST({c} AS BIGINT) AS cut_milli" for c in _QCUTS)}
)
SELECT c.cut_milli,
       CAST(SUM(CASE WHEN FLOOR(q.quality_score * 1000) >= c.cut_milli
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN FLOOR(q.quality_score * 1000) >= c.cut_milli
                     THEN q.n_tokens ELSE 0 END) AS BIGINT)
         AS retained_tokens,
       CAST(FLOOR(SUM(CASE WHEN FLOOR(q.quality_score * 1000) >= c.cut_milli
                           THEN 1.0 ELSE 0.0 END) * 1000000 / COUNT(*))
            AS BIGINT) AS retention_ppm
FROM q CROSS JOIN cuts c
GROUP BY c.cut_milli
"""


@query(
    "curate_quality_ablation",
    oracle=_QUALITY_ABLATION_ORACLE,
    tags=("curation", "text"),
)
def curate_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-cutoff ablation — ``dedup_threshold_sweep`` for the
    quality filter: document and token retention at five candidate
    cutoffs of the ``text_quality`` score, computed in ONE corpus pass
    (the score evaluates once per doc; the cutoff dimension is a
    5-row cross join). This is the curve a data lead reads before
    committing a filter that will delete terabytes — 'cut at 0.2 keeps
    61% of docs but 74% of tokens' is a decision, not a default.

    Scale shape: the scoring map is the corpus-sized stage; the sweep
    adds ×|cuts| narrow rows into one hash aggregate. Same single-scan
    discipline as the dedup sweep."""
    q = text_quality(spark, sf_dir).select("quality_score", "n_tokens")
    cuts = spark.createDataFrame(
        [(c,) for c in _QCUTS], "cut_milli long"
    )
    keep = F.floor(F.col("quality_score") * 1000) >= F.col("cut_milli")
    return (
        q.crossJoin(F.broadcast(cuts))
        .groupBy("cut_milli")
        .agg(
            F.sum(keep.cast("int")).cast("long").alias("n_retained"),
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("retained_tokens"),
            F.floor(
                F.sum(keep.cast("double")) * 1000000 / F.count(F.lit(1))
            )
            .cast("long")
            .alias("retention_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# boilerplate template detection (CCNet-style, n-gram form)
# ---------------------------------------------------------------------------
#
# Crawl corpora are full of repeated template fragments (navigation
# chrome, cookie banners, footer legalese); CCNet drops lines whose
# hash repeats across documents. These documents carry no line
# structure, so the same detector runs at 3-gram granularity: a
# "template" is a trigram appearing in >= _BP_MIN_DF distinct
# documents. Output = the top-20 templates with their document
# frequency and source spread — the removal list a cleaning pass
# would subtract.

_BP_K = 3
_BP_MIN_DF = 5
_BP_TOP = 20

_BP_SHINGLES_DUCK = (
    "CASE WHEN len(toks) >= {k} THEN list_distinct(list_transform("
    "range(1, len(toks) - {km2}), i -> array_to_string(toks[i:i+{km1}], ' ')))"
    " ELSE [array_to_string(toks, ' ')] END"
).format(k=_BP_K, km1=_BP_K - 1, km2=_BP_K - 2)

_BOILERPLATE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
         string_split_regex(lower(text), '\\s+') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, source, unnest({_BP_SHINGLES_DUCK}) AS shingle FROM d
),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
df AS (
  SELECT shingle,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM s GROUP BY shingle
)
SELECT shingle, df, n_sources,
       CAST(df * 1000000 // (SELECT n_docs FROM c) AS BIGINT) AS df_ppm
FROM df
WHERE df >= {_BP_MIN_DF}
QUALIFY row_number() OVER (ORDER BY df DESC, shingle) <= {_BP_TOP}
"""


@query(
    "text_boilerplate_ngrams",
    oracle=_BOILERPLATE_ORACLE,
    tags=("text", "dedup"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate template detection: per-document DISTINCT trigrams
    (so a template spamming one page doesn't inflate its score),
    document frequency + source spread per trigram, templates = df >=
    {df}. The top-20 table is what a CCNet-style cleaner subtracts
    from every document before quality scoring.

    Scale shape: tokenize + shingle are narrow maps; the only shuffle
    is the (shingle -> df) hash aggregate, partial-aggregated map-side
    because per-doc shingles are pre-distinctetd. The final top-20 is
    a TakeOrdered over the df table (never a global sort of the
    corpus). At 100 TB the df table is vocabulary-sized (n-grams with
    df >= 2 are a tiny fraction of token mass), and the threshold
    filter prunes it before the limit.""".replace("{df}", str(_BP_MIN_DF))
    docs = load_table_scaled(spark, sf_dir, "documents")
    shingles = (
        docs.select(
            "doc_id",
            "source",
            F.split(F.lower("text"), r"\s+").alias("toks"),
        )
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= {k} THEN array_distinct(transform("
                    "sequence(0, size(toks) - {k}), i -> concat_ws(' ', slice(toks, i + 1, {k}))))"
                    " ELSE array(concat_ws(' ', toks)) END".replace(
                        "{k}", str(_BP_K)
                    )
                )
            ).alias("shingle"),
        )
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = (
        shingles.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .filter(F.col("df") >= _BP_MIN_DF)
    )
    return (
        df.crossJoin(F.broadcast(n_docs))
        .select(
            "shingle",
            "df",
            "n_sources",
            F.expr("CAST(df * 1000000 DIV n_docs AS BIGINT)").alias("df_ppm"),
        )
        .orderBy(F.col("df").desc(), "shingle")
        .limit(_BP_TOP)
    )
