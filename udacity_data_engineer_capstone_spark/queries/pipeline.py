"""Driver-visible entries for the full i94 pipeline, hash-verified.

The pipeline consumes reference-shaped fixture inputs (not the TPC-H
testdata), so its oracles cannot use the pre-registered views. Instead,
fixtures are generated at a stable path at registration time, and each
oracle reads them directly with DuckDB's ``read_parquet``/``read_csv`` —
replicating the reference dataflow (``/root/reference/etl.py:151-221``)
in SQL over ground-truth inputs:

- the oracle's lookup dims are the *tuples the SAS labels file was
  rendered from*, so the engine's dictionary parser is independently
  verified by the star-join comparison;
- the SAS date decode, junk-label handling, 'CITY, ST' splitting, and
  the implicit string↔double join/SUM coercions are re-expressed in
  DuckDB SQL (same semantics as queries/reference_ops.py twins).

All sums are exact (integer-valued populations, counts), so full value
hashes match without float tolerance.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.catalog import (
    load_table,
    load_table_scaled,
    register_views,
)
from udacity_data_engineer_capstone_spark.operators.ordinal import (
    global_rank_segments,
    global_rank_segments_multi,
    ntile_cuts,
)
from udacity_data_engineer_capstone_spark.pipelines import i94
from udacity_data_engineer_capstone_spark.registry import query
from udacity_data_engineer_capstone_spark.sources import i94_fixtures

# Registration time needs only the PATHS (oracle SQL embeds them as
# absolute strings); the files themselves are generated lazily and
# atomically on first pipeline execution — no import-time I/O.
_P = i94_fixtures.fixture_paths()


# i94.run mirrors the reference's temp-view dataflow, which REBINDS
# `tbl_demographics` mid-run (raw view → SQL → aggregated view → SQL).
# Temp views are session-global, so two concurrent pipeline runs (the
# two pipe_i94_* queries overlapped from driver threads) can interleave
# the rebind and resolve the WRONG schema. The pipeline run is
# serialized; its outputs are plain DataFrames and stay thread-safe.
_I94_RUN_LOCK = threading.Lock()


def _run_pipeline(spark: SparkSession) -> dict[str, DataFrame]:
    i94_fixtures.generate_stable()
    paths = i94.I94Paths(
        labels=_P["labels"],
        demographics=_P["demographics"],
        immigration=_P["immigration"],
        output=_P["output"],
    )
    with _I94_RUN_LOCK:
        return i94.run(spark, paths, write=False)


# SQL twin of build_immigration_fact (etl.py:151-191): five star joins on
# mixed string/double keys (VARCHAR dim codes cast to DOUBLE where the
# fact key is a double), the day-0→NULL SAS date decode, and the
# null-rejecting WHERE folded into INNER joins (= EliminateOuterJoin on
# the Spark side).
_FACT_ORACLE = f"""
WITH states AS (
  SELECT code FROM read_parquet('{_P["dim_states"]}') WHERE code <> '99'
),
visas AS (SELECT code FROM read_parquet('{_P["dim_visas"]}')),
modes AS (SELECT code FROM read_parquet('{_P["dim_modes"]}')),
ports AS (SELECT code FROM read_parquet('{_P["dim_ports"]}')),
countries AS (SELECT code FROM read_parquet('{_P["dim_countries"]}')),
imm AS (SELECT * FROM read_parquet('{_P["immigration"]}'))
SELECT i.i94yr AS "year",
       i.i94mon AS "month",
       lc.code AS residence_country,
       lp.code AS port,
       CASE WHEN i.arrdate IS NULL OR CAST(floor(i.arrdate) AS INT) = 0
            THEN NULL
            ELSE strftime(DATE '1960-01-01' + CAST(floor(i.arrdate) AS INT),
                          '%Y-%m-%d')
       END AS arrival_date,
       lm.code AS "mode",
       ls.code AS state_code,
       i.depdate AS departure_date,
       i.i94bir AS age,
       lvt.code AS visa_type_code,
       i.occup AS occupation,
       i.gender AS gender,
       i.biryear AS birth_year,
       i.dtaddto AS allowed_date,
       i.airline AS airline,
       i.admnum AS admission_number,
       i.fltno AS flight_number,
       i.visatype AS visa_type
FROM imm i
JOIN states    ls  ON ls.code = i.i94addr
JOIN visas     lvt ON CAST(lvt.code AS DOUBLE) = i.i94visa
JOIN modes     lm  ON CAST(lm.code AS DOUBLE) = i.i94mode
JOIN ports     lp  ON lp.code = i.i94port
JOIN countries lc  ON CAST(lc.code AS DOUBLE) = i.i94res
"""

_DEMO_COLUMNS = """{
    'city': 'VARCHAR', 'state': 'VARCHAR', 'median_age': 'DOUBLE',
    'male_population': 'VARCHAR', 'female_population': 'VARCHAR',
    'total_population': 'INTEGER', 'number_of_veterans': 'INTEGER',
    'number_of_foreign_born': 'INTEGER', 'average_household_size': 'DOUBLE',
    'state_code': 'VARCHAR', 'race': 'VARCHAR', 'count': 'INTEGER'
}"""

# SQL twin of build_port_demographics (etl.py:194-221): drop NULL-state
# rows, aggregate per (city, state_code) — population sums are
# string→double coercions over integer-valued text, exact in any fold
# order — then the case-insensitive city join against the split 'CITY,
# ST' port labels (comma-less labels yield NULL state and never match).
_PORT_DEMO_ORACLE = f"""
WITH demo AS (
  SELECT * FROM read_csv('{_P["demographics"]}', delim=';', header=true,
                         columns={_DEMO_COLUMNS})
  WHERE state_code IS NOT NULL
),
agg AS (
  SELECT city, state_code,
         SUM(CAST(male_population AS DOUBLE)) AS total_male_population,
         SUM(CAST(female_population AS DOUBLE)) AS total_female_population,
         CAST(SUM(total_population) AS BIGINT) AS total_population,
         CAST(SUM(number_of_veterans) AS BIGINT) AS number_of_veterans,
         CAST(SUM(number_of_foreign_born) AS BIGINT) AS number_of_foreign_born
  FROM demo GROUP BY city, state_code
),
ports AS (
  SELECT code,
         trim(split_part(value, ',', 1)) AS city,
         CASE WHEN value LIKE '%,%'
              THEN trim(split_part(value, ',', 2)) END AS state_code
  FROM read_parquet('{_P["dim_ports"]}')
)
SELECT lp.code AS port_code, td.city, td.state_code,
       td.total_male_population, td.total_female_population,
       td.total_population, td.number_of_veterans, td.number_of_foreign_born
FROM ports lp
JOIN agg td
  ON lower(td.city) = lower(lp.city) AND td.state_code = lp.state_code
"""


@query("pipe_i94_fact", oracle=_FACT_ORACLE, tags=("pipeline",))
def pipe_i94_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference dataflow (etl.py:224-266) → immigrations fact."""
    return _run_pipeline(spark)["immigrations"]


@query("pipe_i94_port_demographics", oracle=_PORT_DEMO_ORACLE, tags=("pipeline",))
def pipe_i94_port_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference dataflow → port_demographics dim."""
    return _run_pipeline(spark)["port_demographics"]


# ---------------------------------------------------------------------------
# training-corpus curation pipeline (north-star main())
# ---------------------------------------------------------------------------

# the stages reuse the registered operators' exact constants so the
# pipeline and its unit operators can never drift apart
from udacity_data_engineer_capstone_spark.operators.curation import (  # noqa: E402
    BENCH_MOD,
    BENCH_REMAINDER,
    CONTAM_THRESHOLD,
    GROUP_CAP,
    MIN_TOKENS,
    PACK_BUDGET,
    curate_contamination,
)

_CORPUS_PIPE_ORACLE = f"""
WITH q AS (
  SELECT doc_id, source, lang,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS INT)
           AS n_tokens
  FROM documents
  WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= {MIN_TOKENS}
    AND doc_id % {BENCH_MOD} <> {BENCH_REMAINDER}
),
capped AS (
  SELECT * FROM (
    SELECT q.*, row_number() OVER (PARTITION BY source, lang
                                   ORDER BY doc_id) AS rn
    FROM q
  ) WHERE rn <= {GROUP_CAP}
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
                range(1, len(toks) - 1),
                i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
        FROM documents)
),
bench AS (
  SELECT DISTINCT unnest(shingles) AS gram
  FROM sh WHERE doc_id % {BENCH_MOD} = {BENCH_REMAINDER}
),
contaminated AS (
  SELECT e.doc_id
  FROM (SELECT doc_id, unnest(shingles) AS gram FROM sh
        WHERE doc_id % {BENCH_MOD} <> {BENCH_REMAINDER}) e
  JOIN sh s ON s.doc_id = e.doc_id
  WHERE gram IN (SELECT gram FROM bench)
  GROUP BY e.doc_id, len(s.shingles)
  HAVING CAST(COUNT(*) AS DOUBLE) / len(s.shingles) >= {CONTAM_THRESHOLD}
),
kept AS (
  SELECT doc_id, source, lang, n_tokens FROM capped
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT doc_id, source, lang, n_tokens,
       CAST(floor(
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)
         / {PACK_BUDGET}.0) AS BIGINT) AS seq_id
FROM kept
"""


@query(
    "pipe_corpus_curation",
    oracle=_CORPUS_PIPE_ORACLE,
    tags=("pipeline", "dedup", "text"),
)
def pipe_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data ``main()``: quality gate → benchmark-doc
    exclusion → per-(source, lang) cap → n-gram decontamination →
    token-budget sequence packing, one lazy dataflow.

    Composition is by DataFrame reuse of the registered unit operators
    (same constants, same semantics), so the pipeline is exactly the sum
    of its independently-verified parts. Shuffle inventory at scale: one
    window on the cap key, one broadcast-join for contamination, one
    window on the pack key — documents themselves shuffle only for the
    two windows, both on composite keys with WindowGroupLimit / running
    sums that partial-aggregate map-side."""
    from udacity_data_engineer_capstone_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == BENCH_REMAINDER
    q = (
        docs.withColumn("n_tokens", F.size(F.split(F.lower("text"), r"\s+")))
        .filter((F.col("n_tokens") >= MIN_TOKENS) & ~is_bench)
        .select("doc_id", "source", "lang", "n_tokens")
    )
    w_cap = Window.partitionBy("source", "lang").orderBy("doc_id")
    capped = (
        q.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= GROUP_CAP)
        .drop("rn")
    )
    contaminated = (
        curate_contamination(spark, sf_dir)
        .filter(F.col("is_contaminated"))
        .select("doc_id")
    )
    kept = capped.join(contaminated, "doc_id", "left_anti")
    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w_pack), F.lit(0))
    return kept.select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        F.floor(cum_before / PACK_BUDGET).cast("long").alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# per-user 360 profile: sessions + funnel + RFM in one dataflow
# ---------------------------------------------------------------------------

# Composite analytics pipeline over the event stream — the "user 360"
# table a growth team materializes nightly. Every metric is exact
# integer arithmetic (session counts from gaps-and-islands, funnel
# stage timestamps as epoch µs, monetary cents) and the quartile cuts
# use total-order ntile — deterministic end to end. SQL text shared
# verbatim with the oracle (Spark swaps in unix_micros).
_E360_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         CAST(SUM(new_session) AS BIGINT) AS n_sessions,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
  FROM ordered
  GROUP BY user_id
),
first_view AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
first_click AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN first_view v
    ON v.user_id = e.user_id AND e.ts > v.t0
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
),
converted AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN first_click c
    ON c.user_id = e.user_id AND e.ts > c.t1
  WHERE e.event_type = 'purchase'
),
scored AS (
  SELECT s.user_id, s.n_sessions, s.n_events, s.monetary_cents,
         (c.user_id IS NOT NULL) AS converted,
         ntile(4) OVER (ORDER BY s.last_us, s.user_id) AS r_q,
         ntile(4) OVER (ORDER BY s.n_events, s.user_id) AS f_q,
         ntile(4) OVER (ORDER BY s.monetary_cents, s.user_id) AS m_q
  FROM sess s LEFT JOIN converted c ON c.user_id = s.user_id
)
SELECT user_id, n_sessions, n_events, monetary_cents, converted,
       CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
FROM scored
"""


@query("pipe_event_360", oracle=_E360_SQL, tags=("pipeline", "events"))
def pipe_event_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end user-360 profile: 30-minute sessionization
    (gaps-and-islands), strict view→click→purchase funnel conversion,
    and RFM quartile coding, joined into one row per user.

    Scale shape: everything is keyed by user_id — the window sort, the
    three funnel-stage aggregates, and the final joins all share one
    hash partitioning (Catalyst reuses the exchange); the quartile
    CODES never need the ranks themselves, so the cuts are
    boundary-only (``operators.ordinal.global_rank_segments_multi`` +
    ``ntile_cuts``: shared histogram, per-bucket counts, one small job
    over just the cut-rank buckets, then literal comparisons) —
    identical codes to the oracle's ntile windows, with no window and
    no exchange in the output stage."""
    register_views(spark, sf_dir, ("events",))
    # shared CTE text up to (but not including) the ntile stage; the
    # quartiles themselves come from the two-phase ordinal below
    base_sql = (
        _E360_SQL.replace("epoch_us(ts)", "unix_micros(ts)").split("scored AS")[0]
        + """base AS (
  SELECT s.user_id, s.n_sessions, s.n_events, s.monetary_cents, s.last_us,
         (c.user_id IS NOT NULL) AS converted
  FROM sess s LEFT JOIN converted c ON c.user_id = s.user_id
)
SELECT * FROM base"""
    )
    base = spark.sql(base_sql)
    # the quartile CODES never need the ranks — boundary-only ntile
    # (global_rank_segments_multi + ntile_cuts): one shared histogram,
    # one grouping-sets count, one small job over the 9 cut-rank
    # buckets, then pure literal comparisons — no window, no exchange
    # in the output stage
    cuts4 = lambda n: ntile_cuts(n, 4)  # noqa: E731
    m, _n = global_rank_segments_multi(
        base,
        [
            (F.col("last_us"), F.col("user_id"), False, cuts4, "__r"),
            (F.col("n_events"), F.col("user_id"), False, cuts4, "__f"),
            (F.col("monetary_cents"), F.col("user_id"), False, cuts4, "__m"),
        ],
    )
    r_q = F.col("__r") + 1
    f_q = F.col("__f") + 1
    m_q = F.col("__m") + 1
    return m.select(
        "user_id",
        "n_sessions",
        "n_events",
        "monetary_cents",
        "converted",
        (r_q * 100 + f_q * 10 + m_q).cast("int").alias("rfm_code"),
    )


# ---------------------------------------------------------------------------
# pretraining-mix pipeline: quality -> dedup -> tier -> DSIR -> shards
# ---------------------------------------------------------------------------

# The stages reuse the registered operators VERBATIM (functions on the
# Spark side, oracle constants on the DuckDB side), so the pipeline and
# its unit operators cannot drift apart.
from udacity_data_engineer_capstone_spark.operators.curation import (  # noqa: E402
    _DSIR_ORACLE,
    _MODEL_ORACLE,
    _SHARD_MIX,
    _SHARDS,
    _dsir_feats_from_pairs,
    _dsir_scored,
    _model_feat_cols,
    _model_score_col,
    curate_model_score,
)
from udacity_data_engineer_capstone_spark.operators.retrieval import (  # noqa: E402
    _CCNET_ORACLE,
    _ccnet_buckets_from_lm,
    _lm_scores_from_pairs,
    curate_ccnet_buckets,
)

_PRETRAIN_MIX_ORACLE = f"""
WITH model AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS qrk,
           COUNT(*) OVER () AS qn
    FROM ({_MODEL_ORACLE}) _m
  ) _q WHERE qrk * 2 <= qn
),
keepers AS (
  SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)
),
cc AS (
  SELECT doc_id, bucket FROM ({_CCNET_ORACLE}) _c
  WHERE bucket IN ('head', 'middle')
),
ds AS (
  SELECT doc_id, dsir_score_micro FROM ({_DSIR_ORACLE}) _d
),
surv AS (
  SELECT d.doc_id, cc.bucket, ds.dsir_score_micro
  FROM documents d
  JOIN model USING (doc_id)
  JOIN cc USING (doc_id)
  JOIN ds USING (doc_id)
  WHERE d.lang = 'en'
    AND d.doc_id IN (SELECT keep_id FROM keepers)
),
half AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY dsir_score_micro DESC, doc_id) AS rk,
         COUNT(*) OVER () AS n
  FROM surv
),
sel AS (
  SELECT doc_id, bucket, dsir_score_micro,
         {_SHARD_MIX.format(key="doc_id")} AS mix
  FROM half WHERE rk * 2 <= n
)
SELECT doc_id, bucket, dsir_score_micro,
       CAST(mix % {_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY mix % {_SHARDS}
                               ORDER BY mix, doc_id) AS BIGINT) AS position
FROM sel
"""


@query(
    "pipe_pretrain_mix",
    oracle=_PRETRAIN_MIX_ORACLE,
    tags=("pipeline", "dedup", "quality"),
)
def pipe_pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data recipe as ONE dataflow: English slice
    → upper-half linear-classifier quality cut (``curate_model_score``'s
    score; a RELATIVE cut — this corpus sits entirely under that
    operator's absolute keep threshold) → exact dedup
    keep-earliest → CCNet head/middle fluency tiers
    (``curate_ccnet_buckets``) → DSIR top-half selection toward the
    target distribution (``curate_dsir``) → deterministic epoch shard/
    position assignment (``curate_shard_shuffle``'s mix). Every stage
    is the registered operator reused verbatim; the output is the
    loader-ready training order.

    Scale shape: each stage keeps its own audited shape (map-only
    gates, hash-width dedup shuffle, broadcast LR model, per-shard
    sorts); the stages compose via doc_id semi/equi joins that carry
    ids and small scores, never text. Both median cuts (quality half,
    DSIR half) only ever consume "rank <= n//2", so they are
    BOUNDARY-ONLY (``operators.ordinal.global_rank_segments``: locate
    the n//2-th row exactly, then a literal-comparison filter) —
    identical survivors to a global-window rank, but the composed plan
    carries no window and no single-partition exchange, and the cut
    itself adds zero shuffles.

    r13 (VERDICT r12 item 3, guide §2.3/§6 — stage the shared corpus
    once): the mix used to scan the document text independently in
    FOUR branches (model score, md5 keepers, the CCNet LM's token
    explode, the DSIR featurizer's token explode — plus a fifth
    doc_id/lang scan for the English slice). Now ONE materialized
    doc-sized projection (doc_id, lang, md5, the 4 classifier feature
    ints — never text) feeds the model/keepers/en-slice branches, and
    ONE materialized token fold (doc_id, lang, term, tf) feeds both
    the LM and DSIR branches via their _from_pairs/_from_lm seams —
    identical values by construction (every occurrence of a term
    carries the same md5 bucket and the same lp_micro; the per-doc
    sums are the same integers)."""
    register_views(spark, sf_dir, ("documents",))
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", F.md5("text").alias("h"), *_model_feat_cols()
    ).localCheckpoint(eager=False)
    scored = base.select(
        "doc_id", _model_score_col().cast("bigint").alias("score_micro")
    )
    # rk*2 <= n ⟺ rank <= n//2: boundary-only cut — no window, no
    # exchange in the surviving plan (see global_rank_segments)
    qseg, _qn = global_rank_segments(
        scored,
        F.col("score_micro"),
        F.col("doc_id"),
        lambda n: [n // 2],
        descending=True,
        out="__qseg",
    )
    model = qseg.filter(F.col("__qseg") == 0).select("doc_id")
    keepers = base.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    pairs = (
        load_table_scaled(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .groupBy("doc_id", "lang", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    cc = (
        _ccnet_buckets_from_lm(_lm_scores_from_pairs(pairs))
        .filter(F.col("bucket").isin("head", "middle"))
        .select("doc_id", "bucket")
    )
    # the DSIR SCORING stage only — the pipeline ranks the survivor set
    # itself below, so curate_dsir's own corpus-wide rank machinery
    # (and its construction-time histogram/count jobs) would be dead
    # work here
    ds = _dsir_scored(
        spark, sf_dir, feats=_dsir_feats_from_pairs(pairs)
    ).select("doc_id", "dsir_score_micro")
    surv = (
        base.filter(F.col("lang") == "en")
        .join(model, "doc_id", "left_semi")
        .join(
            keepers.select("keep_id"),
            F.col("doc_id") == F.col("keep_id"),
            "left_semi",
        )
        .join(cc, "doc_id")
        .join(ds, "doc_id")
        .select("doc_id", "bucket", "dsir_score_micro")
    )
    half, _n = global_rank_segments(
        surv,
        F.col("dsir_score_micro"),
        F.col("doc_id"),
        lambda n: [n // 2],
        descending=True,
        out="__dseg",
    )
    sel = half.filter(F.col("__dseg") == 0).select(
        "doc_id",
        "bucket",
        "dsir_score_micro",
        F.expr(_SHARD_MIX.format(key="doc_id")).alias("mix"),
    )
    wp = Window.partitionBy(F.col("mix") % _SHARDS)
    return sel.select(
        "doc_id",
        "bucket",
        "dsir_score_micro",
        (F.col("mix") % _SHARDS).cast("long").alias("shard"),
        F.row_number()
        .over(wp.orderBy("mix", "doc_id"))
        .cast("long")
        .alias("position"),
    )


# ---------------------------------------------------------------------------
# experiment readout: the full A/B report in one pass
# ---------------------------------------------------------------------------

# Composes the session's experiment toolkit into the one-page readout
# an experimenter actually reads: assignment health (SRM), the
# conversion delta (pooled z²), and the spend-per-user delta (Welch
# t²) — each as a row with its exact-integer inputs and verdict.
# Shared SQL shape; every statistic is a fixed double expression over
# exact integer moments (cf. stat_srm_check / stat_proportion_ztest /
# stat_welch_ttest for the per-piece derivations). Round-10 overflow
# audit: the count-product lanes (Σspend², conv·n cross products, the
# SRM diff² comparison) are quadratic in users and die in int64 at
# ~3e9 users, so they run in the DECIMAL(38,0)↔HUGEINT wide pair —
# exact integers cast to DOUBLE once, values unchanged below the old
# cliff.
def _readout_sql(w: str) -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(((user_id * 2654435761 + 987654321) % 97) % 2 AS BIGINT) AS arm,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_b,
         CAST(SUM(CASE WHEN arm = 0 THEN spend_cents ELSE 0 END) AS BIGINT)
           AS s_a,
         CAST(SUM(CASE WHEN arm = 1 THEN spend_cents ELSE 0 END) AS BIGINT)
           AS s_b,
         CAST(SUM(CASE WHEN arm = 0
                       THEN CAST(spend_cents AS {w}) * spend_cents
                       ELSE 0 END) AS {w}) AS q_a,
         CAST(SUM(CASE WHEN arm = 1
                       THEN CAST(spend_cents AS {w}) * spend_cents
                       ELSE 0 END) AS {w}) AS q_b
  FROM per_user
)
SELECT 'srm' AS metric, n_a AS value_a, n_b AS value_b,
       CAST(FLOOR(CAST(CAST(n_a - n_b AS {w}) * (n_a - n_b) AS DOUBLE)
                  * 1000.0 / (n_a + n_b))
            AS BIGINT) AS stat_milli,
       CAST(n_a - n_b AS {w}) * (n_a - n_b) * 1000000
         > CAST(3841459 AS {w}) * (n_a + n_b)
         AS flagged
FROM m
UNION ALL
SELECT 'conversion_z2', conv_a, conv_b,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(
              (CAST(CAST(conv_a AS {w}) * n_b
                    - CAST(conv_b AS {w}) * n_a AS DOUBLE)
               * CAST(CAST(conv_a AS {w}) * n_b
                      - CAST(conv_b AS {w}) * n_a AS DOUBLE) * (n_a + n_b))
              / (CAST((conv_a + conv_b) AS DOUBLE)
                 * (n_a + n_b - conv_a - conv_b) * n_a * n_b) * 1000
            ) AS BIGINT) END,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN FALSE
            ELSE (CAST(CAST(conv_a AS {w}) * n_b
                       - CAST(conv_b AS {w}) * n_a AS DOUBLE)
                  * CAST(CAST(conv_a AS {w}) * n_b
                         - CAST(conv_b AS {w}) * n_a AS DOUBLE) * (n_a + n_b))
                 / (CAST((conv_a + conv_b) AS DOUBLE)
                    * (n_a + n_b - conv_a - conv_b) * n_a * n_b)
                 > 3.841459 END
FROM m
UNION ALL
SELECT 'spend_welch_t2', s_a, s_b,
       CAST(FLOOR(
         (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         * (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         / ( (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
               / (n_a - 1) / n_a
           + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
               / (n_b - 1) / n_b ) * 1000
       ) AS BIGINT),
       (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
       * (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
       / ( (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
             / (n_a - 1) / n_a
         + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
             / (n_b - 1) / n_b )
       > 3.841459
FROM m
"""


@query(
    "pipe_experiment_readout",
    oracle=_readout_sql("HUGEINT"),
    tags=("pipeline", "experiment"),
)
def pipe_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-page A/B readout: assignment health (SRM chi²),
    conversion delta (pooled z²), and spend-per-user delta (Welch t²)
    over the same hash-assigned arms, one verdict row each — composed
    from the experiment toolkit so the whole report is a single
    two-aggregate pass (per-user rollup, then one 1-row moment
    aggregate fanned into three report rows).

    Scale shape: the only data-sized pass is the per-user rollup;
    every statistic reads the 1-row moment table. Headroom: the spend
    q_a/q_b squared-cents and conv·n lanes were widened to the
    DECIMAL(38,0)↔HUGEINT pair in the round-10 overflow audit (exact
    to 1e38 ≈ any user count × 1e5-cent spends at the 1e12-row
    target); the remaining int64 lanes are the linear sums s_a/s_b
    (≤ ~1e17 at target) and per-arm counts."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_readout_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# incremental corpus ingest: dedupe a new shard against the standing corpus
# ---------------------------------------------------------------------------

# New shard = doc_id % 9 == 0 (pretend late-arriving crawl batch);
# standing corpus = the rest. Admission rules, in order:
#   1. exact-dup against the CORPUS (md5 of text) -> rejected_dup
#   2. exact-dup within the shard itself (keep min doc_id) -> rejected_dup
#   3. quality floor n_chars >= 64                       -> rejected_quality
# The per-source admission report is what an ingest dashboard shows per
# crawl batch.
_INC_INGEST_ORACLE = """
WITH corpus AS (
  SELECT md5(text) AS h FROM documents WHERE doc_id % 9 <> 0
),
shard AS (
  SELECT doc_id, source, n_chars, md5(text) AS h
  FROM documents WHERE doc_id % 9 = 0
),
dedup_in_shard AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM shard
),
classified AS (
  SELECT s.doc_id, s.source,
         CASE WHEN c.h IS NOT NULL THEN 'rejected_dup'
              WHEN s.rn > 1 THEN 'rejected_dup'
              WHEN s.n_chars < 64 THEN 'rejected_quality'
              ELSE 'ingested' END AS outcome
  FROM dedup_in_shard s
  LEFT JOIN (SELECT DISTINCT h FROM corpus) c ON c.h = s.h
)
SELECT source,
       CAST(SUM(CASE WHEN outcome = 'ingested' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ingested,
       CAST(SUM(CASE WHEN outcome = 'rejected_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rejected_dup,
       CAST(SUM(CASE WHEN outcome = 'rejected_quality' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rejected_quality
FROM classified
GROUP BY source
"""


@query("pipe_incremental_ingest", oracle=_INC_INGEST_ORACLE, tags=("pipeline", "dedup"))
def pipe_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingest — the nightly-crawl admission pipeline:
    a new shard is deduplicated against the STANDING corpus (hash
    anti-join: only md5 hashes shuffle, never text), then within
    itself (min-doc-id representative), then quality-gated, and the
    per-source admission report (ingested / dup / low-quality) is what
    the batch review reads. The amortized-production sibling of
    ``dedup_incremental_minhash`` for the exact-dup tier — at 100 TB
    the corpus side is a pre-materialized hash index (or the
    ``join_bloom_prefilter`` filter) rather than a rescan.

    Scale shape: corpus-side work is one projection to (hash) — at
    hash width, map-side combinable; the join keys are 32-char md5s;
    the shard-internal window is shard-sized."""
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    corpus_h = (
        docs.filter(F.col("doc_id") % 9 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    shard = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", "source", "n_chars", F.md5("text").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    in_shard = shard.withColumn("rn", F.row_number().over(w))
    classified = in_shard.join(
        corpus_h.withColumnRenamed("h", "ch"),
        in_shard["h"] == F.col("ch"),
        "left",
    ).select(
        "source",
        F.when(F.col("ch").isNotNull(), F.lit("rejected_dup"))
        .when(F.col("rn") > 1, F.lit("rejected_dup"))
        .when(F.col("n_chars") < 64, F.lit("rejected_quality"))
        .otherwise(F.lit("ingested"))
        .alias("outcome"),
    )
    return classified.groupBy("source").agg(
        F.sum((F.col("outcome") == "ingested").cast("int"))
        .cast("long")
        .alias("n_ingested"),
        F.sum((F.col("outcome") == "rejected_dup").cast("int"))
        .cast("long")
        .alias("n_rejected_dup"),
        F.sum((F.col("outcome") == "rejected_quality").cast("int"))
        .cast("long")
        .alias("n_rejected_quality"),
    )


# ---------------------------------------------------------------------------
# RAG serving pipeline: hybrid retrieve -> budgeted context assembly
# ---------------------------------------------------------------------------

from udacity_data_engineer_capstone_spark.operators.retrieval import (  # noqa: E402
    _HYBRID_ORACLE,
    sim_hybrid_retrieval,
)

_RAG_TOKEN_BUDGET = 256

# The serving chain as one oracle: the hybrid fusion CTE chain (top-20
# fused candidates) joined back to the documents for token counts, then
# greedy in-order context packing under the token budget (cumulative
# sum over fused rank; a doc is kept iff everything through it fits).
_RAG_ORACLE = (
    _HYBRID_ORACLE.rstrip().rsplit("SELECT doc_id, r_sparse, r_dense, fused_ppb", 1)[0]
    + f"""
, ranked AS (
  SELECT doc_id, fused_ppb FROM fused
  QUALIFY row_number() OVER (ORDER BY fused_ppb DESC, doc_id) <= 20
),
ctx AS (
  SELECT r.doc_id, r.fused_ppb,
         CAST(len(string_split_regex(lower(d.text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
),
packed AS (
  SELECT doc_id, fused_ppb, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY fused_ppb DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens,
         CAST(row_number() OVER (ORDER BY fused_ppb DESC, doc_id) AS BIGINT)
           AS slot
  FROM ctx
)
SELECT slot, doc_id, fused_ppb, n_tokens, cum_tokens
FROM packed WHERE cum_tokens <= {_RAG_TOKEN_BUDGET}
"""
)


@query("pipe_rag_serving", oracle=_RAG_ORACLE, tags=("pipeline", "retrieval"))
def pipe_rag_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG serving path end to end: hybrid dense+sparse retrieval
    (BM25 ∪ cosine candidates fused by reciprocal rank), candidates
    joined back to their documents, and greedy in-fused-order context
    packing under a {budget}-token budget — the exact chain between a
    user query and the prompt a generator receives. Kept docs carry
    their slot, token count, and running total, so the serving layer's
    truncation decision is auditable.

    Scale shape: the corpus is touched only by the two index scans
    inside the hybrid step (each ending in a top-k); everything after
    — the doc join (20 ids, broadcastable), the packing window (20
    rows) — is candidate-sized. Per-query serving cost is independent
    of corpus size.""".replace("{budget}", str(_RAG_TOKEN_BUDGET))
    from udacity_data_engineer_capstone_spark.catalog import load_table

    cand = sim_hybrid_retrieval(spark, sf_dir).select("doc_id", "fused_ppb")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    ctx = cand.join(docs, "doc_id")
    w = (
        Window.orderBy(F.col("fused_ppb").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = ctx.select(
        F.row_number()
        .over(Window.orderBy(F.col("fused_ppb").desc(), "doc_id"))
        .cast("long")
        .alias("slot"),
        "doc_id",
        "fused_ppb",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    )
    return packed.filter(F.col("cum_tokens") <= _RAG_TOKEN_BUDGET)
