"""Round-11 regression: synthetic-fixture id offsets must be DERIVED,
never fixed constants.

The sf10 scaled gate caught the class: the CDC change-log's NEW-key
branch used `o_orderkey + 2000000`, which collides with real keys once
the key space passes 2M (sf10 reaches 15M) — two rows at the same
(key, seq) make last-writer-wins ill-defined, and the oracle itself
went NONDETERMINISTIC (two DuckDB runs of the same SQL disagreed by
~4k rows). The dedup corpus's planted ids (+1e6/+2e6) collide the same
way at sf100 (doc_id reaches 5M). Both now derive their offsets from
MAX(key)+1; these tests replay the failure shape with key ranges ABOVE
the old constants.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

import udacity_data_engineer_capstone_spark as engine

engine.load_all()


def test_cdc_new_keys_disjoint_above_old_offset(spark):
    """Keys around 3M (past the old +2e6 offset) must still get
    collision-free NEW rows: every output key unique, NEW keys disjoint
    from the input key space, and the result deterministic."""
    from udacity_data_engineer_capstone_spark.queries.warehouse import (
        _CDC_SQL,
    )

    rows = [(3_000_000 + i, "O", float(100 + i)) for i in range(500)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    df.createOrReplaceTempView("orders")
    try:
        out1 = spark.sql(_CDC_SQL).collect()
        out2 = spark.sql(_CDC_SQL).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        keys = [r["o_orderkey"] for r in out1]
        assert len(keys) == len(set(keys)), "duplicate keys in CDC result"
        in_keys = {k for k, _, _ in rows}
        new_keys = {k for k in keys if k not in in_keys}
        max_in = max(in_keys)
        assert new_keys, "fixture must plant NEW keys"
        assert all(k > max_in for k in new_keys), (
            "NEW keys must live above the real key space"
        )
    finally:
        spark.catalog.dropTempView("orders")


def test_corpus_planted_ids_disjoint_above_old_offset(spark):
    """Planted dup/near-dup ids must be disjoint from originals even
    when real doc_ids exceed the old fixed offsets."""
    from udacity_data_engineer_capstone_spark.operators.dedup import corpus

    with tempfile.TemporaryDirectory(prefix="fixture_off_") as d:
        docs = spark.createDataFrame(
            [(2_500_000 + i, f"text {i % 60}") for i in range(600)],
            "doc_id long, text string",
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        c = corpus(spark, d)
        ids = [r["doc_id"] for r in c.select("doc_id").collect()]
        assert len(ids) == len(set(ids)), "planted ids collide with originals"
        originals = {r[0] for r in docs.select("doc_id").collect()}
        planted = [i for i in ids if i not in originals]
        assert planted and min(planted) > max(originals)


def test_cdc_three_forms_agree(spark, sf_dir):
    """The batch ranked-window replay, the bucketed stateful stream,
    and the native max_by stream must be the SAME table row-for-row."""
    q = engine.QUERIES
    batch = sorted(
        map(tuple, q["cdc_upsert_log"].fn(spark, sf_dir).collect())
    )
    stateful = sorted(
        map(tuple, q["stream_cdc_apply"].fn(spark, sf_dir).collect())
    )
    native = sorted(
        map(tuple, q["stream_cdc_apply_native"].fn(spark, sf_dir).collect())
    )
    assert batch == stateful == native


def test_corpus_offset_is_broadcast_scalar_not_collect(spark, sf_dir):
    """The derived offset must ride the plan as a broadcast scalar —
    corpus() stays lazy (no driver collect on the hot path)."""
    from udacity_data_engineer_capstone_spark.operators.dedup import corpus

    df = corpus(spark, sf_dir)  # must not trigger a job by itself
    assert "doc_id" in df.columns and "text" in df.columns
    n_direct = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert df.count() > n_direct


def test_scd2_new_keys_disjoint_above_old_offset(spark):
    """SCD2's NEW customers must land above the real custkey space even
    when custkeys exceed the old +1e6 offset (sf10 reaches 1.5M)."""
    from udacity_data_engineer_capstone_spark.queries.warehouse import (
        _SCD2_ORACLE,
    )

    df = spark.createDataFrame(
        [(1_200_000 + i, "SEG", float(i)) for i in range(300)],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    df.createOrReplaceTempView("customer")
    try:
        out = spark.sql(_SCD2_ORACLE).collect()
        in_keys = {1_200_000 + i for i in range(300)}
        new_keys = {
            r["c_custkey"]
            for r in out
            if r["c_mktsegment"] == "NEW"
        }
        assert new_keys and new_keys.isdisjoint(in_keys)
        # every real key has exactly one CURRENT version
        cur = [r for r in out if r["is_current"]]
        cur_keys = [r["c_custkey"] for r in cur]
        assert len(cur_keys) == len(set(cur_keys))
    finally:
        spark.catalog.dropTempView("customer")


def test_snapshot_diff_added_keys_disjoint(spark):
    """cdc_snapshot_diff's planted 'added' keys must not collide with
    real orderkeys above the old +3e6 offset (sf10 reaches 15M)."""
    from udacity_data_engineer_capstone_spark.queries.warehouse import (
        _SNAPDIFF_SQL,
    )

    df = spark.createDataFrame(
        [(4_000_000 + i, "O", float(100 + i)) for i in range(400)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    df.createOrReplaceTempView("orders")
    try:
        out1 = spark.sql(_SNAPDIFF_SQL).collect()
        out2 = spark.sql(_SNAPDIFF_SQL).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    finally:
        spark.catalog.dropTempView("orders")


def test_priority_keep_key_cannot_invert(spark):
    """curate_dedup_priority's keep-key encoding must prefer the
    trusted copy even when doc_ids exceed the old fixed key width
    (the +100000 encoding inverted at sf1's 500k ids)."""
    import os
    import tempfile

    from udacity_data_engineer_capstone_spark.operators.curation import (
        curate_dedup_priority,
    )

    with tempfile.TemporaryDirectory(prefix="prio_off_") as d:
        docs = spark.createDataFrame(
            # ids far above the old 100000 width; doc 700000 is %7==0
            # so it gets a planted mirror with the same text
            [(700_000, "dup text", "src0"), (700_001, "other", "src1")],
            "doc_id long, text string, source string",
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["text_hash"]: r for r in curate_dedup_priority(spark, d).collect()
        }
        dup_rows = [r for r in out.values() if r["n_copies"] == 2]
        assert len(dup_rows) == 1
        r = dup_rows[0]
        # the TRUSTED original must win, and the mirror must be counted
        assert r["keep_doc"] == 700_000 and r["n_mirrors"] == 1, r


def test_embedding_corpus_planted_vec_ids_disjoint(spark):
    """Planted near-identical vectors must get ids above the real
    vec_id space (the old +100000 collides at sf100's 5M vectors)."""
    import os
    import tempfile

    from udacity_data_engineer_capstone_spark.operators.dedup import (
        embedding_corpus,
    )

    with tempfile.TemporaryDirectory(prefix="emb_off_") as d:
        emb = spark.createDataFrame(
            [(150_000 + i, [float(i % 7)] * 64) for i in range(80)],
            "vec_id long, embedding array<float>",
        )
        emb.write.parquet(os.path.join(d, "embeddings.parquet"))
        ids = [
            r["vec_id"]
            for r in embedding_corpus(spark, d).select("vec_id").collect()
        ]
        assert len(ids) == len(set(ids)), "planted vec ids collide"
