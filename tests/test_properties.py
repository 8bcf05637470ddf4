"""Property-based tests: parser round-trip invariants (hypothesis) and
randomized batch truth-checks for the native date decode.
"""

from __future__ import annotations

import random
from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from udacity_data_engineer_capstone_spark.functions.dates import (
    sas_day_to_iso_string,
)
from udacity_data_engineer_capstone_spark.sources.sas_labels import (
    parse_label_block,
    render_label_block,
)

# codes/values that survive the format's own syntax: no '=', ';', quotes,
# newlines, or leading/trailing whitespace (the parser strips those)
# Zl/Zp (U+2028/U+2029) are excluded too: splitlines() treats them as
# line breaks and strip() strips them, which would break round-tripping
_token = st.text(
    alphabet=st.characters(
        blacklist_characters="=;'\"\n\r",
        blacklist_categories=("Cs", "Zs", "Cc", "Zl", "Zp"),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_token, _token), min_size=0, max_size=20))
def test_label_roundtrip_property(pairs):
    text = "preamble junk\n" + render_label_block("fmt_prop", pairs) + "trailer ;\n"
    parsed = parse_label_block(text, "fmt_prop")
    expected = [(c, v) for c, v in pairs if c.lower() != "value"]
    assert parsed == expected


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_token, _token), min_size=1, max_size=10), _token)
def test_parser_ignores_other_blocks(pairs, other_label):
    if other_label == "fmt_a":
        return
    text = (
        render_label_block("fmt_a", pairs)
        + "\n"
        + render_label_block(other_label, [("x", "y")])
    )
    assert parse_label_block(text, "fmt_a") == [
        (c, v) for c, v in pairs if c.lower() != "value"
    ]


def test_sas_date_decode_matches_python_truth(spark):
    """200 random day-counts (incl. negatives, 0, NULL, fractional):
    the native decode must equal datetime arithmetic with the reference
    UDF's quirk (0/NULL → None, fractions truncate toward zero)."""
    rng = random.Random(42)
    days = [rng.randint(-40000, 40000) + rng.choice([0.0, 0.25, 0.75]) for _ in range(200)]
    days += [0.0, None, -1.0, 1.0]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(days)], "id int, d double")
    got = {
        r.id: r.iso
        for r in df.select("id", sas_day_to_iso_string(F.col("d")).alias("iso")).collect()
    }
    for i, d in enumerate(days):
        if d is None or int(d) == 0:
            expected = None
        else:
            expected = (date(1960, 1, 1) + timedelta(days=int(d))).isoformat()
        assert got[i] == expected, (d, got[i], expected)


@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_zorder_interleave_is_bijective(a, b):
    """fn_zorder_curve's bit interleave must be invertible — the curve
    value uniquely identifies (a, b), the property file-stat pruning
    relies on."""
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    ra = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    rb = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    assert (ra, rb) == (a, b)


# ---------------------------------------------------------------------------
# SizingProfile derivation invariants (hypothesis)
# ---------------------------------------------------------------------------

from udacity_data_engineer_capstone_spark.session import SizingProfile  # noqa: E402

_MB_ = 1 << 20


@given(
    cores=st.integers(min_value=1, max_value=1_000_000),
    mem=st.one_of(st.none(), st.floats(min_value=0.01, max_value=10_000)),
    inp=st.one_of(st.none(), st.floats(min_value=0.0, max_value=1e9)),
    tgt_mb=st.integers(min_value=1, max_value=16_384),
)
@settings(max_examples=200, deadline=None)
def test_sizing_profile_invariants(cores, mem, inp, tgt_mb):
    p = SizingProfile(
        name="x",
        total_cores=cores,
        mem_gb_per_core=mem,
        expected_input_gb=inp,
        target_partition_bytes=tgt_mb * _MB_,
    )
    conf = p.derive()
    parts = int(conf["spark.sql.shuffle.partitions"])
    # every core gets work; data-first only ever RAISES the count
    assert parts >= cores
    if inp is not None:
        import math

        assert parts >= math.ceil(inp * (1 << 30) / (tgt_mb * _MB_))
    # split sizing mirrors the target; open-cost clamped to [64K, 4M]
    assert int(conf["spark.sql.files.maxPartitionBytes"]) == tgt_mb * _MB_
    oc = int(conf["spark.sql.files.openCostInBytes"])
    assert 64 * 1024 <= oc <= 4 * _MB_
    # broadcast threshold present iff memory known, clamped [10M, 512M]
    if mem is None:
        assert "spark.sql.autoBroadcastJoinThreshold" not in conf
    else:
        bt = int(conf["spark.sql.autoBroadcastJoinThreshold"])
        assert 10 * _MB_ <= bt <= 512 * _MB_


@given(
    cores=st.integers(min_value=1, max_value=100_000),
    inp1=st.floats(min_value=0.0, max_value=1e8),
    inp2=st.floats(min_value=0.0, max_value=1e8),
)
@settings(max_examples=100, deadline=None)
def test_sizing_profile_monotone_in_input(cores, inp1, inp2):
    lo, hi = sorted((inp1, inp2))
    p_lo = SizingProfile(name="x", total_cores=cores, expected_input_gb=lo)
    p_hi = SizingProfile(name="x", total_cores=cores, expected_input_gb=hi)
    assert int(p_lo.derive()["spark.sql.shuffle.partitions"]) <= int(
        p_hi.derive()["spark.sql.shuffle.partitions"]
    )


from udacity_data_engineer_capstone_spark.maintenance import (  # noqa: E402
    plan_output_files,
)


@given(
    nbytes=st.integers(min_value=0, max_value=1 << 50),
    target=st.integers(min_value=1, max_value=1 << 34),
)
@settings(max_examples=200, deadline=None)
def test_compaction_plan_invariants(nbytes, target):
    n = plan_output_files(nbytes, target)
    assert n >= 1
    # files land under target on average: n is the minimal count whose
    # mean size <= target
    assert n * target >= nbytes
    if n > 1:
        assert (n - 1) * target < nbytes


# ---------------------------------------------------------------------------
# two-phase global ordinal invariants (operators/ordinal.py)
# ---------------------------------------------------------------------------

from udacity_data_engineer_capstone_spark.operators.ordinal import (  # noqa: E402
    composite_bucket_key,
    global_cum,
    global_lag,
    global_row_number,
)

# small frames, heavy ties on the key, unique tiebreak — each example
# runs real Spark jobs, so example counts stay low; the deterministic
# sweep in tests/test_ordinal.py covers larger shapes
_rank_rows = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(0, 1_000_000)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[1],
)


@settings(max_examples=8, deadline=None)
@given(_rank_rows)
def test_global_row_number_property(spark, rows):
    df = spark.createDataFrame(rows, "k long, i long")
    got, n = global_row_number(
        df,
        [F.col("k").desc(), F.col("i")],
        composite_bucket_key(-F.col("k"), F.col("i")),
        out="rk",
    )
    assert n == len(rows)
    expected = {
        i_: pos + 1
        for pos, (_, i_) in enumerate(
            sorted(rows, key=lambda t: (-t[0], t[1]))
        )
    }
    assert {r["i"]: r["rk"] for r in got.collect()} == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_global_cum_property(spark, rows):
    df = spark.createDataFrame(rows, "v long, c long")
    got = global_cum(
        df, [F.col("v")], F.col("v"), F.col("c"), inclusive=True, out="cs"
    )
    run, expected = 0, {}
    for v, c in sorted(rows):
        run += c
        expected[v] = run
    assert {r["v"]: r["cs"] for r in got.collect()} == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(0, 1_000_000), min_size=1, max_size=40, unique=True
    )
)
def test_global_lag_property(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = global_lag(df, F.col("k"), F.col("k"), out="pk")
    s = sorted(keys)
    expected = {k: (s[j - 1] if j else None) for j, k in enumerate(s)}
    assert {r["k"]: r["pk"] for r in got.collect()} == expected


@settings(max_examples=8, deadline=None)
@given(
    _rank_rows,
    st.integers(2, 6),
)
def test_global_rank_segments_property(spark, rows, k):
    from udacity_data_engineer_capstone_spark.operators.ordinal import (
        global_rank_segments,
        ntile_cuts,
    )

    df = spark.createDataFrame(rows, "k long, i long")
    seg, n = global_rank_segments(
        df,
        F.col("k"),
        F.col("i"),
        lambda n: ntile_cuts(n, k),
        descending=True,
        out="seg",
    )
    assert n == len(rows)
    cuts = ntile_cuts(n, k)
    ranks = {
        i_: pos + 1
        for pos, (_, i_) in enumerate(
            sorted(rows, key=lambda t: (-t[0], t[1]))
        )
    }
    expected = {
        i_: sum(1 for c in cuts if rk > c) for i_, rk in ranks.items()
    }
    assert {r["i"]: r["seg"] for r in seg.collect()} == expected


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(-50, 50)),
        min_size=4,
        max_size=30,
    )
)
def test_global_cum_duplicate_key_always_raises(spark, rows):
    # force at least one duplicate order key; the adjacency guard
    # rides the output expression, so the raise surfaces at the first
    # action (see operators.ordinal._dup_guard)
    rows = rows + [rows[0]]
    df = spark.createDataFrame(rows, "v long, c long")
    import pytest as _pytest

    got = global_cum(df, [F.col("v")], F.col("v"), F.col("c"), out="cs")
    with _pytest.raises(Exception, match="duplicate order key"):
        got.collect()
