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
