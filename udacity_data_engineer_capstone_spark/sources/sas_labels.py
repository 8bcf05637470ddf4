"""SAS ``proc format`` dictionary source.

The reference parses its data dictionary by slicing the whole file from a
label name to the next ``;`` and splitting each line on ``=``
(``/root/reference/etl.py:20-38``), then detours through pandas to build a
DataFrame. This module is a fresh, regex-based implementation with the
same observable semantics (keep exactly-two-part ``a = b`` lines; strip
whitespace, then surrounding quotes) plus a direct
``spark.createDataFrame`` lift with an explicit schema — no pandas hop.

Scale rationale: format dictionaries are metadata (≤ a few thousand
entries), so a driver-side parse is the right call even on a 100 TB
cluster — the result is broadcast as a dim table, never sharded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_QUOTES = "'\""

LABEL_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)


def parse_label_block(text: str, label: str) -> list[tuple[str, str]]:
    """Extract ``(code, value)`` pairs for one ``value <label>`` block.

    The block runs from the first occurrence of ``label`` to the next
    ``;`` (reference semantics — which is why a block with no ``;`` of its
    own swallows following comment lines until one appears; non-assignment
    lines are dropped by the exactly-one-``=`` rule).
    """
    start = text.find(label)
    if start < 0:
        return []
    block = text[start:]
    end = block.find(";")
    if end >= 0:
        block = block[:end]
    pairs: list[tuple[str, str]] = []
    for line in block.splitlines():
        parts = line.split("=")
        if len(parts) != 2:
            continue
        code = parts[0].strip().strip(_QUOTES)
        value = parts[1].strip().strip(_QUOTES)
        if not code or code.lower() == "value":
            continue
        pairs.append((code, value))
    return pairs


def read_label_block(
    spark: SparkSession, path: str, label: str
) -> DataFrame:
    """Parse one label block of a SAS format file into a (code, value)
    DataFrame with an explicit all-string schema."""
    with open(path, encoding="utf-8", errors="replace") as fh:
        text = fh.read()
    return spark.createDataFrame(parse_label_block(text, label), LABEL_SCHEMA)


def render_label_block(label: str, pairs: list[tuple[str, str]]) -> str:
    """Inverse of :func:`parse_label_block` — used by tests/fixtures to
    synthesize dictionary files without copying the reference's."""
    lines = [f"value {label}"]
    lines += [f"   {code} = '{value}'" for code, value in pairs]
    lines.append(";")
    return "\n".join(lines) + "\n"
