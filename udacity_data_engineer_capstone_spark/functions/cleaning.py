"""String-cleaning column expressions (SURVEY §2.3).

Native equivalents of the reference's label clean-ups: junk-label
normalization (``/root/reference/etl.py:118-123``) and ``'CITY, ST'``
splitting with trim (``etl.py:126-133``). All pure column expressions —
codegen'd, pushdown-transparent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Anchored alternation, as in the reference's country normalization
# (etl.py:123). One whole-string match → regexp_replace replaces it all.
JUNK_LABEL_PATTERN = r"^No Country.*|INVALID.*|Collapsed.*"


def normalize_junk_labels(
    label: Column, pattern: str = JUNK_LABEL_PATTERN, replacement: str = "NA"
) -> Column:
    return F.regexp_replace(label, pattern, replacement)


def split_city_state(label: Column) -> tuple[Column, Column]:
    """Split ``'CITY, ST'`` → (city, state_code), trimming both halves.

    Labels without a comma yield state_code NULL, matching the reference's
    lax-mode ``split().getItem(1)`` (etl.py:131-132). Under Spark 4's
    default ANSI mode an out-of-range ``getItem`` *throws*, so we use
    ``F.get`` — the documented NULL-tolerant accessor.
    """
    parts = F.split(label, ",")
    return F.trim(F.get(parts, 0)), F.trim(F.get(parts, 1))
