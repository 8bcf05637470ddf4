"""Date decode functions.

The reference decodes SAS day-counts (days since 1960-01-01, stored as
``double``) to ISO strings with a row-at-a-time Python UDF
(``/root/reference/etl.py:136-141``) — a ``BatchEvalPython`` optimization
barrier plus a per-row JVM↔Python round-trip on the ~3M-row fact path.

Here the decode is a native column expression: stays inside whole-stage
codegen, keeps predicate pushdown alive through the fact scan, and costs
nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_day_to_date(day_count: Column) -> Column:
    """SAS day-count (double) → DateType. NULL-safe; non-integral counts
    truncate toward zero (Spark int-cast semantics)."""
    return F.date_add(F.to_date(F.lit(SAS_EPOCH)), day_count.cast("int"))


def sas_day_to_iso_string(day_count: Column, bug_compat: bool = True) -> Column:
    """SAS day-count → ISO-8601 date *string*, matching the reference UDF's
    output type.

    ``bug_compat=True`` replicates the reference's ``if x else None`` quirk
    (``etl.py:140``): day 0 (1960-01-01 itself) and NULL both map to NULL.
    """
    decoded = sas_day_to_date(day_count).cast("string")
    if not bug_compat:
        return decoded
    return F.when(
        day_count.isNull() | (day_count.cast("int") == 0), F.lit(None).cast("string")
    ).otherwise(decoded)
