"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline
(``Ajmal-Ismail/udacity_data_engineer_capstone``, see ``SURVEY.md``), plus
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, event-time windows) that a 100 TB
deployment needs.

Design principles (see SURVEY.md §3.4/§4):

- Everything is a lazy DataFrame plan; Catalyst/Tungsten do the optimizing
  and executing. We add no custom Catalyst rules — every operator composes
  from public DataFrame/SQL primitives.
- Native ``pyspark.sql.functions`` over Python UDFs wherever possible; when
  Python is unavoidable, Arrow-batched pandas UDFs over ``mapInPandas``.
- Each public operator is registered in :mod:`.registry` with an optional
  ANSI-SQL oracle so DuckDB can verify it row-for-row.
"""

from udacity_data_engineer_capstone_spark.registry import QUERIES, query  # noqa: F401
from udacity_data_engineer_capstone_spark.registry import (  # noqa: F401
    oracle_sql as get_oracles,
)
from udacity_data_engineer_capstone_spark.registry import (  # noqa: F401
    queries as get_queries,
)


def load_all() -> None:
    """Import every operator module so its registry entries exist."""
    # Imports are side-effecting (decorators register queries).
    from udacity_data_engineer_capstone_spark.queries import (  # noqa: F401
        analytics,
        analytics_ext,
        flagship,
        formats,
        pipeline,
        recsys,
        recursive,
        reference_ops,
        sketches,
        sql_surface,
        stats,
        tpch,
        tpch_ext,
        warehouse,
    )
    from udacity_data_engineer_capstone_spark.operators import (  # noqa: F401
        clustering,
        corpus,
        curation,
        embeddings,
        dedup,
        events,
        graph,
        intervals,
        multimodal,
        python_udfs,
        retrieval,
        similarity,
        skew,
        spatial,
        text,
        timeseries,
    )
    from udacity_data_engineer_capstone_spark.streaming import (  # noqa: F401
        events as streaming_events,
    )
