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

from pyspark.sql import DataFrame, SparkSession

from udacity_data_engineer_capstone_spark.pipelines import i94
from udacity_data_engineer_capstone_spark.registry import query
from udacity_data_engineer_capstone_spark.sources import i94_fixtures

# Registration-time generation: oracle SQL embeds absolute fixture paths,
# so the files must exist whenever the driver runs either side. Seeded +
# idempotent, ~100 ms.
_P = i94_fixtures.generate_stable()


def _run_pipeline(spark: SparkSession) -> dict[str, DataFrame]:
    paths = i94.I94Paths(
        labels=_P["labels"],
        demographics=_P["demographics"],
        immigration=_P["immigration"],
        output=_P["output"],
    )
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
         SUM(total_population) AS total_population,
         SUM(number_of_veterans) AS number_of_veterans,
         SUM(number_of_foreign_born) AS number_of_foreign_born
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
