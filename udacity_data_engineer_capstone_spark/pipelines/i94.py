"""The reference pipeline, re-expressed Spark-first (SURVEY §7 M2).

Reproduces the full ``main()`` dataflow of ``/root/reference/etl.py:224-266``
— dictionary parse → clean → star-schema build → data-quality checks →
partitioned parquet star schema — over FIXTURES-shaped synthetic inputs,
with the reference's defects fixed rather than replicated (SURVEY §4):

- fact/dim results are ``.cache()``d so DQ count + write don't compute the
  plan twice (the reference recomputes everything);
- DQ failures actually raise (the reference builds exceptions and drops
  them, ``etl.py:252-257``);
- the SAS date decode is a native column expression, not a Python UDF, so
  predicate pushdown survives and no Python workers run on the fact path;
- partitioned writes repartition on the partition keys first, so each
  output directory is one task's file instead of ``shuffle.partitions``
  small files.

Semantics preserved from the reference (SURVEY §1.2): lookup codes stay
*strings* while fact keys are *doubles* — the five star joins rely on
implicit string↔double equi-join coercion; `depdate` stays a raw double;
`arrival_date` is an ISO *string* with the day-0→NULL quirk.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacity_data_engineer_capstone_spark.functions.cleaning import (
    normalize_junk_labels,
    split_city_state,
)
from udacity_data_engineer_capstone_spark.functions.dates import (
    sas_day_to_iso_string,
)
from udacity_data_engineer_capstone_spark.functions.quality import dq_count
from udacity_data_engineer_capstone_spark.sources.sas_labels import (
    read_label_block,
)

# 12-column explicit demographics schema (cf. etl.py:87-100 — male/female
# population deliberately *strings* so the aggregate exercises implicit
# string→double SUM).
DEMOGRAPHICS_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("median_age", T.DoubleType(), True),
        T.StructField("male_population", T.StringType(), True),
        T.StructField("female_population", T.StringType(), True),
        T.StructField("total_population", T.IntegerType(), True),
        T.StructField("number_of_veterans", T.IntegerType(), True),
        T.StructField("number_of_foreign_born", T.IntegerType(), True),
        T.StructField("average_household_size", T.DoubleType(), True),
        T.StructField("state_code", T.StringType(), True),
        T.StructField("race", T.StringType(), True),
        T.StructField("count", T.IntegerType(), True),
    ]
)

FACT_COLUMNS = [
    "year", "month", "residence_country", "port", "arrival_date", "mode",
    "state_code", "departure_date", "age", "visa_type_code", "occupation",
    "gender", "birth_year", "allowed_date", "airline", "admission_number",
    "flight_number", "visa_type",
]


@dataclass
class I94Paths:
    labels: str
    demographics: str
    immigration: str
    output: str


# ---------------------------------------------------------------------------
# load
# ---------------------------------------------------------------------------


def load_dimensions(spark: SparkSession, labels_path: str) -> dict[str, DataFrame]:
    """Parse the five lookup dims out of the SAS format dictionary
    (etl.py:41-78). Label block names are the public I94 format names."""
    return {
        "countries": read_label_block(spark, labels_path, "i94cntyl"),
        "ports": read_label_block(spark, labels_path, "i94prtl"),
        "modes": read_label_block(spark, labels_path, "i94model"),
        "states": read_label_block(spark, labels_path, "i94addrl"),
        "visas": read_label_block(spark, labels_path, "I94VISA"),
    }


def load_demographics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, sep=";", schema=DEMOGRAPHICS_SCHEMA)


def load_immigration(spark: SparkSession, path: str) -> DataFrame:
    """Fact input. The reference reads SAS7BDAT via a connector
    (etl.py:103-107); the engine's fact source is columnar parquet —
    same columns, connector-free."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# clean (etl.py:110-148)
# ---------------------------------------------------------------------------


def clean_states(states: DataFrame) -> DataFrame:
    """Drop the '99' = 'All Other Codes' pseudo-state (etl.py:110-115)."""
    return states.filter("code <> '99'")


def clean_countries(countries: DataFrame) -> DataFrame:
    """Normalize junk country labels to 'NA' (etl.py:118-123)."""
    return countries.withColumn("value", normalize_junk_labels(F.col("value")))


def clean_ports(ports: DataFrame) -> DataFrame:
    """Split 'CITY, ST' port labels into trimmed city + state_code; labels
    without a comma yield NULL state (etl.py:126-133)."""
    city, state = split_city_state(F.col("value"))
    return (
        ports.withColumn("city", city)
        .withColumn("state_code", state)
        .drop("value")
    )


def clean_demographics(demographics: DataFrame) -> DataFrame:
    """Drop rows without a state code (etl.py:144-148)."""
    return demographics.filter(F.col("state_code").isNotNull())


def clean_immigration(immigration: DataFrame) -> DataFrame:
    """Decode the SAS arrival day-count to an ISO string natively —
    replaces the reference's Python UDF (etl.py:136-141), preserving its
    day-0→NULL quirk. ``depdate`` intentionally stays a raw double."""
    return immigration.withColumn(
        "arrdate", sas_day_to_iso_string(F.col("arrdate"))
    )


# ---------------------------------------------------------------------------
# star-schema build (etl.py:151-221)
# ---------------------------------------------------------------------------


def build_immigration_fact(
    spark: SparkSession,
    immigration: DataFrame,
    states: DataFrame,
    visas: DataFrame,
    modes: DataFrame,
    ports: DataFrame,
    countries: DataFrame,
) -> DataFrame:
    """Fact table: 5-way star join + 18-column renaming projection
    (etl.py:151-191). The five dims are tiny → broadcast hash joins, no
    shuffle of the fact at any scale. The null-rejecting WHERE makes the
    LEFT joins effectively INNER (EliminateOuterJoin)."""
    fact = (
        immigration.alias("tid")
        .join(F.broadcast(states.alias("ls")),
              F.col("ls.code") == F.col("tid.i94addr"), "left")
        .join(F.broadcast(visas.alias("lvt")),
              F.col("lvt.code") == F.col("tid.i94visa"), "left")
        .join(F.broadcast(modes.alias("lm")),
              F.col("lm.code") == F.col("tid.i94mode"), "left")
        .join(F.broadcast(ports.alias("lp")),
              F.col("lp.code") == F.col("tid.i94port"), "left")
        .join(F.broadcast(countries.alias("lc")),
              F.col("lc.code") == F.col("tid.i94res"), "left")
        .filter(
            F.col("lp.code").isNotNull()
            & F.col("lc.code").isNotNull()
            & F.col("lm.code").isNotNull()
            & F.col("ls.code").isNotNull()
            & F.col("lvt.code").isNotNull()
        )
    )
    return fact.select(
        F.col("tid.i94yr").alias("year"),
        F.col("tid.i94mon").alias("month"),
        F.col("lc.code").alias("residence_country"),
        F.col("lp.code").alias("port"),
        F.col("tid.arrdate").alias("arrival_date"),
        F.col("lm.code").alias("mode"),
        F.col("ls.code").alias("state_code"),
        F.col("tid.depdate").alias("departure_date"),
        F.col("tid.i94bir").alias("age"),
        F.col("lvt.code").alias("visa_type_code"),
        F.col("tid.occup").alias("occupation"),
        F.col("tid.gender").alias("gender"),
        F.col("tid.biryear").alias("birth_year"),
        F.col("tid.dtaddto").alias("allowed_date"),
        F.col("tid.airline").alias("airline"),
        F.col("tid.admnum").alias("admission_number"),
        F.col("tid.fltno").alias("flight_number"),
        F.col("tid.visatype").alias("visa_type"),
    )


def build_port_demographics(
    spark: SparkSession, demographics: DataFrame, ports: DataFrame
) -> DataFrame:
    """Aggregate demographics per (city, state), then attach port codes via
    a case-insensitive city join (etl.py:194-221, incl. the view-shadowing
    rebind: the aggregate replaces the raw view before the join query).

    Type signature preserved: male/female sums are double (SUM over string
    columns), int sums are long (SURVEY §2.6)."""
    demographics.createOrReplaceTempView("tbl_demographics")
    aggregated = spark.sql(
        """
        SELECT city, state_code,
               SUM(male_population) AS total_male_population,
               SUM(female_population) AS total_female_population,
               SUM(total_population) AS total_population,
               SUM(number_of_veterans) AS number_of_veterans,
               SUM(number_of_foreign_born) AS number_of_foreign_born
        FROM tbl_demographics
        GROUP BY city, state_code
        """
    )
    # deliberate shadowing rebind, as in the reference (etl.py:214)
    aggregated.createOrReplaceTempView("tbl_demographics")
    ports.createOrReplaceTempView("lu_ports")
    return spark.sql(
        """
        SELECT lp.code AS port_code, td.*
        FROM lu_ports lp
        JOIN tbl_demographics td
          ON lower(td.city) = lower(lp.city) AND td.state_code = lp.state_code
        """
    )


# ---------------------------------------------------------------------------
# run (etl.py:224-266)
# ---------------------------------------------------------------------------


def run(spark: SparkSession, paths: I94Paths, write: bool = True) -> dict[str, DataFrame]:
    """Full pipeline. Returns the output tables keyed by name."""
    dims = load_dimensions(spark, paths.labels)
    demographics = load_demographics(spark, paths.demographics)
    immigration = load_immigration(spark, paths.immigration)

    states = clean_states(dims["states"])
    countries = clean_countries(dims["countries"])
    ports = clean_ports(dims["ports"])
    demographics = clean_demographics(demographics)
    immigration = clean_immigration(immigration)

    fact = build_immigration_fact(
        spark, immigration, states, dims["visas"], dims["modes"], ports, countries
    ).cache()
    port_demographics = build_port_demographics(spark, demographics, ports).cache()

    # DQ phase — raises on failure (unlike the reference, etl.py:252-257)
    dq_count(fact, "immigrations", at_least=1)
    dq_count(port_demographics, "port_demographics", at_least=1)

    if write:
        out = paths.output
        (
            fact.repartition("year", "month", "state_code")
            .write.mode("overwrite")
            .partitionBy("year", "month", "state_code")
            .parquet(f"{out}/immigrations")
        )
        (
            port_demographics.repartition("state_code")
            .write.mode("overwrite")
            .partitionBy("state_code")
            .parquet(f"{out}/port_demographics")
        )
        for name, df in (
            ("mode", dims["modes"]),
            ("visa_type", dims["visas"]),
            ("state", states),
            ("country", countries),
            ("port", ports),
        ):
            df.write.mode("overwrite").parquet(f"{out}/{name}")

    return {
        "immigrations": fact,
        "port_demographics": port_demographics,
        "mode": dims["modes"],
        "visa_type": dims["visas"],
        "state": states,
        "country": countries,
        "port": ports,
    }


# ---------------------------------------------------------------------------
# CLI entry (parity with ``python etl.py`` — readme.md:83, etl.py:269-270)
# ---------------------------------------------------------------------------


def paths_from_config(config_path: str) -> I94Paths:
    """Read the reference's ``cp.cfg`` INI shape (etl.py:11-17): a
    ``[PATHS]`` section with SAS_LABELS_DESCRIPTION_FILE_PATH,
    IMMIGRATION_DATA_PATH, DEMOGRAPHIC_DATA_PATH, OUTPUT_PATH."""
    import configparser

    cfg = configparser.ConfigParser()
    if not cfg.read(config_path):
        raise FileNotFoundError(f"config file not found: {config_path}")
    return I94Paths(
        labels=cfg.get("PATHS", "SAS_LABELS_DESCRIPTION_FILE_PATH"),
        demographics=cfg.get("PATHS", "DEMOGRAPHIC_DATA_PATH"),
        immigration=cfg.get("PATHS", "IMMIGRATION_DATA_PATH"),
        output=cfg.get("PATHS", "OUTPUT_PATH").rstrip("/"),
    )


def main(argv: list[str] | None = None) -> int:
    """``python -m udacity_data_engineer_capstone_spark.pipelines.i94
    [cp.cfg]`` ≙ ``python etl.py`` (the reference reads ``cp.cfg`` from
    the working directory; the config path argument is the one
    ergonomic addition): INI in → load → clean → star-schema build →
    raising DQ → 7-table partitioned parquet star schema at
    OUTPUT_PATH. Exits non-zero on missing config or DQ failure."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m udacity_data_engineer_capstone_spark.pipelines.i94",
        description=(
            "Run the i94 ETL: parse the SAS label dictionary, clean the "
            "demographics CSV and immigration fact, build and write the "
            "partitioned star schema (CLI parity with the reference's "
            "`python etl.py`)."
        ),
    )
    parser.add_argument(
        "config",
        nargs="?",
        default="cp.cfg",
        help="INI config with a [PATHS] section (default: ./cp.cfg)",
    )
    args = parser.parse_args(argv)
    paths = paths_from_config(args.config)

    from udacity_data_engineer_capstone_spark.session import get_spark

    spark = get_spark("i94-etl")
    run(spark, paths, write=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
