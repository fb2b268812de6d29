"""End-to-end pipeline parity (SURVEY §3) — the reference's entry
points as composed engine stages.

Each reference script's extract→transform→load flow becomes one
function over DataFrames + a ParquetTable store, so "a user of the
reference could switch": same derived collections, same semantics,
declaratively.

| Reference entry point | Here |
|---|---|
| ``python cv-stats.py`` (§3.2)        | ``run_stats_pipeline``        |
| ``python cv-county-stats.py`` (§3.3) | ``run_county_stats_pipeline`` |
| ``python cv-csv.py`` (§3.1/csv)      | ``run_csv_ingest``            |
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ingest
from .operators import analytics
from .sinks.batch import ParquetTable
from .sources import files as file_sources


def run_csv_ingest(
    spark: SparkSession,
    cases_csv: str,
    counties_json: str,
    store_dir: str,
) -> int:
    """cv-csv.py's flow: positional CSV → canonical schema → county
    location attach (J1 broadcast) → full refresh of ``florida``
    (K2) with the K5 count-delta metric returned."""
    raw = file_sources.read_cases_csv(spark, cases_csv)
    cases = ingest.normalize_cases(raw)
    counties = file_sources.read_counties_json(spark, counties_json)
    located = ingest.attach_location(cases, counties)
    return ParquetTable(spark, os.path.join(store_dir, "florida")).overwrite(located)


def run_stats_pipeline(spark: SparkSession, store_dir: str, sim_days: int = 14) -> None:
    """cv-stats.py's flow (§3.2): cases → daily counts → cumulative
    curve (tagged 'actual') → trailing-5 mean growth factor → 14-day
    geometric projection (tagged 'predicted') → ``florida_growth``;
    full lag-ratio series → ``florida_growth_rates``.

    The reference deletes-by-series then re-inserts (K3);
    ``replace_where`` gives the same result atomically.
    """
    cases = ParquetTable(spark, os.path.join(store_dir, "florida")).read()
    daily = cases.groupBy(F.col("date_added").cast("date").alias("date")).agg(
        F.count("case_number").alias("n")
    )
    cum = analytics.cumulative_sum(daily, "date", "n", out_col="count").select(
        "date", F.col("count").cast("double").alias("count")
    )

    growth = ParquetTable(spark, os.path.join(store_dir, "florida_growth"))
    actual = cum.withColumn("series", F.lit("actual"))
    growth.replace_where("series = 'actual'", actual)

    rates = analytics.growth_rates(cum, "date", "count", out_col="rate").select(
        "date", "rate"
    )
    # growth factor = mean of the last 5 rates (cv-stats.py:105-109)
    gf_row = (
        analytics.tail_n(rates.filter(F.col("rate").isNotNull()), "date", 5)
        .agg(F.avg("rate").alias("gf"))
        .first()
    )
    last = analytics.last_row(cum, "date").first()
    seed = spark.createDataFrame(
        [(last["date"], float(last["count"]), float(gf_row["gf"]))],
        "last_date date, last_count double, growth_factor double",
    )
    predicted = analytics.simulate_growth(seed, sim_days).withColumn(
        "series", F.lit("predicted")
    )
    growth.replace_where("series = 'predicted'", predicted)

    ParquetTable(spark, os.path.join(store_dir, "florida_growth_rates")).overwrite(rates)


def run_county_stats_pipeline(
    spark: SparkSession, counties_json: str, store_dir: str, k: int = 5
) -> None:
    """cv-county-stats.py's flow (§3.3): top-K counties by case count →
    per-county daily cumulative counts → per-capita normalization →
    full refresh of ``top_five_counties`` (K2)."""
    cases = ParquetTable(spark, os.path.join(store_dir, "florida")).read()
    top = analytics.top_k_by_count(cases, "county", k, "case_number").select("county")

    daily = (
        cases.join(top, "county", "left_semi")
        .groupBy("county", F.col("date_added").cast("date").alias("date"))
        .agg(F.count("case_number").alias("n"))
    )
    cum = analytics.cumulative_sum(
        daily, "date", "n", partition_cols=["county"], out_col="count"
    )
    counties = file_sources.read_counties_json(spark, counties_json)
    normalized = analytics.per_capita_counts(
        cum, counties.select("county", "population"), "county"
    ).select("county", "date", "count", "normalized_count")
    ParquetTable(spark, os.path.join(store_dir, "top_five_counties")).overwrite(normalized)
