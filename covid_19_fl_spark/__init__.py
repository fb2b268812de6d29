"""covid_19_fl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark implementation of the query and
data-processing capabilities of the reference repo
mariuspopovici/COVID-19-FL (see SURVEY.md), re-expressed as lazy,
distributed DataFrame/SQL plans designed for 100 TB scale:

- ``session``     — SparkSession factory (AQE, UTC, Arrow, tuned shuffle)
- ``tables``      — parquet table loaders for the driver test corpus
- ``functions``   — canonical column-expression library (SURVEY §2.3/§2.10)
- ``operators``   — analytics operators: aggs, windows, top-k, growth sim
- ``sources``     — REST page-partitioned reader, HTML table, CSV/JSON dims
- ``sinks``       — append / overwrite / merge / targeted-delete semantics
- ``streaming``   — Structured Streaming equivalents of the scheduled jobs
- ``llmops``      — dedup, similarity search, text analysis, multimodal
"""

__version__ = "0.1.0"
