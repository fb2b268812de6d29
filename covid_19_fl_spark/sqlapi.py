"""SQL entry surface — the corpus as temp views for ad-hoc spark.sql.

The reference's only "query language" was MongoDB find/aggregate specs
embedded in Python (SURVEY §2.1 S6-S8). The engine exposes the full
declarative surface instead: register the tables once, then any ANSI
query plans through the same Catalyst pipeline as the DataFrame suite
(identical optimization — views are lazy plan aliases, not copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import tables


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create (or replace) one temp view per corpus table; returns the
    registered names. Views carry the same pushdown-friendly scans as
    tables.load — filter/projection pruning reaches the parquet reader
    through a view exactly as through the DataFrame API."""
    for name in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(tables.TABLE_NAMES)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the corpus views and run one ANSI SQL query."""
    register_views(spark, sf_dir)
    return spark.sql(query)


def _sq(pattern: str) -> str:
    """Render a Python regex/string as a Spark SQL single-quoted
    literal (backslashes and quotes escaped for the SQL lexer)."""
    return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"


def register_functions(spark: SparkSession) -> list[str]:
    """Expose the engine's scalar surface to pure-SQL users as SQL UDFs
    (Spark 4 ``CREATE TEMPORARY FUNCTION … RETURN <expr>``) — declared
    expressions, so they inline into Catalyst plans with full codegen
    exactly like the Column implementations (NOT Python UDFs; zero
    serialization boundary). Bodies are generated from the same module
    constants (regex patterns, stopword lists, hash modulus) the Column
    functions use, and tests/test_sqlapi.py asserts SQL == Column on
    sample data so the two surfaces cannot drift apart."""
    from .llmops import dedup, text

    stopwords = ",".join(_sq(w) for w in text.STOPWORDS["en"])
    redacted = "s"
    for pat, token in text.PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, {_sq(pat)}, {_sq(token)})"
    fns = {
        "engine_token_count": (
            "(s STRING) RETURNS INT",
            r"size(split(trim(s), '\\s+'))",
        ),
        "engine_bpe_count": (
            "(s STRING) RETURNS INT",
            f"size(regexp_extract_all(s, {_sq(text.BPE_ISH_PATTERN)}, 0))",
        ),
        "engine_punct_count": (
            "(s STRING) RETURNS INT",
            f"size(regexp_extract_all(s, {_sq(text.PUNCT_PATTERN)}, 0))",
        ),
        "engine_fingerprint": (
            "(s STRING) RETURNS STRING",
            r"md5(lower(trim(regexp_replace(s, '\\s+', ' '))))",
        ),
        "engine_portable_hash": (
            "(s STRING) RETURNS BIGINT",
            f"CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)"
            f" % {dedup.PORTABLE_PRIME}L",
        ),
        "engine_redact_pii": ("(s STRING) RETURNS STRING", redacted),
        "engine_quality_score": (
            "(s STRING) RETURNS DOUBLE",
            "round(0.4D * (CAST(size(filter(split(trim(s), "
            f"'\\\\s+'), w -> array_contains(array({stopwords}), w))) AS DOUBLE)"
            " / size(split(trim(s), '\\\\s+')))"
            " + 0.4D * least(CAST(size(split(trim(s), '\\\\s+')) AS DOUBLE)"
            " / 100.0D, 1.0D)"
            f" + 0.2D * (1.0D - CAST(size(regexp_extract_all(s, "
            f"{_sq(text.PUNCT_PATTERN)}, 0)) AS DOUBLE)"
            " / size(split(trim(s), '\\\\s+'))), 6)",
        ),
    }
    for name, (sig, body) in fns.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    return list(fns)
