"""Mongo Extended JSON export source (SURVEY §5.2) — the reference's
dataset snapshots (datasets/json/*.json) are NDJSON dumps of the
``florida`` collection with Extended JSON type wrappers
(``{"$numberInt": "404"}``, ``{"$date": {"$numberLong": "…"}}``,
``{"$oid": "…"}``; datasets/json/032820202114.json:1).

The engine reads them distributed: a text scan, a fixed chain of
regexp rewrites that strip the wrappers (pure Column expressions —
the wrapper grammar is mechanical, no Python parsing), then one
``from_json`` against the declared schema. Used by the golden-replay
tests to field-compare engine output against the reference's own
persisted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas

# Unwrap order matters: $date nests a $numberLong, so it rewrites first.
# The $numberDouble class includes '-' inside the exponent (Java
# Double.toString writes e.g. "1.0E-5").
_REWRITES = [
    (r'\{"\$date":\{"\$numberLong":"(-?\d+)"\}\}', "$1"),
    (r'\{"\$numberInt":"(-?\d+)"\}', "$1"),
    (r'\{"\$numberLong":"(-?\d+)"\}', "$1"),
    # Includes non-finite doubles: canonical Extended JSON writes
    # {"$numberDouble":"NaN"} etc.; unwrapping to the bare token is
    # parseable because Spark's JSON reader defaults
    # allowNonNumericNumbers=true (Jackson NaN/Infinity/-Infinity).
    (r'\{"\$numberDouble":"(-?[0-9.eE+\-]+|NaN|-?Infinity)"\}', "$1"),
    (r'\{"\$oid":"([0-9a-f]+)"\}', '"$1"'),
]

# Post-unwrap parse schema: date_added arrives as epoch millis.
_CASES_EXPORT = T.StructType(
    [
        T.StructField("_id", T.StringType(), True),
        T.StructField("case_number", T.LongType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("sex", T.StringType(), True),
        T.StructField("travel", T.StringType(), True),
        T.StructField("travel_detail", T.ArrayType(T.StringType()), True),
        T.StructField("contact_with_confirmed_case", T.StringType(), True),
        T.StructField("date_added", T.LongType(), True),
        T.StructField("deceased", T.StringType(), True),
        T.StructField("location", schemas.LOCATION, True),
        T.StructField("hospitalized", T.StringType(), True),
        T.StructField("ed_visit", T.StringType(), True),
    ]
)


def unwrap_extended_json(col: F.Column) -> F.Column:
    """Strip Mongo Extended JSON type wrappers from a raw JSON line."""
    out = col
    for pattern, replacement in _REWRITES:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def read_cases_export(spark: SparkSession, path: str) -> DataFrame:
    """Golden ``florida``-collection export → canonical cases frame
    (schemas.CASES plus the export's ``_id``)."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(unwrap_extended_json(F.col("value")), _CASES_EXPORT).alias("r")
    ).select("r.*")
    return parsed.withColumn(
        "date_added", F.timestamp_millis(F.col("date_added"))
    )


def parse_cases_export(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a DataFrame of raw Extended-JSON lines into the canonical
    cases frame — the distributed core of :func:`read_cases_export`,
    split out so the WRITE path can round-trip through it without
    touching disk."""
    parsed = lines.select(
        F.from_json(
            unwrap_extended_json(F.col(value_col)), _CASES_EXPORT
        ).alias("r")
    ).select("r.*")
    return parsed.withColumn(
        "date_added", F.timestamp_millis(F.col("date_added"))
    )


def _wrap_int(c: F.Column) -> F.Column:
    return F.when(
        c.isNotNull(), F.struct(c.cast("string").alias("$numberInt"))
    ).otherwise(F.lit(None))


def to_extended_json(df: DataFrame) -> DataFrame:
    """WRITE path: canonical cases frame → Mongo Extended-JSON NDJSON
    lines, the exact grammar of the reference's persisted exports
    (``{"$oid": …}``, ``{"$numberInt": "…"}``,
    ``{"$date": {"$numberLong": "…"}}``, ``{"$numberDouble": "…"}``;
    datasets/json/032820202114.json:1). Everything is Column
    expressions feeding one ``to_json`` — distributed, no Python row
    loop — and ``parse_cases_export(to_extended_json(df))`` is the
    identity on the canonical frame (pinned by test), which is what
    lets the K2 full-refresh and K4 keyed-merge semantics be asserted
    against the reference's own golden state without a Mongo server
    (cv-api.py:184-207 delete_many + insert_many ≡ state replace).

    Returns a single-column (``value``) DataFrame of NDJSON lines.
    """
    loc = F.when(
        F.col("location").isNotNull(),
        F.struct(
            F.col("location.type").alias("type"),
            F.transform(
                F.col("location.coordinates"),
                lambda v: F.struct(v.cast("string").alias("$numberDouble")),
            ).alias("coordinates"),
        ),
    ).otherwise(F.lit(None))
    doc = F.struct(
        F.when(
            F.col("_id").isNotNull(), F.struct(F.col("_id").alias("$oid"))
        )
        .otherwise(F.lit(None))
        .alias("_id"),
        _wrap_int(F.col("case_number")).alias("case_number"),
        F.col("county").alias("county"),
        _wrap_int(F.col("age")).alias("age"),
        F.col("sex").alias("sex"),
        F.col("travel").alias("travel"),
        F.col("travel_detail").alias("travel_detail"),
        F.col("contact_with_confirmed_case").alias(
            "contact_with_confirmed_case"
        ),
        F.when(
            F.col("date_added").isNotNull(),
            F.struct(
                F.struct(
                    F.unix_millis(F.col("date_added"))
                    .cast("string")
                    .alias("$numberLong")
                ).alias("$date")
            ),
        )
        .otherwise(F.lit(None))
        .alias("date_added"),
        F.col("deceased").alias("deceased"),
        loc.alias("location"),
        F.col("hospitalized").alias("hospitalized"),
        F.col("ed_visit").alias("ed_visit"),
    )
    return df.select(
        F.to_json(doc, {"ignoreNullFields": "false"}).alias("value")
    )


# ---------------------------------------------------------------------------
# Schema-generic Extended-JSON round-trip — the reference's DERIVED
# collections (cv-stats.py:89-132 florida_growth / florida_growth_rates,
# cv-county-stats.py:88-94 top_five_counties, cv-api.py:169 other_stats)
# are flat documents of int counts, double rates, and datetime keys, so
# one type-driven wrapper covers all of them. Same grammar as the cases
# path; same identity contract parse(write(df)) == df, pinned by test.
# ---------------------------------------------------------------------------

# Reference collection schemas (field order = the reference's dict
# insertion order, which pymongo preserves in the stored document):
FLORIDA_GROWTH = T.StructType(
    [
        T.StructField("date", T.TimestampType(), True),
        T.StructField("count", T.LongType(), True),
        T.StructField("series", T.StringType(), True),
    ]
)
FLORIDA_GROWTH_RATES = T.StructType(
    [
        T.StructField("date", T.TimestampType(), True),
        T.StructField("rate", T.DoubleType(), True),
    ]
)
TOP_FIVE_COUNTIES = T.StructType(
    [
        T.StructField("county", T.StringType(), True),
        T.StructField("date", T.TimestampType(), True),
        T.StructField("count", T.LongType(), True),
        T.StructField("normalized_count", T.DoubleType(), True),
    ]
)
OTHER_STATS = T.StructType(
    [
        T.StructField("date", T.TimestampType(), True),
        T.StructField("tests", T.LongType(), True),
        T.StructField("new_tests", T.LongType(), True),
        T.StructField("deaths", T.LongType(), True),
        T.StructField("new_deaths", T.LongType(), True),
        T.StructField("deaths_growth", T.DoubleType(), True),
        T.StructField("hospitalized", T.LongType(), True),
        T.StructField("new_hospitalized", T.LongType(), True),
        T.StructField("hospitalized_growth", T.DoubleType(), True),
    ]
)

COLLECTION_SCHEMAS = {
    "florida_growth": FLORIDA_GROWTH,
    "florida_growth_rates": FLORIDA_GROWTH_RATES,
    "top_five_counties": TOP_FIVE_COUNTIES,
    "other_stats": OTHER_STATS,
}


def _wrap_value(c: F.Column, dtype: T.DataType) -> F.Column:
    """Extended-JSON wrapper for one scalar by catalyst type."""
    if isinstance(dtype, T.TimestampType):
        return F.when(
            c.isNotNull(),
            F.struct(
                F.struct(
                    F.unix_millis(c).cast("string").alias("$numberLong")
                ).alias("$date")
            ),
        ).otherwise(F.lit(None))
    if isinstance(dtype, T.IntegerType):
        # pymongo stores int-range Python ints as $numberInt — the
        # grammar the reference's own florida export uses for counts
        return F.when(
            c.isNotNull(), F.struct(c.cast("string").alias("$numberInt"))
        ).otherwise(F.lit(None))
    if isinstance(dtype, T.LongType):
        # pymongo splits by VALUE, not column type: ints inside int32
        # range store as BSON int32 ($numberInt), larger as int64
        # ($numberLong). A single struct can't switch field names per
        # row, so the wrapper builds the fragment as a string and
        # splices it through a VARIANT (to_json emits variant JSON
        # verbatim). Explicit range compare, not abs() — ANSI abs
        # throws on Long.MIN_VALUE.
        in32 = (c >= F.lit(-(2**31))) & (c <= F.lit(2**31 - 1))
        frag = F.when(
            in32,
            F.concat(
                F.lit('{"$numberInt":"'), c.cast("string"), F.lit('"}')
            ),
        ).otherwise(
            F.concat(
                F.lit('{"$numberLong":"'), c.cast("string"), F.lit('"}')
            )
        )
        return F.when(c.isNotNull(), F.parse_json(frag))
    if isinstance(dtype, T.DoubleType):
        # CAST(double AS STRING) is Java Double.toString — shortest
        # round-trip form, re-parses to the identical double
        return F.when(
            c.isNotNull(), F.struct(c.cast("string").alias("$numberDouble"))
        ).otherwise(F.lit(None))
    return c


def to_collection_json(df: DataFrame, schema: T.StructType) -> DataFrame:
    """WRITE path for a flat derived collection: wrap every field per
    its schema type and emit one NDJSON ``value`` column — pure Column
    expressions into one ``to_json``, distributed, no Python rows."""
    doc = F.struct(
        *[
            _wrap_value(F.col(f.name), f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    return df.select(
        F.to_json(doc, {"ignoreNullFields": "false"}).alias("value")
    )


def parse_collection_json(
    lines: DataFrame, schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """READ path: unwrap the Extended-JSON grammar and parse against
    ``schema`` (timestamps arrive as epoch millis post-unwrap and are
    converted back)."""
    parse_fields = [
        T.StructField(
            f.name,
            T.LongType()
            if isinstance(f.dataType, T.TimestampType)
            else f.dataType,
            True,
        )
        for f in schema.fields
    ]
    parsed = lines.select(
        F.from_json(
            unwrap_extended_json(F.col(value_col)),
            T.StructType(parse_fields),
        ).alias("r")
    ).select("r.*")
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            parsed = parsed.withColumn(
                f.name, F.timestamp_millis(F.col(f.name))
            )
    return parsed


def read_collection_export(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Golden derived-collection export → typed frame."""
    return parse_collection_json(spark.read.text(path), schema)
