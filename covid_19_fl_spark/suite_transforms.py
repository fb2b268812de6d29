"""Projection/transform suite (SURVEY §2.3 P1-P9, §2.10 scalar surface,
§2.9 G1/G2, §2.8 U2) — the reference's per-row Python ingest loops as
pure Column expressions, plus the closed-form growth simulation.

Everything here is JVM-side whole-stage-codegen — zero Python UDFs
(SURVEY §2.12: the reference's lambdas all reduce to native exprs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import normalize
from .suite import _RATES_SQL, _daily_cum, _growth_rate_series, _t, query


@query(
    "p_scalar_suite",
    oracle="""
    SELECT doc_id,
           CAST(NULLIF(regexp_replace(source, '[^0-9]', '', 'g'), '') AS INT) AS source_num,
           NULLIF(lang, 'en') AS lang_non_en,
           COALESCE(NULLIF(lang, 'en'), 'english') AS lang_or_default,
           upper(substr(source, 1, 1)) || lower(substr(source, 2)) AS source_title,
           array_to_string(
             list_transform(string_split(text, ' ')[1:5],
                            x -> CASE WHEN len(trim(x)) > 4
                                      THEN upper(substr(trim(x), 1, 1)) || lower(substr(trim(x), 2))
                                      ELSE trim(x) END), '|') AS tok5,
           CASE WHEN doc_id % 7 > 0
                THEN CAST(n_chars AS DOUBLE) / (doc_id % 7) ELSE 0.0 END AS guarded,
           ROUND(n_chars / (1000 / 1000.0), 2) AS per_k
    FROM documents
    """,
)
def p_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4, P8, P9 — the full scalar-normalization surface in one
    projection: digit-strip cast, NA→null, NA→default, title-case,
    split + conditional per-token initcap (the ≤2-char state-code
    preservation idiom generalized), guarded ratio, per-capita round.

    Reference: cv.py:61-63, cv-api.py:106-119, cv-county-stats.py:66.
    """
    docs = _t(spark, sf_dir, "documents")
    tok5 = F.slice(F.split(F.col("text"), " "), 1, 5)
    return docs.select(
        "doc_id",
        normalize.digits_to_int(F.col("source")).alias("source_num"),
        normalize.na_to_null(F.col("lang"), sentinel="en").alias("lang_non_en"),
        normalize.na_to_default(F.col("lang"), "english", sentinel="en").alias(
            "lang_or_default"
        ),
        normalize.title_case(F.col("source")).alias("source_title"),
        F.array_join(
            F.transform(
                tok5,
                lambda x: F.when(
                    F.length(F.trim(x)) > 4, F.initcap(F.trim(x))
                ).otherwise(F.trim(x)),
            ),
            "|",
        ).alias("tok5"),
        normalize.guarded_ratio(F.col("n_chars"), F.col("doc_id") % 7).alias("guarded"),
        normalize.per_capita(F.col("n_chars"), F.lit(1000)).alias("per_k"),
    )


@query(
    "p_date_parsing",
    oracle="""
    SELECT DISTINCT
           strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS ymd,
           CAST(strptime(strftime(CAST(o_orderdate AS DATE), '%Y%m%d'), '%Y%m%d') AS DATE)
             AS reparsed,
           CAST(date_trunc('day', o_orderdate) AS DATE) AS day_trunc
    FROM orders
    """,
)
def p_date_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6 — date formatting + pattern parse round-trip + day
    truncation (cv-api.py:115,156; cv-csv.py:57,89)."""
    orders = _t(spark, sf_dir, "orders")
    ymd = F.date_format(F.col("o_orderdate").cast("date"), "yyyyMMdd")
    return orders.select(
        ymd.alias("ymd"),
        F.to_date(ymd, "yyyyMMdd").alias("reparsed"),
        F.date_trunc("DAY", F.col("o_orderdate")).cast("date").alias("day_trunc"),
    ).distinct()


@query(
    "p_epoch_ms_to_day",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('day', to_timestamp(epoch_ms(ts) // 1000)) AS DATE) AS event_day
    FROM events
    """,
)
def p_epoch_ms_to_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — epoch-millis → day-truncated date (cv-api.py:115), second
    precision (the reference's fromtimestamp(ms/1000) also floors)."""
    events = _t(spark, sf_dir, "events")
    epoch_s = F.floor(F.unix_millis(F.col("ts")) / 1000)
    return events.select(
        "event_id",
        normalize.epoch_ms_to_day(epoch_s * 1000).cast("date").alias("event_day"),
    )


# ---------------------------------------------------------------------------
# G1/G2 — growth simulation + tagged union (SURVEY §2.9, U2)
# ---------------------------------------------------------------------------

_SIM_SQL = f"""
    WITH rates AS ({_RATES_SQL}),
    gf AS (
      SELECT ROUND(AVG(rate), 12) AS gf
      FROM (SELECT rate FROM rates WHERE rate IS NOT NULL
            ORDER BY order_date DESC LIMIT 5) t
    ),
    seed AS (
      SELECT order_date AS last_date, CAST(cum_orders AS DOUBLE) AS last_count
      FROM (
        SELECT order_date,
               SUM(n_orders) OVER (ORDER BY order_date
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_orders
        FROM (SELECT CAST(o_orderdate AS DATE) AS order_date,
                     COUNT(o_orderkey) AS n_orders
              FROM orders GROUP BY 1) d
      ) c ORDER BY order_date DESC LIMIT 1
    )
    SELECT CAST(last_date + i * INTERVAL 1 DAY AS DATE) AS date,
           ROUND(last_count * pow(gf, i), 6) AS count
    FROM seed, gf, generate_series(1, 14) s(i)
"""


def _simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form geometric growth projection (cv-stats.py:69-83,
    105-109): count_i = last_count * gf^i — explode(sequence) + pow,
    no sequential driver loop; the seed is a 1-row broadcast."""
    rates = _growth_rate_series(spark, sf_dir)
    tail5 = (
        rates.filter(F.col("rate").isNotNull())
        .orderBy(F.col("order_date").desc())
        .limit(5)
    )
    gf = tail5.agg(F.round(F.avg("rate"), 12).alias("gf"))
    seed = (
        _daily_cum(spark, sf_dir)
        .orderBy(F.col("order_date").desc())
        .limit(1)
        .select(
            F.col("order_date").alias("last_date"),
            F.col("cum_orders").cast("double").alias("last_count"),
        )
        .crossJoin(F.broadcast(gf))
    )
    return seed.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(14))).alias("i")
    ).select(
        F.date_add(F.col("last_date"), F.col("i")).alias("date"),
        F.round(F.col("last_count") * F.pow(F.col("gf"), F.col("i")), 6).alias("count"),
    )


@query("g1_growth_sim", oracle=_SIM_SQL)
def g1_growth_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — 14-day geometric growth projection, closed form."""
    return _simulation(spark, sf_dir)


@query(
    "u2_union_tagged_series",
    oracle=f"""
    WITH sim AS ({_SIM_SQL}),
    actual AS (
      SELECT order_date AS date, CAST(cum_orders AS DOUBLE) AS count
      FROM (
        SELECT order_date,
               SUM(n_orders) OVER (ORDER BY order_date
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_orders
        FROM (SELECT CAST(o_orderdate AS DATE) AS order_date,
                     COUNT(o_orderkey) AS n_orders
              FROM orders GROUP BY 1) d
      ) c
    )
    SELECT date, count, 'actual' AS series FROM actual
    UNION ALL
    SELECT date, count, 'predicted' AS series FROM sim
    """,
)
def u2_union_tagged_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — actual + predicted series unioned under a tag column
    (cv-stats.py:95-115's florida_growth collection)."""
    actual = _daily_cum(spark, sf_dir).select(
        F.col("order_date").alias("date"),
        F.col("cum_orders").cast("double").alias("count"),
        F.lit("actual").alias("series"),
    )
    predicted = _simulation(spark, sf_dir).withColumn("series", F.lit("predicted"))
    return actual.unionByName(predicted)
