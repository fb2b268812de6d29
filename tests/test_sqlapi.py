"""SQL surface: ad-hoc spark.sql over registered corpus views must
produce the same plans/results as the DataFrame API."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import sqlapi, tables


def test_register_views_covers_corpus(spark, sf_dir):
    names = sqlapi.register_views(spark, sf_dir)
    assert set(names) == set(tables.TABLE_NAMES)
    for name in names:
        assert spark.table(name).count() > 0


def test_sql_matches_dataframe(spark, sf_dir):
    sql_rows = sqlapi.run_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0 GROUP BY o_orderstatus
        """,
    ).collect()
    df_rows = (
        tables.load(spark, sf_dir, "orders")
        .join(
            tables.load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_sql_view_scan_pushdown(spark, sf_dir):
    df = sqlapi.run_sql(
        spark, sf_dir, "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_sql_udfs_match_column_functions(spark):
    """register_functions exposes SQL-defined (NOT Python) UDFs whose
    bodies are generated from the same constants as the Column
    implementations — this pins the two surfaces together."""
    from covid_19_fl_spark.llmops import dedup, text

    names = sqlapi.register_functions(spark)
    assert "engine_quality_score" in names
    df = spark.createDataFrame(
        [
            (1, "The cat, and a dog! mail x2@y.com or +1 (555) 123-4567 the of"),
            (2, ""),
            (3, "  tabs\tand\nnewlines  "),
            (4, "the " * 120),
        ],
        "id long, s string",
    )
    df.createOrReplaceTempView("_udf_t")
    sql_rows = spark.sql(
        """
        SELECT id,
               engine_token_count(s) AS a, engine_bpe_count(s) AS b,
               engine_punct_count(s) AS c, engine_fingerprint(s) AS d,
               engine_portable_hash(s) AS e, engine_redact_pii(s) AS f,
               engine_quality_score(s) AS g
        FROM _udf_t
        """
    ).collect()
    col_rows = df.select(
        "id",
        text.token_count(F.col("s")).alias("a"),
        text.bpe_ish_count(F.col("s")).alias("b"),
        text.punct_count(F.col("s")).alias("c"),
        text.fingerprint(F.col("s")).alias("d"),
        (dedup.portable_hash(F.col("s")) % dedup.PORTABLE_PRIME).alias("e"),
        text.redact_pii(F.col("s")).alias("f"),
        text.quality_score(F.col("s")).alias("g"),
    ).collect()
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, col_rows))
    # declared-expression UDFs inline into the plan: no Python eval node
    plan = spark.sql(
        "SELECT engine_quality_score(s) FROM _udf_t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
