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
