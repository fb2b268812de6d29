"""operators.ranks — the distributed global-order decomposition must
equal the naive single-partition window row-for-row (rank, running
sum, exclusive running max, totals, NTILE derivation), and must plan
partitioned windows over the data (the whole point)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from covid_19_fl_spark import tables
from covid_19_fl_spark.operators import ranks

from .conftest import SF_SMOKE


def _parts(spark):
    li = tables.load(spark, SF_SMOKE, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).alias("revenue")
    )


def test_global_rank_and_totals_match_naive(spark):
    parts = _parts(spark)
    got = (
        ranks.with_global_prefix(
            parts,
            bucket=F.floor(F.col("revenue") / 4096),
            order_cols=[F.col("revenue"), F.col("l_partkey")],
            rn="i",
            total_count="n",
            total_sums={"tot": F.col("revenue")},
        )
        .select("l_partkey", "i", "n", "tot")
        .orderBy("l_partkey")
        .collect()
    )
    naive = (
        parts.select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy("revenue", "l_partkey"))
            .cast("long")
            .alias("i"),
            F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
            F.sum("revenue").over(Window.partitionBy()).alias("tot"),
        )
        .orderBy("l_partkey")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in naive]


def test_running_sum_desc_matches_naive(spark):
    parts = _parts(spark)
    got = (
        ranks.with_global_prefix(
            parts,
            bucket=-F.floor(F.col("revenue") / 4096),
            order_cols=[F.col("revenue").desc(), F.col("l_partkey")],
            running_sums={"cum": F.col("revenue")},
        )
        .select("l_partkey", "cum")
        .orderBy("l_partkey")
        .collect()
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = (
        parts.select("l_partkey", F.sum("revenue").over(w).alias("cum"))
        .orderBy("l_partkey")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in naive]


def test_partitioned_running_sum_matches_naive(spark):
    li = tables.load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("decimal(28,2)").alias("wgt"),
    )
    pts = li.groupBy("l_returnflag", "price").agg(F.sum("wgt").alias("wgt"))
    got = (
        ranks.with_global_prefix(
            pts,
            bucket=F.floor(F.col("price") / 512),
            order_cols=[F.col("price")],
            partition_cols=["l_returnflag"],
            running_sums={"cum": F.col("wgt")},
            total_sums={"tot": F.col("wgt")},
        )
        .select("l_returnflag", "price", "cum", "tot")
        .orderBy("l_returnflag", "price")
        .collect()
    )
    wrun = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = (
        pts.select(
            "l_returnflag",
            "price",
            F.sum("wgt").over(wrun).alias("cum"),
            F.sum("wgt").over(Window.partitionBy("l_returnflag")).alias("tot"),
        )
        .orderBy("l_returnflag", "price")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in naive]


def test_prior_running_max_matches_naive(spark):
    li = tables.load(spark, SF_SMOKE, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p"),
        F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("q"),
    )
    order = [F.col("p").asc(), F.col("q").desc(), F.col("l_partkey")]
    got = (
        ranks.with_prior_running_max(
            parts, F.floor(F.col("p") / 512), order, F.col("q"), "pm"
        )
        .select("l_partkey", "pm")
        .orderBy("l_partkey")
        .collect()
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        parts.select("l_partkey", F.max("q").over(w).alias("pm"))
        .orderBy("l_partkey")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in naive]


def test_explicit_ntile_formula_matches_builtin(spark):
    # The x_lorenz_deciles decile derivation: standard NTILE spelled
    # from (global rank, n) with integer ops — must agree with Spark's
    # ntile() for sizes that exercise remainder != 0 and n < k.
    for n_rows in (7, 23, 40, 101):
        df = spark.range(n_rows).select(F.col("id").alias("v"))
        naive = df.select(
            "v", F.ntile(10).over(Window.orderBy("v")).alias("d")
        )
        derived = (
            ranks.with_global_prefix(
                df,
                bucket=F.floor(F.col("v") / 8),
                order_cols=[F.col("v")],
                rn="i",
                total_count="n",
            )
            .select(
                "v",
                F.expr(
                    "CASE WHEN i <= (n % 10) * (n div 10 + 1) "
                    "THEN (i - 1) div (n div 10 + 1) + 1 "
                    "ELSE (n % 10) + (i - 1 - (n % 10) * (n div 10 + 1)) "
                    "     div (n div 10) + 1 END"
                )
                .cast("int")
                .alias("d"),
            )
        )
        a = {r.v: r.d for r in naive.collect()}
        b = {r.v: r.d for r in derived.collect()}
        assert a == b, f"n_rows={n_rows}"


def test_no_unpartitioned_window_over_data(spark):
    # The plan must window over (__gp_bkt)-partitioned frames; the only
    # empty-partition-spec window allowed is the tiny bucket spine.
    parts = _parts(spark)
    out = ranks.with_global_prefix(
        parts,
        bucket=F.floor(F.col("revenue") / 4096),
        order_cols=[F.col("revenue"), F.col("l_partkey")],
        rn="i",
        running_sums={"cum": F.col("revenue")},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number()" in plan
    # the data-side window carries the bucket partition key
    assert "partitionspec=[__gp_bkt" in plan.replace(" ", "").lower() or (
        "__gp_bkt" in plan
    )


def test_ivf_recall_monotone_in_nprobe(spark):
    # ss_ivf_recall_sweep's contract: widening the probe set can only
    # add candidates, so recall@5 is non-decreasing in nprobe.
    from covid_19_fl_spark import suite

    rows = (
        suite.QUERIES["ss_ivf_recall_sweep"](spark, SF_SMOKE)
        .orderBy("nprobe")
        .collect()
    )
    recalls = [r.recall for r in rows]
    assert [r.nprobe for r in rows] == [1, 2, 4]
    assert recalls == sorted(recalls)


def test_null_bucket_raises_loudly(spark):
    # ADVICE r4: a NULL bucket used to vanish from the equi-join while
    # still shifting the spine — now it must fail at execution time.
    import pytest

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
    )
    out = ranks.with_global_prefix(
        df, bucket=F.floor(F.col("v") / 8), order_cols=[F.col("v")], rn="i"
    )
    with pytest.raises(Exception, match="NULL bucket"):
        out.collect()
    out2 = ranks.with_prior_running_max(
        df, F.floor(F.col("v") / 8), [F.col("v")], F.col("v"), "mx"
    )
    with pytest.raises(Exception, match="NULL bucket"):
        out2.collect()
    # non-null inputs are unaffected
    clean = df.filter(F.col("v").isNotNull())
    rows = (
        ranks.with_global_prefix(
            clean, F.floor(F.col("v") / 8), [F.col("v")], rn="i"
        )
        .orderBy("i")
        .collect()
    )
    assert [r.id for r in rows] == [1, 3]
