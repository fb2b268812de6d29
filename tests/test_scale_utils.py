"""Skew-mitigation and physical-layout tests (SURVEY §4.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.operators.skew import salted_distinct_agg, salted_join
from covid_19_fl_spark.plans import layout


@pytest.fixture()
def skewed(spark):
    # 90% of rows share one hot key — the Dade/Broward shape.
    big = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("HOT", 1.0)] + [(f"k{i}", float(i)) for i in range(50)], "k string, w double"
    )
    return big, small


def test_salted_join_matches_plain_join(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).first()
    salted = salted_join(big, small, "k", buckets=8).agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).first()
    assert (plain.n, plain.sv, plain.sw) == (salted.n, salted.sv, salted.sw)


def test_salted_join_spreads_hot_key(spark, skewed):
    big, _ = skewed
    from covid_19_fl_spark.operators.skew import _row_salt

    buckets = (
        big.filter(F.col("k") == "HOT")
        .withColumn("_salt", _row_salt(big, 8))
        .groupBy("_salt").count()
    )
    rows = buckets.collect()
    assert len(rows) == 8                      # hot key occupies all salts
    assert max(r["count"] for r in rows) < 0.25 * 18_000  # roughly even


def test_salted_distinct_agg_exact(spark, skewed):
    big, _ = skewed
    plain = {
        r.k: r.n
        for r in big.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    salted = {r.k: r.n_distinct for r in salted_distinct_agg(big, "k", "v").collect()}
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from covid_19_fl_spark import tables

    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    layout.write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
    layout.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b", "o_orderkey", 8
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = layout.colocated_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Matching bucketing on both sides: SortMergeJoin with ZERO
        # shuffles — the 100 TB co-location payoff, verified.
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partitioned_write_prunes(spark, tmp_path, sf_dir):
    from covid_19_fl_spark import tables

    events = tables.load(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    layout.write_date_partitioned(events, str(tmp_path / "ev"), ["event_date"])
    q = spark.read.parquet(str(tmp_path / "ev")).filter(
        F.col("event_date") == "2024-01-01"
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    plan = q._jdf.queryExecution().executedPlan().toString()
    spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    assert q.count() > 0

def test_clustered_write_ranges_disjoint(spark, tmp_path, sf_dir):
    """write_clustered must give each data file a disjoint key range
    (the property min/max footer pruning depends on)."""
    from covid_19_fl_spark import tables

    path = str(tmp_path / "cl")
    layout.write_clustered(
        tables.load(spark, sf_dir, "lineitem"), path, ["l_shipdate"], files=6
    )
    ranges = layout.clustered_file_ranges(path, "l_shipdate")
    assert len(ranges) >= 2
    for (lo, hi), (nlo, nhi) in zip(ranges, ranges[1:]):
        assert lo <= hi and nlo <= nhi
    ordered = sorted(ranges)
    assert all(b[0] >= a[1] for a, b in zip(ordered, ordered[1:]))


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """With runtime filters on and broadcast off (forcing a shuffle
    join), Catalyst must inject a might_contain predicate on the fact
    side — pre-shuffle row pruning by the dimension's selective
    filter."""
    from covid_19_fl_spark import tables

    from covid_19_fl_spark.confs import scoped_conf

    with layout.with_runtime_filters(spark), scoped_conf(
        spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        orders = tables.load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = tables.load(spark, sf_dir, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower()
        # and the filtered result still matches the plain join
        assert j.count() == tables.load(spark, sf_dir, "lineitem").join(
            tables.load(spark, sf_dir, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).count()
    # scoped_conf restored the session's prior thresholds on exit — the
    # demo knobs (creation threshold 100MB, application threshold 0)
    # must not leak into later tests/queries.
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            None,
        )
        != "0"
    )


def test_cluster_conf_sizing(spark):
    """cluster_conf derives shuffle fan-out from data volume and keeps
    the local-vs-cluster posture consistent (AQE/UTC/Arrow in both)."""
    from covid_19_fl_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, executor_cores=4, input_tb=100.0)
    # 100 TB / 128 MB ≈ 800k shuffle partitions (≈128 MB per task).
    assert int(conf["spark.sql.shuffle.partitions"]) == 100 * 1024 * 1024 // 128
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.session.timeZone"] == "UTC"
    # tiny inputs still get ≥2 waves of tasks
    small = cluster_conf(executors=10, executor_cores=4, input_tb=0.001)
    assert int(small["spark.sql.shuffle.partitions"]) == 80
    # every value is a string (spark-submit --conf compatible)
    assert all(isinstance(v, str) for v in conf.values())


def test_zordered_write_tiles_both_dimensions(spark, tmp_path):
    """write_zordered must give every file a compact tile in BOTH key
    dimensions (vs single-axis clustering: perfect on one, useless on
    the other). 64x64 uniform grid into 16 files → ideal tiles span
    16/64 of each axis; assert the mean span stays well under half the
    global range on both."""
    from pyspark.sql import functions as F

    from covid_19_fl_spark.plans import layout

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    path = str(tmp_path / "zordered")
    layout.write_zordered(grid, path, ("x", "y"), files=16)

    for col in ("x", "y"):
        ranges = layout.clustered_file_ranges(path, col)
        assert len(ranges) >= 8  # repartitionByRange may merge a few
        spans = [hi - lo for lo, hi in ranges]
        mean_span = sum(spans) / len(spans)
        # global span is 63; ideal Morton tiles span ~15-31 per dim
        assert mean_span < 32, f"{col}: mean per-file span {mean_span}"

    # round-trip integrity: clustering must not drop or mutate rows
    back = spark.read.parquet(path)
    assert back.count() == 64 * 64
    assert back.select(F.sum("x"), F.sum("y")).first() == (64 * 63 * 32, 64 * 63 * 32)
