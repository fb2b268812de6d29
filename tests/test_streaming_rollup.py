"""Streaming continuous-aggregate maintenance (streaming/rollup.py):
multi-micro-batch state folding must equal a batch aggregate over all
input, replays must be no-ops, and the monthly view must equal the
batch x_agg_state_rollup shape computed directly."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.sinks.batch import ParquetTable
from covid_19_fl_spark.streaming import rollup

SCHEMA = "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"

ROWS = [
    (1, "2024-01-03T10:00:00", "click", 1.5),
    (2, "2024-01-03T11:00:00", "click", 2.5),
    (3, "2024-01-04T09:00:00", "view", 4.0),
    (4, "2024-02-01T00:30:00", "click", -1.0),
    (5, "2024-02-01T08:00:00", "view", 0.25),
    (6, "2024-02-02T23:59:59", "view", 10.0),
]


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # three arrivals → three micro-batches (maxFilesPerTrigger=1)
    for i, chunk in enumerate((ROWS[:2], ROWS[2:4], ROWS[4:])):
        (d / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"event_id": e, "ts": ts, "event_type": t, "value": v})
                for e, ts, t, v in chunk
            )
        )
    return d


def _run(spark, input_dir, table, cp):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(input_dir))
    )
    q = (
        rollup.write_rollup_states(stream, table, str(cp))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streamed_states_equal_batch_aggregate(spark, tmp_path, input_dir):
    table = ParquetTable(spark, str(tmp_path / "states"))
    _run(spark, input_dir, table, tmp_path / "cp")

    all_events = spark.createDataFrame(
        [(e, ts.replace("T", " "), t, v) for e, ts, t, v in ROWS],
        "event_id long, ts string, event_type string, value double",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    expect = rollup.batch_states(all_events)
    got = table.read().drop("_last_batch")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))

    daily = {(r.event_type, str(r.event_date)): r for r in rollup.read_daily(table).collect()}
    assert daily[("click", "2024-01-03")].n_events == 2
    assert daily[("click", "2024-01-03")].total_value == 4.0
    assert daily[("view", "2024-02-02")].min_value == 10.0

    # monthly view == direct monthly aggregation of the raw events
    direct = all_events.groupBy(
        "event_type", F.trunc(F.col("ts").cast("date"), "month").alias("month")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double") / F.count("*"), 6
        ).alias("avg_value"),
    )
    assert sorted(map(tuple, rollup.read_monthly(table).collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_replayed_batch_is_noop(spark, tmp_path, input_dir):
    table = ParquetTable(spark, str(tmp_path / "states"))
    _run(spark, input_dir, table, tmp_path / "cp")
    before = sorted(map(tuple, table.read().collect()))
    last = table.read().agg(F.max("_last_batch")).first()[0]
    assert last is not None

    replay = spark.createDataFrame(
        [(9, "2024-01-03 10:00:00", "click", 1.5)],
        "event_id long, ts string, event_type string, value double",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    # at-least-once replay: same (and older) batch ids must be no-ops
    assert rollup.apply_batch(table, replay, last) is False
    assert rollup.apply_batch(table, replay, last - 1) is False
    assert sorted(map(tuple, table.read().collect())) == before

    # a genuinely new batch id applies exactly once
    assert rollup.apply_batch(table, replay, last + 1) is True
    daily = {(r.event_type, str(r.event_date)): r for r in rollup.read_daily(table).collect()}
    assert daily[("click", "2024-01-03")].n_events == 3
    assert daily[("click", "2024-01-03")].total_value == 5.5
    # restarting the finished stream on the same checkpoint produces no
    # new micro-batches and leaves state untouched
    mid = sorted(map(tuple, table.read().collect()))
    _run(spark, input_dir, table, tmp_path / "cp")
    assert sorted(map(tuple, table.read().collect())) == mid
