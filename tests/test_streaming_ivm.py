"""Streaming join-view maintenance (streaming/ivm_stream.py): batched
delta-rule application must track the full recompute exactly, and
at-least-once replays — including partial-crash replays — must be
no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.sinks.batch import ParquetTable
from covid_19_fl_spark.streaming.ivm_stream import JoinViewMaintainer


def _agg(df):
    return df.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(28,4)")).alias("sv"),
    )


@pytest.fixture()
def maintainer(spark, tmp_path):
    return JoinViewMaintainer(
        a_store=ParquetTable(spark, str(tmp_path / "a")),
        b_store=ParquetTable(spark, str(tmp_path / "b")),
        view_store=ParquetTable(spark, str(tmp_path / "v")),
        on="k",
        keys=["grp"],
        agg=_agg,
    )


def _batches(spark):
    def a(rows):
        return spark.createDataFrame(rows, "k long, grp string")

    def b(rows):
        return spark.createDataFrame(rows, "k long, v double")

    return [
        (a([(1, "x"), (2, "y")]), b([(1, 1.0), (1, 2.0)])),
        (a([(3, "x")]), b([(2, 5.0), (3, 7.0)])),
        (a([]), b([(1, 11.0), (3, 13.0)])),
        (a([(4, "y"), (1, "y")]), b([])),
    ]


def _snapshot(view_df):
    return {r.grp: (r.n, r.sv) for r in view_df.collect()}


def test_tracks_full_recompute_batch_by_batch(spark, maintainer):
    batches = _batches(spark)
    all_a = batches[0][0].limit(0)
    all_b = batches[0][1].limit(0)
    for i, (da, db) in enumerate(batches):
        assert maintainer.apply(da, db, batch_id=i)
        all_a, all_b = all_a.unionByName(da), all_b.unionByName(db)
        assert _snapshot(maintainer.read_view()) == _snapshot(
            _agg(all_a.join(all_b, "k"))
        ), f"diverged at batch {i}"


def test_replay_of_applied_batch_is_noop(spark, maintainer):
    batches = _batches(spark)
    for i, (da, db) in enumerate(batches[:2]):
        assert maintainer.apply(da, db, batch_id=i)
    before = _snapshot(maintainer.read_view())
    assert not maintainer.apply(*batches[1], batch_id=1)  # at-least-once replay
    assert _snapshot(maintainer.read_view()) == before
    a_rows = maintainer.a_store.read().count()
    assert not maintainer.apply(*batches[0], batch_id=0)
    assert maintainer.a_store.read().count() == a_rows  # no double-append


def test_partial_crash_replay_recovers_exactly_once(spark, maintainer):
    batches = _batches(spark)
    assert maintainer.apply(*batches[0], batch_id=0)
    # Simulate a crash AFTER the raw appends of batch 1 but BEFORE the
    # view swap: append the stamped raws by hand, leave the view at 0.
    da, db = batches[1]
    maintainer._append_once(maintainer.a_store, da, batch_id=1)
    maintainer._append_once(maintainer.b_store, db, batch_id=1)
    # The foreachBatch replay of batch 1 must complete it exactly once.
    assert maintainer.apply(da, db, batch_id=1)
    all_a = batches[0][0].unionByName(da)
    all_b = batches[0][1].unionByName(db)
    assert _snapshot(maintainer.read_view()) == _snapshot(
        _agg(all_a.join(all_b, "k"))
    )
    # and the raws hold each row exactly once
    assert maintainer.a_store.read().count() == 3
    assert maintainer.b_store.read().count() == 4


def test_empty_batch_is_noop(spark, maintainer):
    batches = _batches(spark)
    assert maintainer.apply(*batches[0], batch_id=0)
    before = _snapshot(maintainer.read_view())
    empty_a, empty_b = batches[0][0].limit(0), batches[0][1].limit(0)
    assert not maintainer.apply(empty_a, empty_b, batch_id=1)
    assert _snapshot(maintainer.read_view()) == before
