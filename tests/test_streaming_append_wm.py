"""Append-mode watermark semantics that st_windowed_counts_append_wm's
oracle encodes (suite_r5): a window is emitted exactly when its END is
<= the final watermark — INCLUSIVE at equality — and rows later than
the watermark are dropped in subsequent batches."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

SCHEMA = "k STRING, ts TIMESTAMP"


def _drain(spark, d, delay, files_per_trigger=None):
    reader = spark.readStream.schema(SCHEMA)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(files_per_trigger))
    src = reader.json(str(d)).withWatermark("ts", delay)
    agg = src.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("n")
    )
    sink = f"wmappend_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    return sorted(
        (str(r.start), r.n)
        for r in spark.table(sink).select("w.start", "n").collect()
    )


def _write(path, rows, mtime=None):
    with open(path, "w") as fh:
        fh.write(
            "\n".join(json.dumps({"k": k, "ts": t}) for k, t in rows)
        )
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_window_end_equal_to_watermark_emits(spark, tmp_path):
    # max ts 03:00, delay 2h → final watermark 01:00 == end of the
    # [00:00, 01:00) window: the window EMITS (inclusive boundary) —
    # the exact semantics the suite oracle's HAVING <= encodes.
    _write(
        tmp_path / "f1.json",
        [("a", "2020-01-01T00:10:00"), ("a", "2020-01-01T03:00:00")],
    )
    out = _drain(spark, tmp_path, "2 hours")
    assert out == [("2020-01-01 00:00:00", 1)]


def test_window_end_above_watermark_is_withheld(spark, tmp_path):
    # max ts 02:59, delay 2h → watermark 00:59 < 01:00: withheld.
    _write(
        tmp_path / "f1.json",
        [("a", "2020-01-01T00:10:00"), ("a", "2020-01-01T02:59:00")],
    )
    assert _drain(spark, tmp_path, "2 hours") == []


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    # Watermark application lags one batch: batch 1 ADVANCES it to
    # 09:00, batch 2 runs WITH it (closing and emitting the
    # [00:00, 01:00) window with n=1), so batch 3's 00:31 row is late
    # against an already-closed window and must neither resurrect it
    # nor emit a duplicate.
    _write(
        tmp_path / "f1.json",
        [("a", "2020-01-01T00:30:00"), ("a", "2020-01-01T10:00:00")],
        mtime=1_500_000_000,
    )
    _write(
        tmp_path / "f2.json",
        [("a", "2020-01-01T10:30:00")],  # advances nothing below wm
        mtime=1_500_000_100,
    )
    _write(
        tmp_path / "f3.json",
        [("a", "2020-01-01T00:31:00")],  # 9.5h late vs the watermark
        mtime=1_500_000_200,
    )
    out = _drain(spark, tmp_path, "1 hours", files_per_trigger=1)
    assert out.count(("2020-01-01 00:00:00", 1)) == 1
    assert ("2020-01-01 00:00:00", 2) not in out
