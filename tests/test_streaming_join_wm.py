"""Watermarked stream-stream join (suite_r5.st_stream_stream_join_wm):
the gate run pins a single batch for exactness; THIS file pins the
production property the gate cannot show — with event-time watermarks
on both sides and a range join condition, the symmetric join state
EVICTS rows the watermark has passed instead of holding the whole
history."""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import functions as F

ORDER_SCHEMA = "o_orderkey LONG, o_ts TIMESTAMP"
ITEM_SCHEMA = "l_orderkey LONG, l_flag STRING, l_ts TIMESTAMP"


def _write(path, rows, cols, mtime):
    with open(path, "w") as fh:
        fh.write(
            "\n".join(json.dumps(dict(zip(cols, r))) for r in rows)
        )
    # file-stream batch order follows modification time — pin it so
    # the early file is batch 1 deterministically (verify-skill gotcha)
    os.utime(path, (mtime, mtime))


def test_watermarked_join_state_evicts_across_batches(spark, tmp_path):
    odir = tmp_path / "orders"
    idir = tmp_path / "items"
    odir.mkdir()
    idir.mkdir()
    t0 = time.time() - 1000
    # era 1: January. era 2: March — far past era 1 + band + delay, so
    # after batch 2's watermark no era-1 row can still match and the
    # store must have dropped them.
    _write(
        odir / "f1.json",
        [(1, "2020-01-01T00:00:00"), (2, "2020-01-02T00:00:00")],
        ["o_orderkey", "o_ts"],
        t0,
    )
    _write(
        idir / "f1.json",
        [
            (1, "A", "2020-01-02T00:00:00"),  # in band (1 day after)
            (2, "B", "2020-01-10T00:00:00"),  # out of band (8 days)
        ],
        ["l_orderkey", "l_flag", "l_ts"],
        t0,
    )
    _write(
        odir / "f2.json",
        [(3, "2020-03-01T00:00:00")],
        ["o_orderkey", "o_ts"],
        t0 + 100,
    )
    _write(
        idir / "f2.json",
        [(3, "C", "2020-03-02T00:00:00")],  # in band
        ["l_orderkey", "l_flag", "l_ts"],
        t0 + 100,
    )

    orders = (
        spark.readStream.schema(ORDER_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(odir))
        .withWatermark("o_ts", "1 day")
    )
    items = (
        spark.readStream.schema(ITEM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(idir))
        .withWatermark("l_ts", "1 day")
    )
    joined = items.join(
        orders,
        (items.l_orderkey == orders.o_orderkey)
        & (items.l_ts >= orders.o_ts)
        & (items.l_ts <= orders.o_ts + F.expr("INTERVAL 2 DAYS")),
    ).select("l_orderkey", "l_flag")

    sink = f"wmjoin_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p]
    q.stop()

    # correctness: era-boundary-free construction → the two in-band
    # pairs and nothing else (the 8-day item is outside the range)
    rows = sorted(
        (r.l_orderkey, r.l_flag) for r in spark.table(sink).collect()
    )
    assert rows == [(1, "A"), (3, "C")]

    # eviction: multiple data batches ran, and the join state at the
    # end holds fewer rows than the total rows buffered (6 inputs
    # crossed the join; era-1's 4 must be gone once the watermark
    # reaches March)
    data_batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    assert len(data_batches) >= 2, "stage should drain in ≥2 batches"
    state_rows = [
        op.get("numRowsTotal")
        for p in progresses
        for op in p.get("stateOperators", [])
        if op.get("numRowsTotal") is not None
    ]
    assert state_rows, "no state operator metrics reported"
    total_inputs = 6
    assert state_rows[-1] < total_inputs, (
        f"final join state holds {state_rows[-1]} rows — watermark "
        "eviction did not fire"
    )
    # and rows were actually removed at some point, not merely never
    # inserted
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in p.get("stateOperators", [])
    )
    assert removed > 0, "no state rows were ever evicted"
