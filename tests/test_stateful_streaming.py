"""applyInPandasWithState test: per-key running totals survive across
micro-batches via the state store (the epidemic curve as a true
streaming stateful operator)."""

from __future__ import annotations

import json

import pytest

from covid_19_fl_spark.sinks.batch import ParquetTable
from covid_19_fl_spark.streaming.stateful import running_totals

SCHEMA = "county STRING, case_number LONG"


def test_running_totals_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "b1.json").write_text(
        "\n".join(
            json.dumps({"county": c, "case_number": i})
            for i, c in enumerate(["Dade", "Dade", "Broward"])
        )
    )
    (d / "b2.json").write_text(
        "\n".join(
            json.dumps({"county": c, "case_number": 10 + i})
            for i, c in enumerate(["Dade", "Alachua"])
        )
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = ParquetTable(spark, str(tmp_path / "out"))
    q = (
        running_totals(stream, "county")
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _: out.append(b) if not b.isEmpty() else None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = out.read().collect()
    # Per (key, batch) emissions; the running total accumulates in the
    # state store across micro-batches.
    per_key = {}
    for r in rows:
        per_key.setdefault(r.key, []).append((r.batch_rows, r.running_total))
    for k in per_key:
        per_key[k].sort(key=lambda t: t[1])

    assert per_key["Broward"] == [(1, 1)]
    assert per_key["Alachua"] == [(1, 1)]
    assert per_key["Dade"] == [(2, 2), (1, 3)]  # state carried: 2 then 2+1


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


class _StubValueState:
    """Driver-side stand-in for the transformWithState typed value
    state: same exists/get/update surface the processor uses."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        self.states[name] = (_StubValueState(), schema)
        return self.states[name][0]


def test_tws_processor_contract_without_worker_protocol():
    """The StatefulProcessor lifecycle contract (init registers typed
    value state; handleInputRows folds across calls through it) runs
    against a stub handle — protobuf-free, so the processor logic is
    exercised even where the worker protocol wheel is absent."""
    import pandas as pd

    from covid_19_fl_spark.streaming.stateful import (
        make_running_total_processor,
    )

    proc = make_running_total_processor()
    handle = _StubHandle()
    proc.init(handle)
    assert list(handle.states) == ["total"]
    assert handle.states["total"][1] == "total LONG"

    # batch 1: two rows for Dade (arriving as two Arrow chunks)
    out1 = list(
        proc.handleInputRows(
            ("Dade",),
            iter([pd.DataFrame({"x": [1]}), pd.DataFrame({"x": [2]})]),
            None,
        )
    )
    # batch 2: one more row — state must carry the prior total
    out2 = list(
        proc.handleInputRows(("Dade",), iter([pd.DataFrame({"x": [3]})]), None)
    )
    proc.close()
    assert out1[0].to_dict("records") == [
        {"key": "Dade", "batch_rows": 2, "running_total": 2}
    ]
    assert out2[0].to_dict("records") == [
        {"key": "Dade", "batch_rows": 1, "running_total": 3}
    ]


def test_running_totals_tws_across_batches(spark, tmp_path):
    """transformWithStateInPandas end to end. The plan-level plumbing
    (grouping, output schema, streaming-ness) analyzes without
    protobuf and is asserted everywhere; the executed drain needs
    protobuf on the Python workers, so where the wheel is absent this
    test instead PROVES the documented limitation: starting the query
    surfaces the protobuf import failure (container evidence, not a
    silent skip)."""
    from covid_19_fl_spark.streaming.stateful import (
        RUNNING_TOTAL_SCHEMA,
        running_totals_tws,
    )

    d = tmp_path / "in"
    d.mkdir()
    (d / "b1.json").write_text(
        "\n".join(
            json.dumps({"county": c, "case_number": i})
            for i, c in enumerate(["Dade", "Dade", "Broward"])
        )
    )
    (d / "b2.json").write_text(
        "\n".join(
            json.dumps({"county": c, "case_number": 10 + i})
            for i, c in enumerate(["Dade", "Alachua"])
        )
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    plan_df = running_totals_tws(stream, "county")
    # Catalyst analysis of the TWS operator is protobuf-free: the
    # declared output schema and streaming-ness hold everywhere.
    assert plan_df.isStreaming
    assert plan_df.schema == RUNNING_TOTAL_SCHEMA

    out = ParquetTable(spark, str(tmp_path / "out"))
    q = (
        plan_df.writeStream.outputMode("update")
        .foreachBatch(lambda b, _: out.append(b) if not b.isEmpty() else None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not _has_protobuf():
        # documented container evidence: without protobuf the TWS
        # driver worker (whose wire protocol imports it) dies at
        # startup — the query fails on the worker process, not on our
        # operator (Spark reports the crashed worker, not the inner
        # ImportError)
        with pytest.raises(
            Exception,
            match="(?i)protobuf|google|TransformWithState.*worker",
        ):
            q.awaitTermination(120)
            q.processAllAvailable()
        q.stop()
        return
    q.awaitTermination(120)

    per_key = {}
    for r in out.read().collect():
        per_key.setdefault(r.key, []).append((r.batch_rows, r.running_total))
    for k in per_key:
        per_key[k].sort(key=lambda t: t[1])
    assert per_key["Broward"] == [(1, 1)]
    assert per_key["Alachua"] == [(1, 1)]
    assert per_key["Dade"] == [(2, 2), (1, 3)]


def test_dedup_bounded_state_drops_near_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark: redelivered keys inside the
    window are dropped; the first occurrence of each key survives."""
    from covid_19_fl_spark.streaming.pipeline import dedup_bounded_state

    d = tmp_path / "in"
    d.mkdir()
    (d / "b1.json").write_text(
        "\n".join(
            json.dumps({"k": k, "ts": f"2024-01-01T00:0{i}:00.000Z"})
            for i, k in enumerate(["a", "a", "b"])
        )
    )
    (d / "b2.json").write_text(
        json.dumps({"k": "a", "ts": "2024-01-01T00:05:00.000Z"})  # redelivery
        + "\n"
        + json.dumps({"k": "c", "ts": "2024-01-01T00:06:00.000Z"})
    )
    stream = (
        spark.readStream.schema("k STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = ParquetTable(spark, str(tmp_path / "out"))
    q = (
        dedup_bounded_state(stream, ["k"], "ts", within="1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _: out.append(b) if not b.isEmpty() else None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.k for r in out.read().collect())
    assert got == ["a", "b", "c"]  # both in-batch and cross-batch dups dropped


def test_cusum_monitor_replay_invariant_and_correct(spark, tmp_path):
    """The streaming CUSUM fold must be bit-identical whether the same
    in-order stream arrives as one micro-batch or three, and must match
    the textbook recursion computed driver-side."""
    import json as _json

    from covid_19_fl_spark.streaming.stateful import cusum_monitor

    values = [10.0, 12.5, 9.0, 15.0, 20.0, 3.0, 11.0, 30.0]
    rows = [
        {"sensor": "a", "seq": i, "reading": v} for i, v in enumerate(values)
    ]
    schema = "sensor STRING, seq LONG, reading DOUBLE"

    def run(split: int, name: str) -> dict:
        d = tmp_path / f"in_{name}"
        d.mkdir()
        # contiguous order-preserving chunks: the operator's contract is
        # in-order delivery, so each file carries a consecutive slice
        per = (len(rows) + split - 1) // split
        chunks = [rows[i * per : (i + 1) * per] for i in range(split)]
        import os as _os
        import time as _time

        base = _time.time() - 60
        for i, chunk in enumerate(chunks):
            p = d / f"b{i}.json"
            p.write_text("\n".join(_json.dumps(r) for r in chunk))
            # The file source orders micro-batches by modification time;
            # same-second writes tie and can arrive out of order. In-order
            # delivery is the operator's contract, so pin distinct mtimes.
            _os.utime(p, (base + 10 * i, base + 10 * i))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(d))
        )
        sink: list = []
        q = (
            cusum_monitor(
                stream,
                "sensor",
                "reading",
                ["seq"],
                target=11.0,
                slack=1.0,
                threshold=8.0,
            )
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _: sink.extend(b.collect()) if not b.isEmpty() else None
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        last = max(sink, key=lambda r: r.n_seen)
        return {
            "n": last.n_seen,
            "up": last.cusum_up,
            "dn": last.cusum_down,
            "alarms": last.alarms,
        }

    one = run(1, "one")
    two = run(2, "two")
    assert one == two  # replay-invariant under micro-batch slicing

    # textbook recursion, integer micro-units
    s_up = s_dn = alarms = 0
    for v in values:
        v_u = round(v * 1_000_000)
        s_up = max(0, s_up + (v_u - 12_000_000))
        s_dn = max(0, s_dn + (10_000_000 - v_u))
        if s_up > 8_000_000 or s_dn > 8_000_000:
            alarms += 1
    assert one == {"n": len(values), "up": s_up, "dn": s_dn, "alarms": alarms}
