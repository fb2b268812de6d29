"""applyInPandasWithState test: per-key running totals survive across
micro-batches via the state store (the epidemic curve as a true
streaming stateful operator)."""

from __future__ import annotations

import json

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
