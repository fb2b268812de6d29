"""Session-window streaming test (gap-based sessionization)."""

from __future__ import annotations

import json

from covid_19_fl_spark.sinks.batch import ParquetTable
from covid_19_fl_spark.streaming import pipeline

SCHEMA = "user_id LONG, ts TIMESTAMP"


def test_session_windows(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    rows = [
        # user 1: two sessions (09:00-09:10 cluster, then 11:00)
        (1, "2024-01-01T09:00:00"), (1, "2024-01-01T09:05:00"),
        (1, "2024-01-01T09:10:00"), (1, "2024-01-01T11:00:00"),
        # user 2: one session
        (2, "2024-01-01T09:00:00"), (2, "2024-01-01T09:20:00"),
    ]
    (d / "b1.json").write_text(
        "\n".join(json.dumps({"user_id": u, "ts": t}) for u, t in rows)
    )
    stream = spark.readStream.schema(SCHEMA).json(str(d))
    sessions = pipeline.session_counts_stream(stream, "user_id", "ts", gap="30 minutes")
    out = ParquetTable(spark, str(tmp_path / "out"))
    q = (
        sessions.writeStream.outputMode("complete")
        .foreachBatch(lambda b, _: out.overwrite(b) if not b.isEmpty() else None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, str(r.session_start)): r.n_events for r in out.read().collect()
    }
    assert got == {
        (1, "2024-01-01 09:00:00"): 3,   # merged 09:00/09:05/09:10
        (1, "2024-01-01 11:00:00"): 1,   # gap > 30 min → new session
        (2, "2024-01-01 09:00:00"): 2,   # 09:00+09:20 within gap
    }
