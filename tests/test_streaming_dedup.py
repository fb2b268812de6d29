"""Streaming near-dup filtering vs a persisted LSH index
(streaming/dedup_stream.py) — cross-micro-batch semantics."""

from __future__ import annotations

import json

import pytest

from covid_19_fl_spark.sinks.batch import ParquetTable
from covid_19_fl_spark.streaming.dedup_stream import write_near_dedup

SCHEMA = "doc_id LONG, text STRING"

BASE = "the quick brown fox jumps over the lazy dog again and again " * 4
NEAR = BASE + "with one extra tail phrase"
OTHER = "completely different content about spark catalyst optimizer internals " * 4
THIRD = "a third unrelated document mentioning parquet footers and bloom filters " * 4


def _write(d, name, rows):
    (d / name).write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
    )


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    # batch 1: two distinct docs + an in-batch near-dup of doc 1
    _write(d, "b1.json", [(1, BASE), (2, OTHER), (3, NEAR)])
    # batch 2: near-dup of doc 1 (cross-batch, via the index) + a new doc
    _write(d, "b2.json", [(10, NEAR), (11, THIRD)])
    return d


def test_near_dedup_across_micro_batches(spark, tmp_path, input_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(input_dir))
    )
    out = ParquetTable(spark, str(tmp_path / "out"))
    bands = ParquetTable(spark, str(tmp_path / "bands"))
    shingles = ParquetTable(spark, str(tmp_path / "shingles"))
    q = (
        write_near_dedup(stream, out, bands, shingles, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # availableNow triggers always terminate; assert completion instead
    # of reading whatever landed by an arbitrary deadline (the 2-batch
    # drain takes >120s on a loaded local[8] session, and a partial
    # read then fails the KEPT assertion with a missing survivor).
    assert q.awaitTermination(600)

    kept = sorted(r.doc_id for r in out.read().select("doc_id").collect())
    # 3 loses to 1 in-batch; 10 loses to the indexed 1 cross-batch
    assert kept == [1, 2, 11]
    # index grew only with survivors
    assert sorted(
        r.doc_id for r in shingles.read().select("doc_id").distinct().collect()
    ) == [1, 2, 11]
    assert sorted(
        r.doc_id for r in bands.read().select("doc_id").distinct().collect()
    ) == [1, 2, 11]


def test_replay_is_idempotent(spark, tmp_path, input_dir):
    """Re-running the whole stream with a FRESH checkpoint (worst-case
    replay) must not duplicate output or index rows."""
    out = ParquetTable(spark, str(tmp_path / "out"))
    bands = ParquetTable(spark, str(tmp_path / "bands"))
    shingles = ParquetTable(spark, str(tmp_path / "shingles"))
    for i in range(2):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(input_dir))
        )
        q = (
            write_near_dedup(stream, out, bands, shingles, str(tmp_path / f"ckpt{i}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
    assert out.read().count() == 3
    assert bands.read().select("doc_id", "band_idx").distinct().count() == bands.read().count()
