"""Time travel over the versioned parquet store (sinks/versioned.py):
snapshot addressability, atomic commit visibility, restore, vacuum."""

from __future__ import annotations

import os

import pytest

from covid_19_fl_spark.sinks.versioned import VersionedParquetTable


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedParquetTable(spark, str(tmp_path / "t"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_time_travel_reads_each_version(spark, vt):
    v1 = vt.commit(spark.createDataFrame([(1, "a")], "id long, s string"))
    v2 = vt.commit(spark.createDataFrame([(2, "b"), (3, "c")], "id long, s string"))
    assert (v1, v2) == (1, 2)
    assert _rows(vt.read(version=1)) == [(1, "a")]
    assert _rows(vt.read()) == [(2, "b"), (3, "c")]
    assert [m["version"] for m in vt.history()] == [1, 2]
    assert [m["n_rows"] for m in vt.history()] == [1, 2]


def test_append_commit_accumulates(spark, vt):
    vt.append_commit(spark.createDataFrame([(1,)], "id long"))
    vt.append_commit(spark.createDataFrame([(2,)], "id long"))
    assert _rows(vt.read()) == [(1,), (2,)]
    assert _rows(vt.read(version=1)) == [(1,)]


def test_restore_is_a_new_version_not_a_rewind(spark, vt):
    vt.commit(spark.createDataFrame([(1,)], "id long"))
    vt.commit(spark.createDataFrame([(2,)], "id long"))
    v3 = vt.restore(1)
    assert v3 == 3
    assert _rows(vt.read()) == [(1,)]
    assert _rows(vt.read(version=2)) == [(2,)]  # history intact
    assert vt.history()[-1]["op"] == "restore(1)"


def test_uncommitted_snapshot_dir_is_invisible_and_vacuumed(spark, vt):
    vt.commit(spark.createDataFrame([(1,)], "id long"))
    # simulate a writer that crashed after writing data, before the
    # log rename: a bare dir in _data with no manifest
    orphan = os.path.join(vt.data_dir, "deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-000.parquet"), "w").close()
    assert _rows(vt.read()) == [(1,)]  # invisible to readers
    removed = vt.vacuum(keep_last=5)
    assert "deadbeef" in removed
    assert _rows(vt.read()) == [(1,)]


def test_vacuum_drops_old_versions_keeps_restored_dir(spark, vt):
    vt.commit(spark.createDataFrame([(1,)], "id long"))
    vt.commit(spark.createDataFrame([(2,)], "id long"))
    vt.restore(1)  # v3 references v1's dir
    vt.vacuum(keep_last=1)
    assert _rows(vt.read()) == [(1,)]  # restored snapshot survives
    with pytest.raises(KeyError):
        vt.read(version=2)  # vacuumed beyond the window → fail fast


def test_read_missing_version_raises(spark, vt):
    vt.commit(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(KeyError):
        vt.read(version=9)
