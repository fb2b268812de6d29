"""Versioned parquet table — time travel over the K2 full-refresh verb
(SURVEY §2.2). The reference's refresh is destructive (delete_many +
insert_many, cv-api.py:184-207: yesterday's table is gone); ParquetTable
keeps it atomic but still single-version. This store keeps every
committed snapshot addressable — Delta-style time travel without Delta
jars, scoped to the single-writer case (multi-writer needs the real
transaction log).

Layout:

    <path>/_data/<uuid>/        immutable snapshot parquet dirs
    <path>/_log/00000001.json   one manifest per committed version

A commit is (1) write the snapshot dir, (2) write the manifest to a
temp name, (3) ``os.rename`` it into the log — the rename is the single
atomic commit point, so a crash anywhere leaves either the old table or
the new one, never a half state (fixes ParquetTable._swap's
two-rename orphan window). A data dir without a manifest is invisible
garbage that ``vacuum`` sweeps.

Restore (rollback) is a NEW version whose manifest points at the old
snapshot dir — history is append-only, exactly Delta's RESTORE.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class VersionedParquetTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_dir = os.path.join(path, "_data")

    # -- log internals -------------------------------------------------------

    def _manifests(self) -> list[dict]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for f in sorted(os.listdir(self.log_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.log_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def _commit_manifest(self, manifest: dict) -> int:
        """Atomically append one manifest; the rename IS the commit."""
        os.makedirs(self.log_dir, exist_ok=True)
        version = manifest["version"]
        final = os.path.join(self.log_dir, f"{version:08d}.json")
        fd, tmp = tempfile.mkstemp(dir=self.log_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, final)
        return version

    # -- public surface ------------------------------------------------------

    def current_version(self) -> int | None:
        m = self._manifests()
        return m[-1]["version"] if m else None

    def history(self) -> list[dict]:
        """Commit history, oldest first: version / op / n_rows / dir."""
        return self._manifests()

    def commit(self, df: DataFrame, op: str = "overwrite") -> int:
        """Write ``df`` as the next version's full snapshot. Returns the
        new version number."""
        snap = os.path.join(self.data_dir, uuid.uuid4().hex)
        os.makedirs(self.data_dir, exist_ok=True)
        df.write.mode("overwrite").parquet(snap)
        n_rows = self.spark.read.parquet(snap).count()  # footer-count, no recompute
        version = (self.current_version() or 0) + 1
        self._commit_manifest(
            {"version": version, "op": op, "dir": os.path.basename(snap), "n_rows": n_rows}
        )
        return version

    def append_commit(self, df: DataFrame) -> int:
        """K1 as a version: new snapshot = current ∪ batch (copy-on-
        write; at real scale Delta logs add-files instead — the verb
        surface is what's mirrored here)."""
        if self.current_version() is None:
            return self.commit(df, op="append")
        return self.commit(self.read().unionByName(df), op="append")

    def read(self, version: int | None = None) -> DataFrame:
        """Read the table as of ``version`` (default: latest)."""
        manifests = self._manifests()
        if not manifests:
            raise FileNotFoundError(f"no committed versions in {self.path}")
        if version is None:
            m = manifests[-1]
        else:
            by_v = {mm["version"]: mm for mm in manifests}
            if version not in by_v:
                raise KeyError(
                    f"version {version} not in log (have {sorted(by_v)})"
                )
            m = by_v[version]
        return self.spark.read.parquet(os.path.join(self.data_dir, m["dir"]))

    def restore(self, version: int) -> int:
        """Delta-style RESTORE: commit a NEW version whose snapshot is
        the old version's dir (no data copied, history preserved)."""
        by_v = {m["version"]: m for m in self._manifests()}
        if version not in by_v:
            raise KeyError(f"version {version} not in log (have {sorted(by_v)})")
        new_version = (self.current_version() or 0) + 1
        src = by_v[version]
        self._commit_manifest(
            {
                "version": new_version,
                "op": f"restore({version})",
                "dir": src["dir"],
                "n_rows": src["n_rows"],
            }
        )
        return new_version

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop snapshot dirs not referenced by the last ``keep_last``
        versions (plus uncommitted orphans from crashed writers).
        Time travel beyond the kept window stops working — same
        contract as Delta VACUUM. Returns the removed dir names."""
        manifests = self._manifests()
        keep = {m["dir"] for m in manifests[-keep_last:]} if manifests else set()
        removed = []
        if os.path.isdir(self.data_dir):
            for d in sorted(os.listdir(self.data_dir)):
                if d not in keep:
                    shutil.rmtree(os.path.join(self.data_dir, d), ignore_errors=True)
                    removed.append(d)
        # manifests whose data is gone are dropped from the log so
        # read(version=...) fails fast with a clear KeyError
        for m in manifests[:-keep_last] if keep_last else manifests:
            if m["dir"] not in keep:
                p = os.path.join(self.log_dir, f"{m['version']:08d}.json")
                if os.path.exists(p):
                    os.remove(p)
        return removed
