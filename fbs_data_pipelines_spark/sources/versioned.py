"""Versioned table format — the lakehouse-lite cutover target.

The reference's C2 merge (and this engine's ``merge_snapshot`` /
``streaming_snapshot_merge``) rewrites a published parquet directory
in place, which gives SCD-1 but no history, no isolation, and a
delete window during publish. This module supplies the minimal
transactional layer those operators cut over to — the same core ideas
as public lakehouse formats (Delta/Iceberg), reduced to what the
engine needs:

- **immutable version directories**: every commit writes a fresh
  ``data/v{N}`` parquet snapshot; nothing is modified in place;
- **atomic commit**: a version becomes visible only when the 1-file
  ``_latest`` pointer is atomically replaced (Hadoop ``rename`` —
  portable across local/HDFS; object stores swap in their atomic
  pointer primitive). A crash mid-commit leaves the previous version
  live and the half-written directory invisible — readers can never
  observe a partial table;
- **snapshot isolation**: readers resolve the pointer once and then
  read an immutable directory — concurrent commits can't shear a
  scan;
- **time travel**: ``read(version=N)`` reads any retained version;
- **MERGE-shaped upsert**: ``merge()`` runs the engine's C2
  join-merge against the current snapshot and commits the result as
  a new version — exactly the "becomes MERGE INTO with a lakehouse
  format" cutover, with history kept.

At 100 TB the per-version full rewrite is the same cost the in-place
merge already paid (the merge output IS the table); a production
format adds file-level manifests so unchanged files are re-referenced
instead of rewritten — the commit protocol here is unchanged by that
optimization.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from fbs_data_pipelines_spark.operators.audit import merge_snapshot


class VersionedTable:
    """A pointer-committed, versioned parquet table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        jvm = spark._jvm
        self._jvm = jvm
        conf = spark._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create(self.path), conf
        )

    # -- paths ----------------------------------------------------------
    def _p(self, rel: str):
        return self._jvm.org.apache.hadoop.fs.Path(f"{self.path}/{rel}")

    def _data_dir(self, version: int) -> str:
        return f"{self.path}/data/v{version}"

    # -- pointer protocol ----------------------------------------------
    def latest_version(self) -> int | None:
        """Resolve the commit pointer; None for an empty table.

        A missing pointer on a table WITH complete version directories
        means a crash landed inside the pointer-swap window —
        auto-recover to the highest complete snapshot rather than
        silently treating the table as empty (which would let a
        subsequent merge() discard all history from its input)."""
        ptr = self._p("_latest")
        if not self._fs.exists(ptr):
            if self._fs.exists(self._p("data")):
                return self.recover()
            return None
        stream = self._fs.open(ptr)
        try:
            raw = bytes(stream.readAllBytes())
        finally:
            stream.close()
        return int(json.loads(raw.decode("utf-8"))["version"])

    def _commit_pointer(self, version: int) -> None:
        """Atomically publish ``version``: write the new pointer to a
        temp name, then rename over the live pointer (rename replaces
        atomically on a posix FS; on HDFS we delete+rename inside the
        commit window, during which the previous DATA remains intact —
        a crash loses only the pointer file, and ``recover()`` can
        restore it from the highest complete version directory)."""
        tmp = self._p(f"_latest.tmp.{version}")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(json.dumps({"version": version}).encode()))
        finally:
            out.close()
        ptr = self._p("_latest")
        # HDFS rename does not overwrite: clear the old pointer first.
        # The data directories are never touched — worst case is a
        # missing pointer, which recover() rebuilds.
        self._fs.delete(ptr, False)
        if not self._fs.rename(tmp, ptr):
            raise IOError(f"pointer commit failed for version {version}")

    def recover(self) -> int | None:
        """Rebuild a lost pointer (crash inside the commit window) by
        pointing at the highest version directory with a parquet
        ``_SUCCESS`` marker — i.e. the last COMPLETE snapshot."""
        data_root = self._p("data")
        if not self._fs.exists(data_root):
            return None
        best = None
        for st in self._fs.listStatus(data_root):
            name = st.getPath().getName()
            if not name.startswith("v"):
                continue
            v = int(name[1:])
            if self._fs.exists(
                self._jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "_SUCCESS"
                )
            ):
                best = v if best is None else max(best, v)
        if best is not None:
            self._commit_pointer(best)
        return best

    # -- read / write ---------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (time travel with ``version``). Resolves the
        pointer ONCE — the returned DataFrame scans an immutable
        directory, so later commits cannot shear it."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"versioned table {self.path} is empty")
        return self.spark.read.parquet(self._data_dir(v))

    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next version and publish it. The data
        write is distributed and fully materialized (with parquet's
        ``_SUCCESS`` marker) BEFORE the pointer moves."""
        current = self.latest_version()
        v = 1 if current is None else current + 1
        df.write.mode("overwrite").parquet(self._data_dir(v))
        self._commit_pointer(v)
        return v

    def merge(
        self, snapshot: DataFrame, id_col: str, target_cols: Sequence[str]
    ) -> int:
        """MERGE-shaped upsert: play the engine's C2 join-merge against
        the current version, commit the result as a new version. With
        an empty table the snapshot itself becomes v1. History is
        retained — ``read(version=...)`` sees every prior state."""
        current = self.latest_version()
        if current is None:
            return self.commit(snapshot)
        merged = merge_snapshot(
            self.read(current), snapshot, id_col=id_col,
            target_cols=list(target_cols),
        )
        return self.commit(merged)

    def history(self) -> list[int]:
        """Committed versions, oldest first (complete snapshots only)."""
        data_root = self._p("data")
        if not self._fs.exists(data_root):
            return []
        out = []
        for st in self._fs.listStatus(data_root):
            name = st.getPath().getName()
            if name.startswith("v") and self._fs.exists(
                self._jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                out.append(int(name[1:]))
        return sorted(out)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (never the
        live one). Returns the versions removed."""
        live = self.latest_version()
        hist = self.history()
        keep = set(hist[-keep_last:]) if keep_last > 0 else set()
        keep.add(live)
        removable = [v for v in hist if v not in keep]
        for v in removable:
            self._fs.delete(self._p(f"data/v{v}"), True)
        return removable
