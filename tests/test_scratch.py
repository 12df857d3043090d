"""Pins for the entry file's scratch-space lifecycle (r12 advisor):
uuid-keyed dirs/tables must not leak across killed runs (age-based
sweep) and must be FULLY released at cleanup (DROP TABLE, not just
location rmtree)."""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import __spark_entry__ as entry


def test_sweep_removes_stale_keeps_fresh(tmp_path):
    tmp = tempfile.gettempdir()
    stale = os.path.join(tmp, f"fbs_stale_pin_{uuid.uuid4().hex[:8]}")
    fresh = os.path.join(tmp, f"fbs_fresh_pin_{uuid.uuid4().hex[:8]}")
    os.makedirs(stale)
    os.makedirs(fresh)
    try:
        old = time.time() - entry._SCRATCH_STALE_SECONDS - 60
        os.utime(stale, (old, old))
        entry._sweep_stale_scratch()
        assert not os.path.exists(stale), "stale fbs_* dir not swept"
        assert os.path.exists(fresh), (
            "fresh fbs_* dir wrongly swept — a concurrent run's live "
            "scratch would be destroyed"
        )
    finally:
        for d in (stale, fresh):
            if os.path.exists(d):
                os.rmdir(d)


def test_sweep_ignores_foreign_tempdir_entries(tmp_path):
    tmp = tempfile.gettempdir()
    foreign = os.path.join(tmp, f"notfbs_pin_{uuid.uuid4().hex[:8]}")
    os.makedirs(foreign)
    try:
        old = time.time() - entry._SCRATCH_STALE_SECONDS - 60
        os.utime(foreign, (old, old))
        entry._sweep_stale_scratch()
        assert os.path.exists(foreign), (
            "sweep must only touch the fbs_* namespace"
        )
    finally:
        os.rmdir(foreign)


def test_cleanup_drops_registered_tables(spark):
    """_cleanup_scratch must DROP registered catalog tables — a
    location-only rmtree leaves a dangling metastore entry that
    breaks a later CREATE with the same name within the session."""
    saved_dirs = entry._SCRATCH_DIRS[:]
    saved_tables = entry._SCRATCH_TABLES[:]
    entry._SCRATCH_DIRS.clear()
    entry._SCRATCH_TABLES.clear()
    name = f"scratch_pin_{uuid.uuid4().hex[:10]}"
    try:
        spark.sql(f"CREATE TABLE {name} (a INT) USING parquet")
        assert spark.catalog.tableExists(name)
        entry._SCRATCH_TABLES.append(name)
        entry._cleanup_scratch()
        assert not spark.catalog.tableExists(name)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        entry._SCRATCH_DIRS.extend(saved_dirs)
        entry._SCRATCH_TABLES.extend(saved_tables)
