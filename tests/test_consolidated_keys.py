"""Equivalence pins for the r13 gate-key consolidations (SURVEY §8
rule 4, r12 judge directive #2): a key removed from the driver
registry must be PROVABLY subsumed by the key that absorbs it —
these tests are that proof, run at every local gate.

- `session_window` → `sessionize`: Spark's native
  F.session_window(gap) and the manual lag/cumsum sessionizer are
  the same gap-merged sessionization semantics; the surviving gated
  key's oracle therefore covers both formulations.
- `tws_first_seen` → `first_seen`: the transformWithStateInPandas
  streaming admission and the batch replay admit the same
  first-event-per-key set; the runtime itself keeps its own suite
  (tests/test_stateful_tws.py), this pins the SURFACE equivalence
  the consolidation relies on.
"""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_session_window_subsumed_by_sessionize(spark):
    """q_session_window ≡ project(q_sessionize): identical
    (user_id, session_start, n_events) triples — so one gate key
    covers the native-F.session_window formulation too."""
    native = entry.q_session_window(spark, SF)
    manual = entry.q_sessionize(spark, SF).select(
        "user_id", "session_start", "n_events"
    )
    cols = ["user_id", "session_start", "n_events"]
    got_native = _rows(native, cols)
    got_manual = _rows(manual, cols)
    assert got_native == got_manual
    assert len(got_native) > 0


def test_tws_first_seen_subsumed_by_first_seen(spark):
    """The REAL transformWithStateInPandas admission (two availableNow
    runs over one checkpoint, RocksDB ValueState) admits exactly the
    batch twin's set — so `first_seen`'s oracle covers the streaming
    surface the consolidated key used to gate."""
    streaming = entry.q_tws_first_seen(spark, SF)
    batch = entry.q_first_seen(spark, SF)
    cols = ["user_id", "event_id", "event_type"]
    got_streaming = _rows(streaming, cols)
    got_batch = _rows(batch.select(*cols), cols)
    assert got_streaming == got_batch
    assert len(got_streaming) > 0
