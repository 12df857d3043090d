"""Host-timezone independence (r15).

A TZ=America/Bogota full oracle sweep caught two host-TZ leaks the
UTC-only driver never sees:

1. DuckDB oracle strings built hourly buckets with
   ``to_timestamp(bigint)`` — TIMESTAMPTZ, rendered in the HOST
   timezone, so the ORACLE side shifted −5 h while the Spark side
   (naive timestamps, session TZ pinned UTC in session.py) stayed
   put. Fixed: oracles use ``make_timestamp(µs)`` (naive TIMESTAMP).
2. ``F.lit(naive_datetime)`` converts through ``time.mktime`` — the
   PYTHON PROCESS local timezone — so ``authlog_table``'s run_ts
   (and datetime bounds in ``gapfill``) shifted on the SPARK side.
   Fixed: ``functions.dates.ts_lit`` parses naive datetimes in the
   SESSION timezone and routes aware datetimes through integer
   ``timestamp_micros``.

These tests pin both fixes. The subprocess sweep is the direct
property ("the gate comparison holds on a Bogota host"); the unit
tests isolate each mechanism without restarting the suite JVM.
"""

from __future__ import annotations

import datetime as dt
import os
import re
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ts_lit_is_python_tz_independent(spark):
    """ts_lit(naive) renders the wall clock the caller wrote even when
    the Python process sits in a non-UTC zone; the F.lit(datetime)
    path it replaces demonstrably shifts (that contrast is the bug)."""
    from pyspark.sql import functions as F

    from fbs_data_pipelines_spark.functions.dates import ts_lit

    wall = dt.datetime(2024, 1, 1, 0, 0, 0)
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/Bogota"
    time.tzset()
    try:
        rendered = (
            spark.range(1)
            .select(
                F.date_format(ts_lit(wall), "yyyy-MM-dd HH:mm:ss").alias("good"),
                F.date_format(
                    F.lit(wall).cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
                ).alias("bad"),
            )
            .first()
        )
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()
    assert rendered["good"] == "2024-01-01 00:00:00"
    # The replaced F.lit path converts via time.mktime (Bogota =
    # UTC−5) and historically landed 5 h later under the UTC session
    # render — the exact shift the r15 sweep observed on audit_log.
    # That conversion is PySpark-internal behavior, not ours: if a
    # future PySpark (or Spark Connect) fixes the literal path, the
    # contrast disappears while ts_lit stays correct — note it
    # rather than fail (r15 advisor item 1).
    if rendered["bad"] == rendered["good"]:
        pytest.skip(
            "this PySpark's F.lit(naive datetime) no longer converts "
            "through the process TZ — the motivating contrast is "
            "gone; ts_lit's own property above already passed"
        )
    assert rendered["bad"] != rendered["good"]


def test_ts_lit_aware_is_exact_instant(spark):
    from pyspark.sql import functions as F

    from fbs_data_pipelines_spark.functions.dates import ts_lit

    aware = dt.datetime(2024, 1, 1, 5, 30, 0, 250000, tzinfo=dt.timezone.utc)
    rendered = (
        spark.range(1)
        .select(
            F.date_format(ts_lit(aware), "yyyy-MM-dd HH:mm:ss.SSS").alias("v")
        )
        .first()["v"]
    )
    assert rendered == "2024-01-01 05:30:00.250"


def test_oracle_sql_has_no_timestamptz_producers(monkeypatch):
    """DuckDB's ``to_timestamp`` always yields TIMESTAMPTZ, whose
    render is host-TZ-dependent — banned in oracle strings (use
    ``make_timestamp(µs)``, which is naive). Lints the CALL, not the
    substring: SQL comments are stripped first and the match is
    word-bounded, so a comment mentioning to_timestamp (or an
    identifier merely containing it) cannot false-positive (r15
    advisor item 2)."""
    monkeypatch.syspath_prepend(REPO)
    import __spark_entry__ as entry

    comment = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)
    call = re.compile(r"(?<![a-zA-Z0-9_])to_timestamp\s*\(")
    offenders = [
        name for name, sql in entry.oracle_sql().items()
        if call.search(comment.sub(" ", sql))
    ]
    assert offenders == [], offenders


@pytest.mark.skipif(
    not os.environ.get("RUN_TZ_SWEEP"),
    reason="integration: spawns a second Spark JVM + DuckDB (minutes, "
    "load-sensitive). The shifted-TZ oracle property is a STANDING "
    "final_gate leg (tools/final_gate.py step 6 runs the changed "
    "entries — or the canary set when the date engine moved — under "
    "TZ=America/Bogota every round); set RUN_TZ_SWEEP=1 to also run "
    "it inside the unit suite (r15 advisor item 3).",
)
def test_oracle_gate_holds_under_bogota_host_tz():
    """The direct property: the four queries the Bogota sweep flagged
    (plus their shared mechanisms) compare green with the WHOLE stack
    — Python, JVM, DuckDB — in America/Bogota. streaming_ohlc shares
    ohlc's oracle string and bucket arithmetic; it is left out only to
    keep the subprocess short."""
    env = dict(os.environ, TZ="America/Bogota", PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracle.py"),
            "ohlc", "gapfill", "trending", "audit_log",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
