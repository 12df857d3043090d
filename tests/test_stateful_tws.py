"""transformWithStateInPandas operators: first-seen admission and
running totals — cross-batch state via Spark 4's typed-state API."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from fbs_data_pipelines_spark.streaming.stateful import (
    HAS_TWS_DEPS,
    streaming_first_seen,
    streaming_running_total,
)

pytestmark = pytest.mark.skipif(
    not HAS_TWS_DEPS,
    reason="transformWithState needs google.protobuf (absent in sandbox)",
)


def _csv_stream(spark, tmp, schema):
    return spark.readStream.schema(schema).csv(f"{tmp}/in", header=True)


def _drain(df, tmp, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_first_seen_dedups_across_batches(spark):
    tmp = tempfile.mkdtemp(prefix="tws_fs_")
    os.makedirs(f"{tmp}/in")
    with open(f"{tmp}/in/b1.csv", "w") as f:
        f.write("h,doc\nh1,first\nh1,dup-in-batch\nh2,second\n")
    stream = _csv_stream(spark, tmp, "h string, doc string")
    out = streaming_first_seen(stream, "h")
    _drain(out, tmp, "tws_fs1", "append")
    got = {
        r["h"]: r["doc"] for r in spark.sql("SELECT * FROM tws_fs1").collect()
    }
    assert set(got) == {"h1", "h2"}
    assert got["h2"] == "second"

    # batch 2 re-delivers h1 and introduces h3: only h3 is admitted
    with open(f"{tmp}/in/b2.csv", "w") as f:
        f.write("h,doc\nh1,late-redelivery\nh3,third\n")
    stream2 = _csv_stream(spark, tmp, "h string, doc string")
    out2 = streaming_first_seen(stream2, "h")
    _drain(out2, tmp, "tws_fs2", "append")
    rows2 = spark.sql("SELECT * FROM tws_fs2").collect()
    assert {r["h"] for r in rows2} == {"h3"}
    shutil.rmtree(tmp, ignore_errors=True)


def test_running_total_accumulates_across_batches(spark):
    tmp = tempfile.mkdtemp(prefix="tws_rt_")
    os.makedirs(f"{tmp}/in")
    with open(f"{tmp}/in/b1.csv", "w") as f:
        f.write("k,v\na,1.0\na,2.0\nb,10.0\n")
    out = streaming_running_total(
        _csv_stream(spark, tmp, "k string, v double"), "k", "v"
    )
    _drain(out, tmp, "tws_rt1", "update")
    got = {
        r["key"]: (r["n_events"], r["total"])
        for r in spark.sql("SELECT * FROM tws_rt1").collect()
    }
    assert got == {"a": (2, 3.0), "b": (1, 10.0)}

    with open(f"{tmp}/in/b2.csv", "w") as f:
        f.write("k,v\na,4.0\nc,7.0\n")
    out2 = streaming_running_total(
        _csv_stream(spark, tmp, "k string, v double"), "k", "v"
    )
    _drain(out2, tmp, "tws_rt2", "update")
    got2 = {
        r["key"]: (r["n_events"], r["total"])
        for r in spark.sql("SELECT * FROM tws_rt2").collect()
    }
    # state carried over the restart: a resumes at (2, 3.0) → (3, 7.0)
    assert got2["a"] == (3, 7.0)
    assert got2["c"] == (1, 7.0)
    shutil.rmtree(tmp, ignore_errors=True)
