"""Session builder conventions: pressure-aware broadcast threshold.

r17 verdict item 6: the engine-wide 64 MB autoBroadcastJoinThreshold
(6.4x Spark's stock default) widened exposure to the known
post-executor-loss OOM on memory-tight executors (EVIDENCE_r17 §11).
The threshold now derives from executor memory — broadcasts OFF under
4 GiB — with SPARK_GRAFT_BROADCAST_THRESHOLD as the explicit knob.
Pure driver-side logic; plans change under the lower threshold,
results never (the broadcast-off oracle axis is green).
"""

import pytest

from fbs_data_pipelines_spark.session import (
    _broadcast_threshold,
    _executor_memory_mb,
)


@pytest.mark.parametrize(
    "master,conf,expect_mb",
    [
        ("local[32]", None, None),
        ("local-cluster[2,2,1536]", None, 1536),
        ("local-cluster[ 2 , 4 , 2048 ]", None, 2048),
        ("local[4]", {"spark.executor.memory": "2g"}, 2048),
        ("local[4]", {"spark.executor.memory": "512m"}, 512),
        ("local[4]", {"spark.executor.memory": "8G"}, 8192),
    ],
)
def test_executor_memory_parse(master, conf, expect_mb):
    assert _executor_memory_mb(master, conf) == expect_mb


def test_threshold_is_engine_default_on_big_heaps():
    assert _broadcast_threshold("local[32]", None) == 64 * 1024 * 1024
    assert (
        _broadcast_threshold("local[4]", {"spark.executor.memory": "8g"})
        == 64 * 1024 * 1024
    )


def test_threshold_disables_broadcast_on_tight_executors():
    # r17 isolation matrix: a smaller threshold does NOT clear the
    # post-kill OOM (re-checked at 10MB in r18 — still fails); only
    # broadcasts-off heals. Tight executors get -1.
    assert _broadcast_threshold("local-cluster[2,2,1536]", None) == -1
    assert (
        _broadcast_threshold("local[4]", {"spark.executor.memory": "2g"})
        == -1
    )


def test_threshold_env_knob_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_THRESHOLD", "-1")
    assert _broadcast_threshold("local-cluster[2,2,1536]", None) == -1
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_THRESHOLD", str(32 * 1024**2))
    assert _broadcast_threshold("local[32]", None) == 32 * 1024**2
