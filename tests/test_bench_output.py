"""Pin the bench JSON's tail-truncation hardening (r16 judge
directive #4) and the unconditional loadavg keys (r16 advisor #3).

The driver records bench output through a fixed-size TAIL capture:
whatever prints FIRST is what a long JSON loses. BENCH_r16.json lost
its per-query sf0.1 ``queries`` dict and ``sequential_total`` when
new instrumentation fields pushed them out of the window. The fix is
ordering — highest-value fields LAST — plus compact separators; these
tests pin both so a future field addition can't silently reintroduce
the loss.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _fake_out():
    return {
        "metric": "headline_suite_wall_clock_concurrent",
        "value": 1.0,
        "unit": "sec",
        "queries": {"q1": 0.5},
        "sequential_total": 3.2,
        "sf": 0.1,
        "protocol": "x" * 200,
        "loadavg_1_5_15_start": [0.0, 0.1, 0.2],
        "loadavg_1_5_15_end": [0.0, 0.1, 0.2],
        "loadavg_1_5_15_sf1_baseline": None,
        "ratio_vs_baseline": 1.2,
        "ratio_definition": "y" * 200,
        "baseline_queries": {"q1": 0.4},
        "paired_ratios": [1.1, 1.2],
        "errors": {},
    }


def test_high_value_fields_print_last():
    ordered = list(bench._tail_safe_order(_fake_out()))
    # the driver contract scalars are dead last
    assert ordered[-4:] == ["metric", "value", "unit", "sf"]
    # every protected field sorts after every unprotected one
    protected = [k for k in ordered if k in bench._TAIL_LAST]
    unprotected = [k for k in ordered if k not in bench._TAIL_LAST]
    assert ordered == unprotected + protected
    # the r16 loss class: per-query sf0.1 + sequential_total + the
    # official ratio all sit in the protected tail
    for k in ("queries", "sequential_total", "ratio_vs_baseline"):
        assert k in protected
    # prose fields are expendable — they must print first
    assert "protocol" in unprotected and "ratio_definition" in unprotected


def test_tail_order_preserves_content_and_roundtrips():
    out = _fake_out()
    ordered = bench._tail_safe_order(out)
    assert ordered == out  # same mapping, different order
    line = json.dumps(ordered, separators=(",", ":"))
    assert " " not in line.split('"protocol"')[0]  # compact separators
    assert json.loads(line) == out


def test_tail_order_is_lossless_for_unknown_fields():
    out = _fake_out()
    out["some_future_field"] = 1
    ordered = bench._tail_safe_order(out)
    keys = list(ordered)
    # unknown fields print FIRST (expendable by default), never after
    # the protected tail
    assert keys.index("some_future_field") < keys.index("queries")
    assert ordered == out


def test_truncated_tail_still_carries_the_headline_numbers():
    """Simulate the driver's tail capture: keep only the last N bytes
    of the printed line — the headline numbers must still be there."""
    line = json.dumps(bench._tail_safe_order(_fake_out()), separators=(",", ":"))
    tail = line[-200:]
    for needle in ('"queries"', '"sequential_total"', '"ratio_vs_baseline"',
                   '"metric"', '"sf"'):
        assert needle in tail, f"{needle} lost to a 200-byte tail capture"


def test_loadavg_keys_always_present():
    """r16 advisor #3: all three loadavg keys exist even when no sf1
    pass runs (sf1_baseline is None rather than absent)."""
    src = (REPO / "bench.py").read_text()
    # the base dict initializes the sf1 key unconditionally
    assert '"loadavg_1_5_15_sf1_baseline": None' in src
    # and the sf1 branch overwrites it with a real reading
    assert 'out["loadavg_1_5_15_sf1_baseline"] = _loadavg()' in src


def test_effective_parallelism_echo(monkeypatch=None):
    """r17 verdict item 2: the driver's `suspect_cpus_ignored` flag
    fired because nothing in the bench JSON proved the
    $SPARK_GRAFT_CPUS contract was honored. The session's actual
    master / defaultParallelism / shuffle partitions must be echoed,
    and protected by the tail-capture ordering (early in the tail so
    they can never displace the headline scalars at the very end)."""
    src = (REPO / "bench.py").read_text()
    assert '"master": spark.sparkContext.master' in src
    assert '"default_parallelism": spark.sparkContext.defaultParallelism' in src
    assert '"shuffle_partitions"' in src
    for k in ("master", "default_parallelism", "shuffle_partitions"):
        assert k in bench._TAIL_LAST
        assert bench._TAIL_LAST.index(k) < bench._TAIL_LAST.index("queries")
