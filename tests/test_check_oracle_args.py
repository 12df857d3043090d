"""Pin the check_oracle ``--conf`` sweep-flag parsing.

The runtime-axis sweeps (r16: Arrow batch size, shuffle partition
count, AQE off, broadcast disabled, tiny file splits) rely on
``tools/check_oracle.py --conf k=v`` reaching the session builder
verbatim. A silently-dropped or mis-split pair would turn a shifted
sweep into a plain UTC/default re-run that "passes" without testing
the axis — pin the parse so that failure mode is loud.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from check_oracle import parse_sweep_confs  # noqa: E402


def test_plain_args_pass_through():
    rest, confs = parse_sweep_confs(["ohlc", "gapfill"])
    assert rest == ["ohlc", "gapfill"]
    assert confs == {}


def test_repeatable_conf_pairs_extracted():
    rest, confs = parse_sweep_confs(
        [
            "--conf",
            "spark.sql.shuffle.partitions=1",
            "ohlc",
            "--conf",
            "spark.sql.execution.arrow.maxRecordsPerBatch=7",
        ]
    )
    assert rest == ["ohlc"]
    assert confs == {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
    }


def test_value_with_equals_splits_on_first():
    _, confs = parse_sweep_confs(["--conf", "k=a=b"])
    assert confs == {"k": "a=b"}


def test_vanilla_flag_survives():
    rest, confs = parse_sweep_confs(
        ["--vanilla", "--conf", "spark.sql.ansi.enabled=true"]
    )
    assert rest == ["--vanilla"]
    assert confs == {"spark.sql.ansi.enabled": "true"}


def test_malformed_conf_left_loud():
    # no k=v operand: the flag stays in argv and later fails as an
    # unknown query name instead of being silently swallowed
    rest, confs = parse_sweep_confs(["--conf", "not-a-pair"])
    assert rest == ["--conf", "not-a-pair"]
    assert confs == {}
