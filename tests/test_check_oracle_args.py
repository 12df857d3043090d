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
    # no k=v operand: the flag stays in argv ...
    rest, confs = parse_sweep_confs(["--conf", "not-a-pair"])
    assert rest == ["--conf", "not-a-pair"]
    assert confs == {}
    # ... and main() then REJECTS it as an unknown name (r16 advisor,
    # medium): before this check the leftover tokens joined the name
    # filter, matched no registry key, zero queries ran, and the tool
    # exited 0 with "0 failures" — a vacuous PASS. Pin the nonzero
    # exit, not just the parse.
    from check_oracle import unknown_names

    assert unknown_names({"--conf", "not-a-pair"}, {"ohlc": None}) == [
        "--conf",
        "not-a-pair",
    ]


def test_master_flag_extracted():
    from check_oracle import parse_master

    rest, master = parse_master(
        ["--master", "local-cluster[2,4,2048]", "ohlc"]
    )
    assert rest == ["ohlc"]
    assert master == "local-cluster[2,4,2048]"
    rest, master = parse_master(["ohlc"])
    assert rest == ["ohlc"] and master is None
    # trailing --master with no operand stays in argv → rejected by
    # the unknown-name check instead of silently running local
    rest, master = parse_master(["ohlc", "--master"])
    assert rest == ["ohlc", "--master"] and master is None


def test_sf_dir_flag_extracted():
    from check_oracle import SF_DIR, parse_sf_dir

    rest, sf = parse_sf_dir(["--sf-dir", "/root/testdata/sf0.1", "ohlc"])
    assert rest == ["ohlc"]
    assert sf == "/root/testdata/sf0.1"
    # default is the driver's gate scale
    rest, sf = parse_sf_dir(["ohlc"])
    assert rest == ["ohlc"] and sf == SF_DIR
    # trailing --sf-dir with no operand stays in argv → rejected by
    # the unknown-name check instead of silently running sf0.01
    rest, sf = parse_sf_dir(["ohlc", "--sf-dir"])
    assert rest == ["ohlc", "--sf-dir"] and sf == SF_DIR


def test_sf_dir_nonexistent_path_exits_2():
    """A mistyped --sf-dir path must refuse the run (exit 2) before a
    session spins up — not fall back to sf0.01 and vacuous-PASS the
    data-scale axis."""
    import subprocess

    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracle.py"),
         "--sf-dir", "/root/testdata/no-such-sf", "datediff"],
        capture_output=True, text=True, timeout=120,
        env={**__import__("os").environ, "PYTHONPATH": str(REPO)},
    )
    assert out.returncode == 2, out.stdout + out.stderr
    assert "--sf-dir does not exist" in out.stdout
    assert "0 failures" not in out.stdout


def test_unknown_names_helper():
    from check_oracle import unknown_names

    assert unknown_names(set(), {"a": None}) == []
    assert unknown_names({"a"}, {"a": None}) == []
    assert unknown_names({"a", "typo"}, {"a": None}) == ["typo"]


def test_main_exits_nonzero_on_unknown_name():
    """End-to-end pin of the exit code: a typo'd query name (or a
    malformed --conf's leftover tokens) must exit 2 BEFORE any Spark
    session spins up — not print '0 failures' and exit 0."""
    import subprocess

    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracle.py"),
         "--conf", "not-a-pair"],
        capture_output=True, text=True, timeout=120,
        env={**__import__("os").environ, "PYTHONPATH": str(REPO)},
    )
    assert out.returncode == 2, out.stdout + out.stderr
    assert "unknown query name" in out.stdout
    assert "0 failures" not in out.stdout

    out2 = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracle.py"),
         "no-such-query-xyz"],
        capture_output=True, text=True, timeout=120,
        env={**__import__("os").environ, "PYTHONPATH": str(REPO)},
    )
    assert out2.returncode == 2, out2.stdout + out2.stderr
    assert "no-such-query-xyz" in out2.stdout
