"""Registry-wide dtype-KIND parity audit under pytest — r11 judge
directive #2b.

Three rounds in a row shipped a locally-green window query the driver
hash-failed on a result-TYPE laxity (r9 tz-aware timestamps, r10 list
cells, r11 int-vs-float). The complex-edge lint in `test_contract`
closed the r10 class; this test closes the r11 class: for EVERY
registered oracle, the Spark query's schema and the DuckDB oracle's
Arrow schema must agree up to integer width (the driver's observed
contract — int32/int64 edges hash-matched in r10; int-vs-float/decimal
is exactly the r11 `variant_json` red row).

Because it runs with the suite, the audit runs on whatever tree the
final pytest stamp runs on — it can no longer be skipped by landing a
query after the audit was last invoked (the r11 process bug).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tools.driver_dryrun import kind_refusals
from tools.type_audit import audit_one

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# Width-only diffs the driver has hash-matched (r10 evidence:
# int32 edges gate-green) — explicitly allowed as width-only per the
# r11 judge's directive #2, recorded HERE so any new width diff is a
# deliberate, reviewed addition rather than silent drift.
WIDTH_ONLY_ALLOWED = {"sql_qualify", "udtf_sentences"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_kind_parity(spark, duck, name):
    kind_diffs, width_only = audit_one(
        spark, duck, QUERIES[name], ORACLES[name], SF_DIR
    )
    assert not kind_diffs, (
        f"query '{name}' has driver-fatal type-KIND diffs "
        f"{kind_diffs} (spark, oracle) — the r11 variant_json class; "
        "cast the oracle (or the query) so kinds agree"
    )
    if width_only:
        assert name in WIDTH_ONLY_ALLOWED, (
            f"query '{name}' has new width-only diffs {width_only}; "
            "integer widths are driver-forgiven (r10 evidence) but "
            "must be added to WIDTH_ONLY_ALLOWED deliberately"
        )


# The exact pre-fix r11 oracle (no outer CAST): DuckDB sum(BIGINT)
# returns HUGEINT → decimal(38,0) at the Arrow edge → float64 in
# pandas, while Spark's k_sum is int64.
_PREFIX_VARIANT_JSON = """
    SELECT event_type, count(*) AS n,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS k_sum,
           floor((avg(CAST(json_extract_string(props, '$.k')
                           AS BIGINT))) * 10000.0 + 0.5) / 10000.0
               AS k_avg,
           count(json_extract_string(props, '$.missing'))
               AS n_missing_hits
    FROM events GROUP BY event_type
"""


def test_audit_catches_prefix_variant_json(spark, duck):
    """The audit must FAIL on the r11 pre-fix oracle and PASS on the
    registry's fixed one (judge's done-criterion for directive #2)."""
    kind_diffs, _ = audit_one(
        spark, duck, QUERIES["variant_json"], _PREFIX_VARIANT_JSON,
        SF_DIR,
    )
    assert "k_sum" in kind_diffs
    assert kind_diffs["k_sum"][0] == "int64"
    assert kind_diffs["k_sum"][1].startswith("decimal")
    kind_diffs, width_only = audit_one(
        spark, duck, QUERIES["variant_json"], ORACLES["variant_json"],
        SF_DIR,
    )
    assert not kind_diffs and not width_only


def test_kind_refusals_pandas_contract():
    """The dress-rehearsal check (driver_dryrun.kind_refusals): int
    widths/signedness interchangeable; int↔float / int↔object /
    float↔object refused; datetime-vs-object NOT refused (date cells
    legitimately differ in pandas representation, driver-green)."""
    import numpy as np

    s = pd.DataFrame({
        "a": np.array([1], dtype="int64"),
        "b": np.array([1], dtype="int32"),
        "c": np.array([1.0]),
        "d": pd.to_datetime(["2020-01-01"]),
    })
    o = pd.DataFrame({
        "a": np.array([1.0]),            # int vs float: refused
        "b": np.array([1], dtype="uint32"),  # width/sign: OK
        "c": np.array(["1.0"], dtype=object),  # float vs object: refused
        "d": np.array([object()], dtype=object),  # dt vs object: OK
    })
    bad = kind_refusals(s, o)
    assert any(r.startswith("a:") for r in bad)
    assert any(r.startswith("c:") for r in bad)
    assert not any(r.startswith("b:") for r in bad)
    assert not any(r.startswith("d:") for r in bad)
