"""Driver-contract meta-test: every queries() entry must run at
sf0.001 and return a plausible DataFrame (catches any query broken by
refactors long before the per-round gate), and every oracle must be
registered for a known query."""

import pytest
from pyspark.sql import DataFrame

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entry_mod.queries()


def test_oracles_map_to_queries():
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(QUERIES)
    # every registered query is oracle-checked (the multimodal decode
    # stub is sha256-deterministic, so even it has an exact oracle)
    assert set(QUERIES) - set(oracles) == set()


def test_entry_runs(spark):
    out = entry_mod.entry(spark)
    assert isinstance(out, DataFrame)
    assert out.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_contract(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert isinstance(df, DataFrame)
    cols = df.columns
    assert cols and len(set(cols)) == len(cols)  # named, no duplicates
    df.limit(5).collect()  # executes without error
