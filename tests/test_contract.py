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
    # r10 judge directive #2 (registry-wide schema lint): the driver's
    # pandas canonicalizer factorizes object cells through a hashtable
    # — a top-level array/struct/map result column dies with
    # "unhashable type" at GATE time while local tuple-izing harnesses
    # said OK (r10: standardize_embeddings). Complex types must be
    # serialized at the query edge (array_join / to_json / posexplode)
    # — this closes the CLASS, not the instance.
    from tools.check_oracle import complex_edge_cols

    bad = complex_edge_cols(dict(df.dtypes))
    assert not bad, (
        f"query '{name}' emits driver-unsortable complex-typed edge "
        f"columns {bad}; serialize at the edge (see q_array_agg / "
        "q_standardize_embeddings)"
    )
    df.limit(5).collect()  # executes without error


def test_complex_edge_lint_catches_arrays(spark):
    """The lint itself must flag exactly the r10 failure shape — a
    raw array<double> (and struct/map) top-level column — and pass
    serialized edges."""
    from tools.check_oracle import complex_edge_cols

    df = spark.sql(
        "SELECT array(1.0, 2.0) AS v, named_struct('a', 1) AS s, "
        "map('k', 1) AS m, array_join(array('1','2'), ',') AS ok, "
        "CAST(1.5 AS DOUBLE) AS d"
    )
    bad = complex_edge_cols(dict(df.dtypes))
    assert sorted(b.split(":")[0] for b in bad) == ["m", "s", "v"]
