"""HyperLogLog: accuracy, mergeability, and state size."""

import pyspark.sql.functions as F
import pytest

from fbs_data_pipelines_spark.operators.sketches import (
    approx_distinct,
    expected_rel_error,
    hll_estimate,
    hll_merge,
    hll_state,
)


def test_estimate_within_error_bounds(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got = {
        r.l_returnflag: r.approx_distinct
        for r in approx_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        # 5 sigma of the theoretical 1.04/sqrt(m) standard error
        assert got[k] == pytest.approx(e, rel=5 * expected_rel_error())


def test_merge_equals_single_pass(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    halves = [li.filter(F.col("l_orderkey") % 2 == i) for i in range(2)]
    s = hll_merge(
        hll_state(halves[0], ["l_returnflag"], "l_partkey"),
        hll_state(halves[1], ["l_returnflag"], "l_partkey"),
        ["l_returnflag"],
    )
    merged = {
        (r.l_returnflag,): r.approx_distinct
        for r in hll_estimate(s, ["l_returnflag"]).collect()
    }
    single = {
        (r.l_returnflag,): r.approx_distinct
        for r in approx_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    assert merged == single  # exactly: registers are max-mergeable


def test_state_is_bounded_and_null_safe(spark):
    df = spark.createDataFrame(
        [(i % 3, str(i)) for i in range(10000)] + [(0, None)],
        "g int, v string",
    )
    st = hll_state(df, ["g"], "v")
    assert st.count() <= 3 * 4096
    est = {r.g: r.approx_distinct for r in hll_estimate(st, ["g"]).collect()}
    for g in (0, 1, 2):
        assert est[g] == pytest.approx(10000 / 3, rel=5 * expected_rel_error())
