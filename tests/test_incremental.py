"""Incremental rollup: delta merges must equal full re-aggregation."""

import pyspark.sql.functions as F

from fbs_data_pipelines_spark.operators.incremental import (
    finalize,
    incremental_rollup,
    merge_state,
    partial_state,
)


def _full(df, keys, m):
    # sums rounded: merge order changes double accumulation at ~1e-13
    # relative error, which is not a correctness difference
    return {
        tuple(r[k] for k in keys): (
            r["n"], round(r["s"], 2), r["lo"], r["hi"]
        )
        for r in df.groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(m).alias("s"),
            F.min(m).alias("lo"),
            F.max(m).alias("hi"),
        )
        .collect()
    }


def _state(df, keys, m):
    return {
        tuple(r[k] for k in keys): (
            r["n_rows"], round(r[f"sum_{m}"], 2), r[f"min_{m}"], r[f"max_{m}"]
        )
        for r in df.collect()
    }


def test_delta_merges_equal_full_aggregate(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys, m = ["o_orderstatus"], "o_totalprice"
    # three arbitrary arrival batches covering the table exactly once
    batches = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    state = None
    for b in batches:
        state = incremental_rollup(state, b, keys, [m])
    assert _state(state, keys, m) == _full(orders, keys, m)


def test_merge_state_is_order_independent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("b", -2.0), ("b", 7.0), ("a", 3.0)],
        "k string, v double",
    )
    keys = ["k"]
    s1 = partial_state(df.filter("v <= 1"), keys, ["v"])
    s2 = partial_state(df.filter("v > 1"), keys, ["v"])
    ab = _state(merge_state(s1, s2, keys), keys, "v")
    ba = _state(merge_state(s2, s1, keys), keys, "v")
    assert ab == ba == _full(df, keys, "v")


def test_finalize_derives_average(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 4.0)], "k string, v double"
    )
    out = finalize(partial_state(df, ["k"], ["v"]), ["v"]).collect()[0]
    assert out["avg_v"] == 3.0 and out["n_rows"] == 2


def test_merge_shuffle_is_groups_sized(spark, sf_dir):
    """The merge plan aggregates two groups-sized inputs — no rescan
    of raw data: exactly one aggregate over the union appears, fed by
    the two state relations."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys, m = ["o_orderstatus"], "o_totalprice"
    s1 = partial_state(orders.filter("o_orderkey % 2 = 0"), keys, [m])
    s1 = spark.createDataFrame(s1.collect(), s1.schema)  # materialized state
    delta = partial_state(orders.filter("o_orderkey % 2 = 1"), keys, [m])
    merged = merge_state(s1, delta, keys)
    merged.collect()
    plan = merged._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # one scan of the parquet (the delta's partial agg) — the prior
    # state side is the materialized local relation, not a rescan
    assert final.count("FileScan parquet") == 1
