"""key_skew_stats, winsorize, ann_knn_join — hand-computable cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.operators.diagnostics import key_skew_stats
from fbs_data_pipelines_spark.operators.robust import winsorize


def test_key_skew_stats_shares_and_ties(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_stats(df, "k", top_k=3).collect()
    assert [(r["rank"], r["key"], r["cnt"]) for r in out] == [
        (1, "a", 5),
        (2, "b", 3),  # tie with c breaks toward the smaller key
        (3, "c", 3),
    ]
    assert [r["share"] for r in out] == [
        round(5 / 12, 6), 0.25, 0.25,
    ]
    # cum_share uses the FULL total (12), not just the top-k rows
    assert out[-1]["cum_share"] == round(11 / 12, 6)


def test_winsorize_clamps_to_group_bounds(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)] + [("h", 100.0)],
        "g string, v double",
    )
    out = {
        (r["g"], r["v"]): r["v_w"]
        for r in winsorize(df, "v", ["g"], 0.1, 0.9).collect()
    }
    # g: p10 of 1..10 = 1.9, p90 = 9.1 (linear interpolation)
    assert out[("g", 1.0)] == pytest.approx(1.9)
    assert out[("g", 10.0)] == pytest.approx(9.1)
    assert out[("g", 5.0)] == 5.0  # interior untouched
    # single-value group: bounds degenerate to the value
    assert out[("h", 100.0)] == 100.0


def test_winsorize_rejects_bad_bounds(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorize(df, "v", ["g"], 0.9, 0.1)


def test_ann_knn_join_matches_bruteforce_at_full_probe(spark, sf_dir):
    """With few planes + multiprobe the bucketed join's top-1 should
    recover most of brute force; and every reported sim must EQUAL
    the brute-force cosine for that pair (same arithmetic)."""
    from fbs_data_pipelines_spark.operators.similarity import (
        ann_knn_join,
        ann_topk_bruteforce,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sub = e.filter(F.col("vec_id") < 60)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ann_topk_bruteforce(
            sub,
            sub.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=3,
        ).collect()
    }
    knn = {
        (r["vec_id"], r["neighbor_id"]): r["sim"]
        for r in ann_knn_join(sub, sub, k=3, num_planes=4,
                              probe_flips=1).collect()
    }
    # sims agree exactly on common pairs
    for pair, sim in knn.items():
        if pair in bf:
            assert sim == bf[pair]
    # multiprobe at 4 planes recovers a meaningful fraction of true
    # top-3 — the synthetic embeddings are near-random (LSH's worst
    # case; tools/ann_recall.py measures 0.45 recall@10 corpus-wide
    # at this config), so the floor is set to what the data supports
    assert len(set(knn) & set(bf)) / len(bf) >= 0.3


def test_ann_knn_join_no_self_pairs_and_rank_shape(spark, sf_dir):
    from fbs_data_pipelines_spark.operators.similarity import ann_knn_join

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    out = ann_knn_join(e, e, k=2, num_planes=4, probe_flips=0).collect()
    assert all(r["vec_id"] != r["neighbor_id"] for r in out)
    per = {}
    for r in out:
        per.setdefault(r["vec_id"], []).append(r["rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2


def test_auto_planes_scales_with_corpus():
    from fbs_data_pipelines_spark.operators.similarity import _auto_planes

    assert _auto_planes(50, 64) == 1       # tiny corpus: one split
    assert _auto_planes(500, 64) == 3      # 2^3 = 8 buckets of ~64
    assert _auto_planes(64_000, 64) == 10
    assert _auto_planes(5_000_000_000, 64) == 27
    assert _auto_planes(10**18, 64) == 40  # clamped


def test_knn_join_auto_planes_end_to_end(spark, sf_dir):
    from fbs_data_pipelines_spark.operators.similarity import ann_knn_join

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_knn_join(e, e, k=2, num_planes=None,
                       target_bucket_size=64).collect()
    assert all(r["vec_id"] != r["neighbor_id"] for r in out)
    assert max(r["rank"] for r in out) <= 2


def test_pq_train_fraction_deterministic_and_effective(spark, sf_dir):
    """Sampled refinement: same fraction reproduces bit-for-bit,
    and even a half-corpus refinement still beats the unrefined
    seed-rule codebooks on full-corpus distortion."""
    from fbs_data_pipelines_spark.operators.similarity import pq_codebooks

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kw = dict(num_codes=16, num_subspaces=8, dim=64)
    half = pq_codebooks(e, **kw, refine_iters=1, train_fraction=0.5)
    assert half == pq_codebooks(e, **kw, refine_iters=1,
                                train_fraction=0.5)
    seed = pq_codebooks(e, **kw)
    full = pq_codebooks(e, **kw, refine_iters=1)
    assert half != seed and half != full

    vecs = [
        [float(x) for x in r["embedding"]]
        for r in e.select("embedding").collect()
    ]

    def distortion(cb):
        tot = 0.0
        for v in vecs:
            for s in range(8):
                sl = v[s * 8 : (s + 1) * 8]
                tot += min(
                    sum((a - b) ** 2 for a, b in zip(sl, c))
                    for c in cb[s]
                )
        return tot

    assert distortion(half) < distortion(seed)


def test_standardize_embeddings_zscores_and_zero_variance(spark):
    from fbs_data_pipelines_spark.functions.vectors import (
        standardize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [3.0, 5.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["embedding_z"]
        for r in standardize_embeddings(df).collect()
    }
    # dim 0: mean 3, pop std sqrt(8/3); dim 1 constant -> 0
    import math
    sd = math.sqrt(8 / 3)
    assert out[1][0] == pytest.approx(-2 / sd)
    assert out[2][0] == pytest.approx(0.0)
    assert out[3][0] == pytest.approx(2 / sd)
    assert [out[i][1] for i in (1, 2, 3)] == [0.0, 0.0, 0.0]


def test_mad_outliers_flags_and_z(spark):
    from fbs_data_pipelines_spark.operators.robust import mad_outliers

    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14]] + [
        ("g", 1000.0)
    ]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = mad_outliers(df, "x", ["grp"], k=3.5)
    got = {r.x: (r.robust_z, r.is_outlier) for r in out.collect()}
    # median = 12.5, MAD = median(|x-12.5|) = median({2.5,1.5,.5,.5,1.5,987.5}) = 1.5
    assert got[1000.0][1] is True
    assert abs(got[1000.0][0] - 0.6745 * (1000.0 - 12.5) / 1.5) < 1e-9
    assert all(not v[1] for x, v in got.items() if x != 1000.0)


def test_mad_outliers_degenerate_group_flags_nothing(spark):
    from fbs_data_pipelines_spark.operators.robust import mad_outliers

    df = spark.createDataFrame(
        [("g", 5.0)] * 4 + [("g", 9.0)], "grp string, x double"
    )
    # >50% identical -> MAD = 0 -> z null, nothing flagged
    out = mad_outliers(df, "x", ["grp"])
    rows = out.collect()
    assert all(r.robust_z is None for r in rows)
    assert all(r.is_outlier is False for r in rows)


def test_mad_outliers_groups_independent(spark):
    from fbs_data_pipelines_spark.operators.robust import mad_outliers

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [
        ("b", float(v)) for v in [100, 101, 102, 103, 104]
    ]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = mad_outliers(df, "x", ["grp"], k=3.5)
    flagged = {(r.grp, r.x) for r in out.collect() if r.is_outlier}
    assert flagged == {("a", 100.0)}  # 100 is normal in group b


def test_chi2_independence_hand_case(spark):
    from fbs_data_pipelines_spark.operators.diagnostics import (
        chi2_independence,
    )

    # classic 2x2: |10 20| |20 10| -> chi2 = n*(ad-bc)^2/(r1*r2*c1*c2)
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 20 + [("y", "q")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    expected = 60 * (10 * 10 - 20 * 20) ** 2 / (30 * 30 * 30 * 30)
    assert abs(r.chi2 - expected) < 1e-9
    assert r.dof == 1
    assert r.n == 60
    assert abs(r.cramers_v - (expected / 60) ** 0.5) < 1e-12


def test_chi2_independent_columns_near_zero(spark):
    from fbs_data_pipelines_spark.operators.diagnostics import (
        chi2_independence,
    )

    # perfectly proportional table -> chi2 exactly 0
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 20 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert abs(r.chi2) < 1e-9
    assert r.cramers_v < 1e-9


def test_table_profile_per_column_stats(spark):
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (2, None, 30.0)],
        "id long, s string, v double",
    )
    prof = {r.column: r for r in table_profile(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"].n_rows == 3 and prof["id"].n_nulls == 0
    assert prof["id"].n_distinct == 2
    assert prof["id"].min_num == 1.0 and prof["id"].max_num == 2.0
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_str == "a" and prof["s"].max_str == "b"
    assert prof["s"].min_num is None
    assert prof["v"].n_nulls == 1
    assert abs(prof["v"].avg - 20.0) < 1e-12


def test_table_profile_single_job(spark):
    """The profile must be ONE wide aggregation, not a per-column
    fan-out of jobs — the plan has exactly one Aggregate chain."""
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0)], "id long, s string, v double"
    )
    plan = (
        table_profile(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Generate") == 1  # the single inline
    assert "Join" not in plan and "Union" not in plan


def test_table_profile_approx_distinct_mode(spark):
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile,
    )

    df = spark.range(1000).withColumn("s", F.lit("x"))
    prof = {
        r.column: r
        for r in table_profile(df, approx_distinct=True).collect()
    }
    assert abs(prof["id"].n_distinct - 1000) <= 100
    assert prof["s"].n_distinct == 1


def test_table_profile_hll_matches_sketch_and_exact_fallback(spark):
    """Portable-HLL profile: non-float columns carry the SAME
    estimate operators/sketches.approx_distinct computes (register
    parity, not tolerance), float columns fall back to exact
    countDistinct, and the base stats equal the exact profile's."""
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile,
        table_profile_hll,
    )
    from fbs_data_pipelines_spark.operators.sketches import (
        approx_distinct,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 7}", float(i % 13) / 3.0, None if i % 5 == 0 else i % 11)
         for i in range(200)],
        "id long, s string, v double, k long",
    )
    prof = {r.column: r for r in table_profile_hll(df).collect()}
    exact = {r.column: r for r in table_profile(df).collect()}
    assert set(prof) == {"id", "s", "v", "k"}
    # float column: exact fallback, as a double
    assert prof["v"].n_distinct == float(exact["v"].n_distinct)
    # non-float columns: bit-equal to the standalone sketch
    for c in ("id", "s", "k"):
        sk = approx_distinct(
            df.select(F.lit(1).alias("g"), F.col(c)), ["g"], c
        ).collect()[0]["approx_distinct"]
        assert prof[c].n_distinct == sk, c
        # and within the configured HLL error of exact (m=4096)
        assert abs(prof[c].n_distinct - exact[c].n_distinct) <= max(
            3.0, 0.05 * exact[c].n_distinct
        ), c
    # base stats identical to the exact profile
    for c in prof:
        for f in ("n_rows", "n_nulls", "min_num", "max_num", "avg",
                  "min_str", "max_str"):
            assert getattr(prof[c], f) == getattr(exact[c], f), (c, f)


def test_table_profile_hll_no_exact_distinct_expand(spark):
    """The portable mode must not pay the exact-distinct expand for
    non-float columns: the optimized plan has no Expand node when
    all profiled columns are HLL-covered (the expand is exactly what
    this mode exists to avoid)."""
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile_hll,
    )

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    plan = (
        table_profile_hll(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_table_profile_hll_all_float_schema(spark):
    """Edge schema (r11 advisor): every column float/double leaves
    hll_cols empty — the profile must not plan a stack(0) analysis
    error; every n_distinct comes from the exact fallback."""
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile_hll,
    )

    df = spark.createDataFrame(
        [(float(i % 3), float(i % 5) / 2.0) for i in range(20)],
        "a double, b double",
    )
    prof = {r.column: r for r in table_profile_hll(df).collect()}
    assert prof["a"].n_distinct == 3.0
    assert prof["b"].n_distinct == 5.0


def test_table_profile_hll_all_null_column_is_zero(spark):
    """Edge (r11 advisor): a non-float column with zero non-null
    values gets no HLL group row — n_distinct must be 0.0 (matching
    table_profile), not NULL."""
    from fbs_data_pipelines_spark.operators.diagnostics import (
        table_profile,
        table_profile_hll,
    )

    df = spark.createDataFrame(
        [(i, None) for i in range(10)], "id long, s string"
    )
    prof = {r.column: r for r in table_profile_hll(df).collect()}
    exact = {r.column: r for r in table_profile(df).collect()}
    assert prof["s"].n_distinct == 0.0
    assert float(exact["s"].n_distinct) == 0.0
    assert prof["s"].n_nulls == 10


def test_benford_profile_digits_and_shares(spark):
    from fbs_data_pipelines_spark.operators.diagnostics import (
        benford_profile,
    )
    import math

    vals = [1.0, 12.0, 150.0, 0.019, 2.5, 30.0, 3.7, 9000.0, 0.0, None]
    df = spark.createDataFrame(
        [(v,) for v in vals], "x double"
    )
    rows = {r.digit: r for r in benford_profile(df, "x").collect()}
    # zero and null excluded -> 8 values; leading digits:
    # 1,1,1,1,2,3,3,9
    assert sum(r.n for r in rows.values()) == 8
    assert rows[1].n == 4 and rows[2].n == 1 and rows[3].n == 2
    assert rows[9].n == 1
    assert abs(rows[1].obs_p - 0.5) < 1e-12
    assert abs(rows[1].exp_p - math.log10(2.0)) < 1e-12
    assert abs(rows[1].dev - (0.5 - math.log10(2.0))) < 1e-12


def test_benford_subunit_values_use_first_nonzero_digit(spark):
    from fbs_data_pipelines_spark.operators.diagnostics import (
        benford_profile,
    )

    df = spark.createDataFrame(
        [(0.042,), (0.0007,)], "x double"
    )
    rows = {r.digit: r.n for r in benford_profile(df, "x").collect()}
    assert rows == {4: 1, 7: 1}
