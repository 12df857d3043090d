"""K-means, bigram-LM perplexity, token-budget sampling, token entropy."""

import math

import pytest

from fbs_data_pipelines_spark.functions.text import token_entropy
from fbs_data_pipelines_spark.operators.clustering import (
    assign_clusters,
    kmeans,
)
from fbs_data_pipelines_spark.operators.lm import (
    bigram_lm_train,
    lm_perplexity,
    vocabulary_size,
)
from fbs_data_pipelines_spark.operators.sampling import budget_sample


# ---------------------------------------------------------------- k-means
def _points(spark):
    # two tight blobs on a line, ids ordered so init picks one point
    # from each blob (ids 0 and 1)
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, -0.1]),
        (3, [10.2, 9.9]),
        (4, [-0.2, 0.1]),
        (5, [9.8, 10.1]),
    ]
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_kmeans_separates_blobs(spark):
    got = {
        r.id: r.cluster
        for r in kmeans(_points(spark), "id", "vec", k=2, n_iter=3).collect()
    }
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_kmeans_dist2_is_squared_l2_to_final_centroid(spark):
    out = {
        r.id: r.dist2
        for r in kmeans(_points(spark), "id", "vec", k=2, n_iter=2).collect()
    }
    # blob-0 centroid converges to the blob mean
    cx, cy = (0.0 + 0.1 - 0.2) / 3, (0.0 - 0.1 + 0.1) / 3
    want = (0.0 - cx) ** 2 + (0.0 - cy) ** 2
    assert out[0] == pytest.approx(want, abs=1e-12)


def test_kmeans_deterministic(spark):
    a = sorted(
        kmeans(_points(spark), "id", "vec", k=2, n_iter=3).collect()
    )
    b = sorted(
        kmeans(_points(spark), "id", "vec", k=2, n_iter=3).collect()
    )
    assert a == b


def test_assign_clusters_tie_breaks_to_lowest_index(spark):
    df = spark.createDataFrame([(1, [5.0])], "id long, vec array<double>")
    # equidistant centroids: first minimum (index 0) must win
    out = assign_clusters(df, "vec", [[4.0], [6.0]]).collect()[0]
    assert out.cluster == 0
    assert out.dist2 == pytest.approx(1.0)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=2 but both init points sit in one blob: after the first
    # update every point assigns to one cluster; the other must keep
    # a centroid (no crash, no NaN) and the result stays total
    rows = [(0, [0.0]), (1, [0.1]), (2, [0.05])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    out = kmeans(df, "id", "vec", k=2, n_iter=2).collect()
    assert len(out) == 3
    assert all(not math.isnan(r.dist2) for r in out)


# ------------------------------------------------------------- bigram LM
def _docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "dog"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_counts_exact(spark):
    m = bigram_lm_train(_docs(spark), "text")
    got = {(r.w1, r.w2): (r.c2, r.c1) for r in m.collect()}
    # "the cat" occurs twice; context "the" occurs 3 times as w1
    assert got[("the", "cat")] == (2, 3)
    assert got[("the", "mat")] == (1, 3)
    assert got[("cat", "sat")] == (2, 2)
    assert not any(k[0] == "dog" for k in got)  # 1-token doc: no bigrams


def test_vocabulary_size(spark):
    assert vocabulary_size(_docs(spark), "text") == 6


def test_lm_perplexity_scores(spark):
    docs = _docs(spark)
    model = bigram_lm_train(docs, "text")
    v = vocabulary_size(docs, "text")
    out = {
        r.doc_id: r
        for r in lm_perplexity(
            docs, "doc_id", "text", model, v, alpha=0.5
        ).collect()
    }
    # hand-computed: doc 1 = bigrams (the,cat) c2=2 c1=3, (cat,sat)
    # c2=2 c1=2; p = (2.5/6), (2.5/5)
    want = -(math.log(2.5 / 6.0) + math.log(2.5 / 5.0)) / 2.0
    assert out[1].log_ppl == pytest.approx(want, rel=1e-12)
    assert out[1].n_bigrams == 2
    # no-bigram docs survive with null score
    assert out[2].n_bigrams == 0 and out[2].log_ppl is None
    assert out[3].n_bigrams == 0 and out[3].log_ppl is None
    # fluent (in-distribution) text scores lower than unseen text
    probe = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "zebra quark flux")],
        "doc_id long, text string",
    )
    scored = {
        r.doc_id: r.log_ppl
        for r in lm_perplexity(
            probe, "doc_id", "text", model, v, alpha=0.5
        ).collect()
    }
    assert scored[10] < scored[11]


def test_lm_unseen_pair_uses_seen_context_mass(spark):
    docs = _docs(spark)
    model = bigram_lm_train(docs, "text")
    v = vocabulary_size(docs, "text")
    probe = spark.createDataFrame(
        [(20, "the zzz")], "doc_id long, text string"
    )
    out = lm_perplexity(
        probe, "doc_id", "text", model, v, alpha=0.5
    ).collect()[0]
    # denominator must be c1("the")=3 + a·V, not 0 + a·V
    want = -math.log(0.5 / (3 + 0.5 * v))
    assert out.log_ppl == pytest.approx(want, rel=1e-12)


# ----------------------------------------------------- budget sampling
def test_budget_sample_inclusive_cutoff_and_strata(spark):
    rows = [(i, "a" if i < 6 else "b", 10) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    out = budget_sample(
        df, "src", {"a": 35}, key_col="doc_id", size_col="n"
    ).collect()
    # budget 35 at 10 tokens/doc → exactly 3 docs (30 ≤ 35 < 40);
    # stratum b has no budget → dropped entirely
    assert len(out) == 3
    assert all(r.src == "a" for r in out)
    # deterministic: same selection every run
    again = budget_sample(
        df, "src", {"a": 35}, key_col="doc_id", size_col="n"
    ).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_budget_sample_orders_by_hash_not_key(spark):
    rows = [(i, "a", 100) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    picked = sorted(
        r.doc_id
        for r in budget_sample(
            df, "src", {"a": 500}, key_col="doc_id", size_col="n"
        ).collect()
    )
    assert len(picked) == 5
    # md5 order is not id order: the 5 lowest ids would be [0..4]
    assert picked != [0, 1, 2, 3, 4]


def test_budget_sample_matches_naive_one_window_plan(spark):
    # result-identity: the bucket-cutoff pre-thinning must select the
    # EXACT rows the plain full-stratum cumsum selects, on skewed
    # strata (one giant, one tiny, one unbudgeted) and budgets that
    # land mid-bucket
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fbs_data_pipelines_spark.operators.sampling import sample_bucket

    rows = [(i, "big" if i < 400 else ("small" if i < 410 else "x"), 1 + i % 7)
            for i in range(420)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    budgets = {"big": 93, "small": 10_000}

    thr = F.when(F.col("src") == "big", 93).when(
        F.col("src") == "small", 10_000
    )
    w = (
        Window.partitionBy("src")
        .orderBy(sample_bucket("doc_id"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        df.withColumn("__b", thr)
        .filter(F.col("__b").isNotNull())
        .withColumn("__c", F.sum("n").over(w))
        .filter(F.col("__c") <= F.col("__b"))
    )
    expect = sorted((r.doc_id, r.src, r.n) for r in naive.collect())
    got = sorted(
        (r.doc_id, r.src, r.n)
        for r in budget_sample(
            df, "src", budgets, key_col="doc_id", size_col="n"
        ).collect()
    )
    assert got == expect
    assert len(got) > 0
    # column order preserved
    out = budget_sample(df, "src", budgets, key_col="doc_id", size_col="n")
    assert out.columns == df.columns


def test_budget_sample_window_input_is_bucket_thinned(spark):
    # scale proof: the per-row cumsum window must consume the corpus
    # AFTER the kept-bucket join (bounded ≈ budget-sized input), never
    # the raw full stratum — i.e. a Join sits below the outer Window
    # in the optimized plan
    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(50)], "doc_id long, src string, n long"
    )
    out = budget_sample(df, "src", {"a": 100}, key_col="doc_id", size_col="n")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    first_window = plan.index("Window")
    assert "Join" in plan[first_window:], plan


# ------------------------------------------------------- token entropy
def test_token_entropy_values(spark):
    rows = [
        (0, "spam spam spam spam"),  # degenerate → 0 bits
        (1, "a b a b"),  # uniform over 2 tokens → 1 bit
        (2, "x y z w"),  # uniform over 4 tokens → 2 bits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert out[0].entropy == pytest.approx(0.0, abs=1e-12)
    assert out[0].n_tokens == 4
    assert out[1].entropy == pytest.approx(1.0, abs=1e-12)
    assert out[2].entropy == pytest.approx(2.0, abs=1e-12)
