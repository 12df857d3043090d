"""Data Selection via Importance Resampling (DSIR).

Public method: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" (NeurIPS 2023). Select raw-corpus
documents whose hashed n-gram distribution looks like a small
high-quality TARGET corpus:

    1. hash every uni/bi-gram into B buckets;
    2. estimate bucket distributions p (target) and q (raw) with
       add-lambda smoothing;
    3. score each raw doc by its summed log importance ratio
       Σ_grams log(p_b / q_b);
    4. resample k docs by Gumbel-perturbed score — top-k of
       (score + Gumbel(u)) IS an importance-weighted sample without
       replacement (the Gumbel-max trick), and drawing u from the
       portable md5 bucket makes it deterministic and reproducible
       on any engine.

Everything is engine-portable (md5 bucketing, closed-form math), so
a SQL oracle reproduces scores and the selected set exactly.

Scale shape (the whole point of hashed features): both distribution
estimates are map-side-combined aggregations that reduce to B rows
(B ≈ 10^4 — driver/broadcast scale) NO MATTER how large the corpora
are; scoring is one explode + one broadcast join + one doc-keyed
aggregation; selection is a global top-k (TakeOrderedAndProject —
per-partition partial top-k, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.text import tokens, word_shingles
from fbs_data_pipelines_spark.operators.partitioning import ensure_parallelism
from fbs_data_pipelines_spark.operators.sampling import sample_bucket


def _gram_buckets(text_col: str, n_buckets: int, salt: str) -> Column:
    """array<long> of hashed uni+bi-gram bucket ids for a document.

    Uni- AND bi-grams, per the paper's hashed n-gram features. The
    md5 bucket is the same portable hash the sampling family uses, so
    oracles replay it digit-by-digit.
    """
    grams = F.concat(
        F.filter(tokens(text_col), lambda t: t != ""),
        word_shingles(text_col, n=2),
    )
    return F.transform(
        grams, lambda g: sample_bucket(g, salt) % F.lit(n_buckets)
    )


def dsir_bucket_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    n_buckets: int = 512,
    smoothing: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Per-bucket log importance ratio log(p_b) - log(q_b).

    p = target bucket distribution, q = raw bucket distribution, both
    add-``smoothing`` estimates over ``n_buckets`` buckets. Returns
    exactly ``n_buckets`` rows (bucket, log_ratio) — broadcast scale
    regardless of corpus size; each input contributes ONE
    map-side-combined aggregation.
    """

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            ensure_parallelism(df)
            .select(
                F.explode(_gram_buckets(text_col, n_buckets, salt)).alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(out))
        )

    spark = raw.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    tc = counts(target, "tc")
    rc = counts(raw, "rc")
    s = float(smoothing)
    joined = (
        all_buckets.join(tc, "bucket", "left").join(rc, "bucket", "left")
    ).select(
        "bucket",
        F.coalesce("tc", F.lit(0)).alias("tc"),
        F.coalesce("rc", F.lit(0)).alias("rc"),
    )
    # totals as a 1-row aggregate broadcast back — the same scalar
    # pattern the sampling/text family uses (an unpartitioned window
    # would move the B-row frame to one task and warn on every run)
    totals = joined.agg(
        F.sum("tc").alias("__t_tot"), F.sum("rc").alias("__r_tot")
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("tc") + s) / (F.col("__t_tot") + s * n_buckets))
                - F.log(
                    (F.col("rc") + s) / (F.col("__r_tot") + s * n_buckets)
                )
            ).alias("log_ratio"),
        )
    )


def dsir_scores(
    raw: DataFrame,
    ratios: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document importance score Σ_grams log_ratio(bucket(gram)).

    One explode over the raw corpus, a broadcast join against the
    B-row ratio table, and a doc-keyed map-side-combined sum. Docs
    with zero grams score 0.
    """
    exploded = ensure_parallelism(raw).select(
        F.col(id_col),
        F.explode_outer(_gram_buckets(text_col, n_buckets, salt)).alias(
            "bucket"
        ),
    )
    return (
        exploded.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("dsir_score"),
            F.sum(F.when(F.col("bucket").isNotNull(), 1).otherwise(0)).alias(
                "n_grams"
            ),
        )
    )


def dsir_resample(
    scores: DataFrame,
    id_col: str,
    k: int,
    salt: str = "gumbel",
    score_col: str = "dsir_score",
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the k docs with the
    highest score + Gumbel(u) where u comes from the portable md5
    bucket of the doc id — the Gumbel-max trick makes the top-k an
    importance-weighted sample without replacement, deterministically.

    Global top-k compiles to TakeOrderedAndProject (partial top-k per
    partition, k-row merge) — no full sort at any scale.
    """
    u = (sample_bucket(id_col, salt) + F.lit(0.5)) / F.lit(65536.0)
    gumbel = -F.log(-F.log(u))
    return (
        scores.withColumn("gumbel_key", F.col(score_col) + gumbel)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
