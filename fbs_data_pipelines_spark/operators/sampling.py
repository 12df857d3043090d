"""Deterministic sampling for training-data pipelines.

A 100 TB corpus pipeline needs samples that are (a) reproducible
across runs and engines, (b) stable under re-partitioning, and
(c) stratifiable per class. Random-number sampling
(``df.sample``/``TABLESAMPLE``) is none of those — the selected set
depends on partitioning and seed plumbing. The scale-correct tool is
HASH-MOD sampling: a row is kept iff a hash of its key falls under
the fraction threshold. Same key → same decision, on any engine, any
partitioning, any day.

The hash is the engine's portable convention (md5 hex substring —
DuckDB computes it identically), NOT Spark's ``hash()``/``xxhash64``
(engine-specific). ``salt`` decorrelates independent samples over the
same keys (e.g. train/eval splits).

All operators are narrow (zero shuffle): a filter the optimizer can
push against the scan's other predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash buckets for the keep-decision (4 hex digits = 65536 buckets;
#: fraction resolution 1/65536 ≈ 0.0015%)
BUCKETS = 65536


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """The row's deterministic bucket in [0, BUCKETS): first 4 hex
    digits of md5(salt:key), base-16. Portable across engines."""
    key_c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{salt}:"), key_c.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ≈``fraction`` of rows, decided per-key (reproducible,
    partition-independent). Keys are kept or dropped as a unit — the
    right semantics for document/user-level sampling (no partial
    entities in the sample)."""
    return df.filter(sample_bucket(key_col, salt) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash-mod sampling (e.g. downsample boilerplate web
    text hard, keep books): ``fractions`` maps stratum value →
    fraction; strata not listed get ``default_fraction``. The
    threshold is a small when-chain (broadcast-free, codegen'd)."""
    thr: Column = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(thr)
    return df.filter(sample_bucket(key_col, salt) < thr)


def budget_sample(
    df: DataFrame,
    strata_col: str,
    budgets: dict[str, int],
    key_col: str,
    size_col: str,
    salt: str = "",
) -> DataFrame:
    """Token-budget mixture sampling: per stratum (source), keep docs
    in deterministic hash order until the running total of
    ``size_col`` (e.g. token count) reaches the stratum's budget —
    how a training mixture is actually drawn ("200 B tokens of web,
    50 B of books"), vs. the row-fraction semantics of
    ``stratified_sample``. A row is kept iff its INCLUSIVE running
    sum fits the budget; strata without a budget are dropped.

    Determinism: ordered by (hash bucket, key) — total order, engine-
    portable, partition-independent.

    Scale shape (automatic thinning): a training mixture has a
    handful of GIANT strata, so a naive
    ``Window.partitionBy(strata_col)`` cumsum would sort and scan an
    entire source in one task. Instead the cutoff is located first on
    an aggregate: pass 1 computes per-(stratum, hash-bucket) size
    totals — a map-side-combined shuffle whose output is at most
    |strata| x 65536 rows (metadata scale at ANY corpus size) — and a
    window over THAT finds each stratum's boundary bucket b* (the
    first bucket whose preceding buckets already exhaust the budget).
    Rows in buckets past b* can never pass the inclusive-cumsum
    predicate (their running total already exceeds the budget), so
    joining the corpus against the kept-bucket list (broadcast) is
    RESULT-EXACT pre-thinning, not sampling slack: the per-row cumsum
    window then runs over ≈ budget-sized survivors (the kept prefix
    plus at most one partial bucket per stratum), never the full
    stratum. When a stratum's total fits its budget every bucket is
    kept and the operator degrades to the plain one-window plan."""
    thr: Column = F.lit(None).cast("long")
    for value, budget in sorted(budgets.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(int(budget))).otherwise(
            thr
        )
    base = (
        df.withColumn("__budget", thr)
        .filter(F.col("__budget").isNotNull())
        .withColumn("__bkt", sample_bucket(key_col, salt))
    )
    # pass 1: bucket-granular size totals + running total per stratum
    # (tiny table — the window here is over <= 65536 rows per stratum)
    bw = (
        Window.partitionBy(strata_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_buckets = (
        base.groupBy(strata_col, "__budget", "__bkt")
        .agg(F.coalesce(F.sum(size_col), F.lit(0)).alias("__sz"))
        .withColumn("__cum_before", F.sum("__sz").over(bw) - F.col("__sz"))
        # a bucket can contribute kept rows only while the budget is
        # not exceeded BEFORE it (<=, not <: a bucket entered with the
        # budget exactly exhausted can still contribute ZERO-size rows,
        # whose inclusive cumsum equals the budget and passes the
        # naive rule — caught by the hypothesis identity test)
        .filter(F.col("__cum_before") <= F.col("__budget"))
        .select(strata_col, "__bkt")
    )
    # pass 2: the exact inclusive cumsum, over the thinned prefix only
    w = (
        Window.partitionBy(strata_col)
        .orderBy("__bkt", F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(kept_buckets), [strata_col, "__bkt"], "inner")
        .withColumn("__cum", F.sum(F.col(size_col)).over(w))
        .filter(F.col("__cum") <= F.col("__budget"))
        .select(*df.columns)  # the list-on join reorders; restore
    )


def train_eval_split(
    df: DataFrame, key_col: str, eval_fraction: float = 0.01, salt: str = "split"
) -> DataFrame:
    """Deterministic disjoint split: adds ``split`` = 'eval' for the
    hash-mod slice, 'train' otherwise. One pass, no shuffle; the same
    key always lands in the same side (leakage-safe by construction)."""
    return df.withColumn(
        "split",
        F.when(
            sample_bucket(key_col, salt) < int(eval_fraction * BUCKETS),
            F.lit("eval"),
        ).otherwise(F.lit("train")),
    )


def alpha_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_rows: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Temperature-balanced stratum sampling (the multilingual-LM
    recipe: sample language l with probability ∝ count_l^alpha, so
    alpha=1 keeps the natural distribution and alpha→0 flattens it —
    cf. XLM-R / mT5 data balancing).

    Per stratum, the keep-fraction is
        f_l = min(1, target_rows · w_l / (Σw · count_l)),  w_l = count_l^alpha
    and rows are kept by the same deterministic hash-mod rule as
    ``deterministic_sample`` — reproducible on any engine/partitioning.

    Scale shape: the strata histogram is one map-side-combined
    aggregation whose output is stratum-cardinality-sized (a handful
    of languages/sources); fractions derive from it and broadcast-join
    back — the corpus itself never shuffles, the keep decision is a
    pushed-down filter. Σw is taken as the MAX of a running sum
    ordered by stratum value, so both engines associate the additions
    in the same order (bit-identical totals → identical thresholds).
    """
    counts = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count("*").alias("__c")
    )
    w = F.pow(F.col("__c").cast("double"), float(alpha))
    run = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    fracs = (
        counts.withColumn("__w", w)
        .withColumn("__wrun", F.sum("__w").over(run))
        .withColumn("__wsum", F.max("__wrun").over(tot))
        .select(
            "__s",
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.col("__w")
                / (F.col("__wsum") * F.col("__c")),
            ).alias("__f"),
        )
    )
    joined = df.join(
        F.broadcast(fracs), df[strata_col] == F.col("__s"), "inner"
    )
    keep = sample_bucket(key_col, salt) < F.floor(
        F.col("__f") * F.lit(float(BUCKETS))
    )
    return joined.filter(keep).drop("__s", "__f")


def sample_exact_k(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly k rows per stratum (or all of a smaller stratum),
    chosen deterministically: rank by the portable md5 bucket (then
    key) inside each stratum and keep the first k — "give me exactly
    1000 eval docs per language", reproducible on any engine or
    partitioning. Fraction-based sampling can't hit exact counts;
    ranking the hash order can.

    Delegates to the skew-safe two-phase ``grouped_topk`` so a giant
    stratum never lands in a single window task.
    """
    from fbs_data_pipelines_spark.operators.joins import grouped_topk

    return grouped_topk(
        df,
        [strata_col],
        [sample_bucket(key_col, salt).asc(), F.col(key_col).asc()],
        k=k,
        salt_col=key_col,
        rank_col=None,
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme with the hash standing in for the
    random draw. Each row gets priority u^(1/w) — u uniform from the
    portable md5 bucket, w its weight — and the k highest priorities
    ARE a weighted sample without replacement (inclusion probability
    ∝ weight). Quality-weighted corpus selection in one expression,
    reproducible anywhere; non-positive weights are excluded.

    Scale shape: global top-k compiles to TakeOrderedAndProject —
    per-partition partial top-k then a k-row merge on the driver
    side of the exchange; nothing resembling a full sort ships.
    Adds ``priority`` (rounded 9dp at the edge)."""
    u = (sample_bucket(key_col, salt) + F.lit(0.5)) / F.lit(float(BUCKETS))
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > 0)
        .withColumn("priority", pri)
        .orderBy(F.col("priority").desc(), F.col(key_col).asc())
        .limit(k)
    )


def mixture_interleave(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
    pos_col: str = "global_pos",
) -> DataFrame:
    """Deterministic weighted interleaving of sources into ONE global
    training order — the order a mixture dataloader consumes ("3 parts
    web to 1 part books", interleaved, not concatenated). Each stratum
    is ranked in the portable md5-hash order (rank r = 1, 2, ...); a
    row's virtual time is r / weight (classic weighted round-robin /
    stride scheduling); the global order sorts by (virtual_time,
    stratum, key). Over any prefix of the output, stratum proportions
    converge to weight/Σweight. Engine-portable and reproducible —
    ``salt`` is the epoch: a new salt reshuffles within strata while
    preserving the mixture. Strata without a weight are dropped.

    Scale shape: one shuffle for the per-stratum ranking window, then
    ONE range-partitioned sort for the total order (the total order IS
    the deliverable). The global position is assigned WITHOUT a
    single-task global window: rows are range-repartitioned on the
    order key, each partition numbers its rows locally, and partition
    row-counts (≤ shuffle-partitions rows) are cumulated into offsets
    broadcast back — the distributed global-index pattern. Correct for
    ANY partition boundaries because the order tuple
    (virtual_time, stratum, key) is unique per row."""
    w_expr: Column = F.lit(None).cast("double")
    for value, wt in sorted(weights.items()):
        if wt <= 0:
            raise ValueError(f"mixture weight for {value!r} must be > 0")
        w_expr = F.when(
            F.col(strata_col) == value, F.lit(float(wt))
        ).otherwise(w_expr)
    rw = Window.partitionBy(strata_col).orderBy(
        sample_bucket(key_col, salt), F.col(key_col)
    )
    ranked = (
        df.withColumn("__w", w_expr)
        .filter(F.col("__w").isNotNull())
        .withColumn("__vt", F.row_number().over(rw) / F.col("__w"))
    )
    order_cols = [F.col("__vt"), F.col(strata_col), F.col(key_col)]
    part = (
        ranked.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    pw = Window.partitionBy("__pid").orderBy(*order_cols)
    # exclusive prefix-sum of partition sizes → per-partition offset
    # (the counts table has at most shuffle-partitions rows)
    ow = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        part.groupBy("__pid").count()
        .withColumn("__off", F.sum("count").over(ow) - F.col("count"))
        .select("__pid", "__off")
    )
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            pos_col, (F.col("__off") + F.row_number().over(pw)).cast("long")
        )
        .drop("__w", "__vt", "__pid", "__off")
    )


def leakage_safe_split(
    df: DataFrame,
    key_col: str,
    clusters: DataFrame,
    cluster_key: str = "id",
    cluster_label: str = "cluster_id",
    eval_fraction: float = 0.01,
    salt: str = "split",
) -> DataFrame:
    """Near-dup-aware train/eval split: every row inherits its
    CLUSTER REPRESENTATIVE's hash bucket, so a near-duplicate of an
    eval document can never land in train — the contamination leak
    ``train_eval_split`` alone cannot stop (its per-key hash puts two
    near-copies on independent sides).

    ``clusters`` is the (cluster_key, cluster_label) output of
    ``dedup.dup_clusters`` over a near-dup pair list; rows absent
    from it are singletons and represent themselves. Adds ``rep``
    (the representative id the hash is taken over) and ``split``.

    Scale shape: one equi-join against the cluster table — which
    holds ONLY docs that have a near-dup (a small fraction of any
    deduplicated corpus ⇒ usually broadcast) — then the zero-shuffle
    hash-mod rule on the representative.
    """
    cl = clusters.select(
        F.col(cluster_key).alias("__ck"),
        F.col(cluster_label).alias("__rep"),
    )
    return (
        df.join(cl, df[key_col] == F.col("__ck"), "left")
        .withColumn("rep", F.coalesce(F.col("__rep"), F.col(key_col)))
        .drop("__ck", "__rep")
        .withColumn(
            "split",
            F.when(
                sample_bucket("rep", salt) < int(eval_fraction * BUCKETS),
                F.lit("eval"),
            ).otherwise(F.lit("train")),
        )
    )
