"""One-off stage-time breakdown of the ann_topk fixed floor (r10
judge directive #7): 24x vs baseline at sf0.1 / 8.8x at sf1 for a
broadcast + single-corpus-pass plan means ~1.5 s of constant overhead
at sf1 — this script attributes it.

Stages timed independently (noop sink, min of 3):
  scan       — parquet scan + count-style materialization
  norms      — scan + per-row l2_norm fold (64-dim HOF aggregate)
  score_hof  — scan + 5-query cosine via the shipped zip_with +
               aggregate fold (the current dot_product)
  score_unrl — same scores via a dim-UNROLLED 64-term expression sum
               (identical left-to-right arithmetic order, no
               intermediate array allocation, codegen-friendly)
  full_hof   — the shipped ann_topk_bruteforce (window top-k on top)
  full_unrl  — bruteforce with unrolled dot+norms

Usage: PYTHONPATH=/root/repo python tools/ann_floor_profile.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fbs_data_pipelines_spark.caching import release_cache  # noqa: E402
from fbs_data_pipelines_spark.functions.cleaning import round_half_up  # noqa: E402
from fbs_data_pipelines_spark.functions.vectors import (  # noqa: E402
    dot_product,
    l2_norm,
)
from fbs_data_pipelines_spark.session import get_spark  # noqa: E402

DIM = 64


def unrolled_dot(a, b):
    """Σ aᵢ·bᵢ as an explicit 64-term sum — same left-to-right
    accumulation order as the sequential fold (fold: ((0+x0)+x1)+…
    with 0+x0 = x0 exactly in IEEE; unrolled: (x0+x1)+x2+…)."""
    terms = [F.get(a, i) * F.get(b, i) for i in range(DIM)]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def unrolled_norm(a):
    terms = [F.get(a, i) * F.get(a, i) for i in range(DIM)]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return F.sqrt(s)


def _time(df) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    release_cache(df)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    spark = get_spark(app_name="ann-floor-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dbl = F.col("embedding").cast("array<double>")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    out: dict[str, float] = {"sf_dir": sf_dir, "n_rows": e.count()}

    out["scan"] = _time(e.select("vec_id"))
    out["scan_vec"] = _time(e.select("vec_id", "embedding"))
    out["norms_hof"] = _time(e.select("vec_id", l2_norm("embedding").alias("n")))
    out["norms_unrl"] = _time(
        e.select("vec_id", unrolled_norm(dbl).alias("n"))
    )

    def scored(dot_fn, norm_fn):
        q = queries.select(
            F.col("query_id"),
            F.col("embedding").alias("__qvec"),
            norm_fn(F.col("embedding").cast("array<double>")).alias("__qn"),
        )
        joined = e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding"),
            norm_fn(dbl).alias("__cn"),
        ).crossJoin(F.broadcast(q))
        denom = F.col("__cn") * F.col("__qn")
        cos = F.when(denom == 0, F.lit(None)).otherwise(
            dot_fn(
                F.col("embedding").cast("array<double>"),
                F.col("__qvec").cast("array<double>"),
            )
            / denom
        )
        return joined.filter(
            F.col("neighbor_id") != F.col("query_id")
        ).select(
            "query_id",
            "neighbor_id",
            round_half_up(cos, 6).alias("sim"),
        )

    hof_scored = scored(lambda a, b: dot_product(a, b), lambda a: l2_norm(a))
    unrl_scored = scored(unrolled_dot, unrolled_norm)
    out["score_hof"] = _time(hof_scored)
    out["score_unrl"] = _time(unrl_scored)

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )

    def topk(s):
        return (
            s.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "sim", "rank")
        )

    out["full_hof"] = _time(topk(hof_scored))
    out["full_unrl"] = _time(topk(unrl_scored))

    # result parity: the unrolled form must be bit-identical
    a = sorted(map(tuple, topk(hof_scored).collect()))
    b = sorted(map(tuple, topk(unrl_scored).collect()))
    out["identical_results"] = a == b

    print(json.dumps(out))


if __name__ == "__main__":
    main()
