"""K-means clustering over embedding columns (Lloyd's algorithm).

The corpus-curation complement to the ANN/IVF operators in
``operators/similarity.py``: where IVF *uses* a centroid table to
restrict search, this module *produces* one — topic bucketing for
mixture balancing, semantic dedup pre-grouping, or the train step of
``ann_ivf_topk`` itself.

Distributed shape (the same one Spark MLlib uses, re-expressed on the
DataFrame API):

- **Centroids are driver state**, bounded by k·dim doubles — the one
  legitimate ``collect()`` in the loop (control plane, not data
  plane). They re-enter the plan as a column LITERAL, so assignment
  is a narrow zero-shuffle map over the points: no join, no explode —
  a ``transform`` over the k-element literal computes all k squared
  distances per row inside codegen.
- **The update step is ONE map-side-combined shuffle per iteration**:
  ``posexplode`` the assigned vectors and aggregate sum/count by
  (cluster, dimension) — k·dim output rows regardless of input size.
  At 100 TB this is the optimal shape: partial aggregation reduces
  each partition to ≤ k·dim cells before anything moves.
- Fixed ``n_iter`` (no convergence probe) keeps the result a pure
  deterministic function of the input — reproducible by an unrolled
  SQL oracle, exactly like ``operators/graph.pagerank``.

Initialization is deterministic: the k points with the smallest ids
become centroids 0..k-1 (rank order). Ties in assignment break to the
lowest cluster index (``array_position`` finds the first minimum).
Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.vectors import lit_array


def _dist2(vec: Column, cent: Column) -> Column:
    """Squared L2 distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_literal(cents: list[list[float]]) -> Column:
    """k×dim driver-side centroids as ONE parsed nested-array literal.
    Classic PySpark's F.lit(list-of-lists) expands element-wise — the
    r17 comment claiming it was a single py4j call was wrong on this
    runtime (r17 advisor item); lit_array emits the array as SQL text
    so one parser call builds it (~140× faster, measured r18).
    Identical values, identical dtype."""
    return lit_array([[float(v) for v in c] for c in cents])


def assign_clusters(
    points: DataFrame,
    vec_col: str,
    cents: list[list[float]],
    out_col: str = "cluster",
    dist_col: str | None = "dist2",
) -> DataFrame:
    """Narrow zero-shuffle assignment: adds ``out_col`` = index of the
    nearest centroid (first minimum wins) and optionally the squared
    distance to it. Centroids enter as a literal — the whole step is
    one codegen'd projection."""
    vec = F.col(vec_col).cast("array<double>")
    dists = F.transform(_centroid_literal(cents), lambda c: _dist2(vec, c))
    best = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    out = points.withColumn(out_col, best)
    if dist_col:
        out = out.withColumn(dist_col, F.array_min(dists))
    return out


def _update_centroids(
    assigned: DataFrame, vec_col: str, cents: list[list[float]]
) -> list[list[float]]:
    """One shuffle: per-(cluster, dimension) mean of the assigned
    vectors; k·dim rows come back to the driver. Empty clusters carry
    the previous centroid."""
    agg = (
        assigned.select(
            "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
        )
        .groupBy("cluster", "pos")
        .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    new = [list(c) for c in cents]
    by_cluster: dict[int, dict[int, float]] = {}
    for row in agg:
        by_cluster.setdefault(row["cluster"], {})[row["pos"]] = (
            row["s"] / row["n"]
        )
    for cid, dims in by_cluster.items():
        for pos, mean in dims.items():
            new[cid][pos] = mean
    return new


def kmeans(
    points: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means. Returns the input's id column
    plus ``cluster`` (int) and ``dist2`` (squared L2 to the final
    centroid). Deterministic end to end: rank-of-id init, first-min
    tie-break, fixed iteration count."""
    init_rows = (
        points.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cents = [list(r["v"]) for r in init_rows]
    base = points.select(id_col, vec_col)
    for _ in range(n_iter):
        assigned = assign_clusters(base, vec_col, cents, dist_col=None)
        cents = _update_centroids(assigned, vec_col, cents)
    return assign_clusters(base, vec_col, cents).select(
        id_col, "cluster", "dist2"
    )
