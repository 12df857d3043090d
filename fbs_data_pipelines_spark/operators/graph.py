"""Iterative graph algorithms as DataFrame loops (PageRank).

Complements the label-propagation connected components in
``operators/dedup.py``: the same driver-side loop / distributed-data
pattern (the driver only orchestrates; every iteration is a join +
aggregate over DataFrames, and ``localCheckpoint`` caps lineage
growth so plan compilation stays O(1) per round).

PageRank here is the classic fixed-iteration formulation from the
original paper (Page et al., 1999), the standard first benchmark for
iterative dataflow engines:

    rank_{t+1}(v) = (1 - d) + d * Σ_{(u,v) ∈ E} rank_t(u) / outdeg(u)

Fixed ``n_iter`` (no convergence probe) keeps the result a pure
deterministic function of the edge set — exactly reproducible by an
unrolled SQL oracle. Dangling nodes (no out-edges) contribute no mass,
matching the plain formulation.

Scale shape per iteration: one equi-join of the edge table with the
nodes-sized rank table on ``src`` (shuffle sized by |E| + |V|, AQE
skew-split applies to hub nodes) and one map-side-combined groupBy on
``dst``. The edge/out-degree base is computed once and persisted. On a
real cluster, pre-bucketing edges by ``src`` makes the per-iteration
join exchange-free on the edge side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (id, rank). Node set = every id appearing as ``src`` or
    ``dst``; duplicate edges collapse (a link counts once, as in the
    original formulation). Ranks initialize to 1.0.
    """
    # persist the deduped edge list for the duration of the eager
    # preamble: outdeg, base and nodes all consume it, and without the
    # persist each materialization re-runs the caller's upstream plan
    # (for the bench graph: a fact-table join + a 1M-row distinct,
    # executed 4×). Released before the iteration loop starts.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) — the loop-invariant join base, materialized
    # once so each iteration starts from a checkpointed snapshot
    base = e.join(outdeg, "src").localCheckpoint()
    # every edge row survives the inner join above (each src has an
    # out-degree), so the node set can be read off the checkpointed
    # base instead of recomputing the edge plan twice more
    nodes = (
        base.select(F.col("src").alias("id"))
        .unionByName(base.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e.unpersist()
    # The rank table is node-sized but enters each iteration as a
    # checkpoint RDD scan with NO size statistics, so the planner
    # sort-merge-joins it — re-shuffling the edge-sized base every
    # iteration even though base never changes. When the node count
    # (known once, from the materialized checkpoint) fits the
    # session's broadcast threshold, hint the broadcast explicitly:
    # the base side then never exchanges at all, and each iteration
    # is one broadcast build (node-sized) + one map-side-combined
    # aggregation. Billion-node graphs keep the shuffled join.
    raw = edges.sparkSession.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "10485760"
    )
    try:
        threshold = int(raw.lower().removesuffix("b"))
    except ValueError:
        # suffixed form ("10m", "1g") — rare outside hand-set sessions;
        # fall back to Spark's default rather than guess the unit
        threshold = 10 * 1024 * 1024
    # ~32 bytes per (id, rank) row in the built hash relation
    bcast_ranks = threshold > 0 and nodes.count() * 32 <= threshold
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        r = F.broadcast(ranks) if bcast_ranks else ranks
        contribs = (
            base.join(r, base.src == r.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contribs) if bcast_ranks else contribs,
                "id",
                "left",
            )
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle counting via degree orientation (the standard
    MapReduce formulation: Suri & Vassilvitskii 2011, "Counting
    triangles and the curse of the last reducer").

    The naive 3-way self-join enumerates every wedge at a hub node —
    O(deg²) rows for celebrity vertices, the classic last-reducer
    straggler. Orienting each edge from the (degree, id)-smaller
    endpoint to the larger one turns the graph into a DAG where every
    triangle {u,v,w} (ordered u ≺ v ≺ w) is counted exactly once as
    the wedge (u→v, u→w) closed by the oriented edge (v→w), and the
    per-node out-degree is bounded by O(sqrt(|E|)) — wedge generation
    is O(|E|^1.5) total regardless of skew.

    Input: undirected edge list (any orientation, duplicates and
    self-loops tolerated — canonicalized internally). Returns one row
    (n_nodes, n_edges, n_triangles).

    Scale shape: canonicalize (1 shuffle on the edge pair), degree
    (map-side-combined groupBy), two broadcast-or-shuffle equi-joins
    to attach endpoint degrees, wedge self-join on the low vertex,
    and a final semi-join of wedges against oriented edges on the
    (v, w) pair — every join keyed, no cartesian.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e.persist()
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # attach (deg, id) rank to both endpoints; orient small → large
    ed = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("x"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dx"),
    ).persist()
    # wedges at u between two out-neighbors, ordered by (deg, id) so
    # each unordered pair appears once
    o1 = oriented.select("u", F.col("x").alias("v"), F.col("dx").alias("dv"))
    o2 = oriented.select("u", F.col("x").alias("w"), F.col("dx").alias("dw"))
    v_first = (F.col("dv") < F.col("dw")) | (
        (F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w"))
    )
    wedges = o1.join(o2, "u").filter(v_first).select("v", "w")
    closed = wedges.join(
        oriented.select(F.col("u").alias("v"), F.col("x").alias("w")),
        ["v", "w"],
        "left_semi",
    )
    # the three counts are control-plane scalars — compute them
    # eagerly so the persisted edge frames can be RELEASED before
    # returning (a lazy result would pin both caches for the session)
    n_nodes = deg.count()
    n_tri = closed.count()
    n_edges = e.count()
    spark = edges.sparkSession
    e.unpersist()
    oriented.unpersist()
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)],
        "n_nodes long, n_edges long, n_triangles long",
    )
