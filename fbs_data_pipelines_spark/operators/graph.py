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
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) — the loop-invariant join base, materialized
    # once so each iteration starts from a checkpointed snapshot
    base = e.join(outdeg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            base.join(ranks, base.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
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
