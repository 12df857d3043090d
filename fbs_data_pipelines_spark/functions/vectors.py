"""Vector (embedding) column expressions over array<float|double>.

JVM-side higher-order functions — no Python in the hot path. The
embeddings table stores array<float>; everything is computed in double
precision with left-to-right accumulation, which matches DuckDB's
list_* semantics for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double, sequential accumulation."""
    prod = F.zip_with(_as_double(_col(a)), _as_double(_col(b)), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double."""
    sq = F.transform(_as_double(_col(a)), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); null-safe on zero norms."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None)).otherwise(dot_product(a, b) / denom)


def sign_bits(a: Column | str, planes: Column) -> Column:
    """Random-hyperplane LSH signature: for each plane p (array of
    arrays), bit = 1 if a·p ≥ 0. Returns array<int>. ``planes`` must
    be a deterministic literal array so executors agree."""
    vec = _as_double(_col(a))
    def bit(p: Column) -> Column:
        prod = F.zip_with(vec, p, lambda x, y: x * y)
        s = F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))
    return F.transform(planes, bit)


def standardize_embeddings(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str | None = None,
):
    """Per-dimension z-score normalization — the preconditioning step
    before k-means / PQ / distance workloads when dimensions carry
    different scales (a dominant dimension otherwise owns every
    distance). Dimension stats (mean, population std) are ONE
    posexplode aggregate — dim-count control-plane rows, exactly the
    SQ8 grid pattern — baked back as literal arrays; the
    normalization itself is a narrow ``zip_with`` projection, so the
    corpus never shuffles. Zero-variance dimensions map to 0. Adds
    ``out_col`` (default ``{vec_col}_z``)."""
    from pyspark.sql import functions as F

    vecd = _as_double(_col(vec_col))
    stats = (
        df.select(F.posexplode(vecd).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.avg("x").alias("mu"),
            F.stddev_pop("x").alias("sd"),
        )
        .orderBy("pos")
        .collect()
    )
    mu_arr = F.array(*[F.lit(float(r["mu"])) for r in stats])
    sd_arr = F.array(*[F.lit(float(r["sd"])) for r in stats])
    centered = F.zip_with(vecd, mu_arr, lambda x, m: x - m)
    z = F.zip_with(
        centered,
        sd_arr,
        lambda d, s: F.when(s > 0, d / s).otherwise(F.lit(0.0)),
    )
    return df.withColumn(out_col or f"{vec_col}_z", z)
