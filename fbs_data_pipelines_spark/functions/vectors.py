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


def dot_product(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """Σ aᵢ·bᵢ in double, sequential accumulation.

    With ``dim`` (the exact array length, when the caller knows it
    statically) the sum is ONE ``aggregate`` over a literal index
    array, each step an ``element_at`` multiply-add — half the
    higher-order lambda dispatches of the ``zip_with``+``aggregate``
    form and no intermediate product array (r17 micro-bench, 500k
    rows × 64 dims: 0.43 s → 0.27 s; a fully unrolled 64-term
    codegen chain was measured SLOWER — 1.4 s — plus ~0.5 s of
    driver tree-building per site, so indexed-fold it is).
    Bit-identical results: same left-to-right association (IEEE
    ``0.0 + p₁ ≡ p₁``), per-element float→double widening is exact.
    Caveat: arrays SHORTER than ``dim`` yield null (element_at past
    the end) where the zip form would sum the common prefix — pass
    ``dim`` only when it is the true length."""
    if dim is not None:
        av, bv = _col(a), _col(b)
        return F.aggregate(
            F.lit(list(range(1, dim + 1))),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(av, i).cast("double")
            * F.element_at(bv, i).cast("double"),
        )
    prod = F.zip_with(_as_double(_col(a)), _as_double(_col(b)), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """‖a‖₂ in double. ``dim`` switches to the indexed fold exactly
    as in :func:`dot_product` (same bit-identical association, same
    shorter-array caveat)."""
    if dim is not None:
        av = _col(a)
        return F.sqrt(
            F.aggregate(
                F.lit(list(range(1, dim + 1))),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(av, i).cast("double")
                * F.element_at(av, i).cast("double"),
            )
        )
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
    mu_arr = F.lit([float(r["mu"]) for r in stats])
    sd_arr = F.lit([float(r["sd"]) for r in stats])
    centered = F.zip_with(vecd, mu_arr, lambda x, m: x - m)
    z = F.zip_with(
        centered,
        sd_arr,
        lambda d, s: F.when(s > 0, d / s).otherwise(F.lit(0.0)),
    )
    return df.withColumn(out_col or f"{vec_col}_z", z)
