"""Multi-dimensional data layout (z-order clustering) for scan pruning.

A 100 TB fact table is usually range-partitioned (and min/max-pruned)
on ONE leading dimension; filters on any other dimension still scan
everything. Z-ordering interleaves the bits of several dimensions'
bucket ranks into a single sort key, so files end up clustered in
EVERY participating dimension at once: a selective filter on any of
them touches only the few files whose min/max range covers the value.
This is the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``
(public algorithm: Morton codes over quantile ranks) re-expressed as
plain DataFrame ops:

1. one ``approxQuantile`` pass computes per-column bucket boundaries
   (equi-depth, so skewed distributions still spread over all buckets);
2. each row's per-column bucket rank is found JVM-side by counting
   boundary crossings in a literal array (no UDF, codegen-friendly);
3. ranks are bit-interleaved into a Morton code with shift/or
   expressions;
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the code
   writes files whose parquet footer min/max stats are tight in every
   z-ordered column.

Scale notes: the quantile pass is one aggregation job (driver gets
``bits``-sized arrays per column, never data); the write is the single
range-exchange any clustered write pays. No step is driver-bound.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quantile sketch accuracy for boundary estimation; 0.001 keeps the
#: equi-depth buckets within 0.1% of exact at any scale
_QUANTILE_ERR = 0.001

_ZCOL = "__zvalue"


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric view of a column for quantile bucketing (dates and
    timestamps map to days/seconds since epoch)."""
    dtype = dict(df.dtypes)[col]
    if dtype == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if dtype.startswith("timestamp"):
        return F.col(col).cast("double")
    return F.col(col).cast("double")


def _bucket_rank(value: Column, cuts: list[float]) -> Column:
    """Equi-depth bucket rank in [0, len(cuts)]: the number of
    boundaries strictly below the value. Nulls sort to bucket 0 so
    they cluster together instead of scattering."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    crossings = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, cut: acc + F.when(value > cut, 1).otherwise(0),
    )
    return F.when(value.isNull(), F.lit(0)).otherwise(crossings)


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8) -> Column:
    """Morton code over ``cols``: interleaves the ``bits``-bit
    equi-depth bucket ranks of each column. Pure JVM expressions —
    usable directly in ``repartitionByRange``/``sortWithinPartitions``.
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_cuts = df.select(
        *[_as_double(df, c).alias(c) for c in cols]
    ).approxQuantile(list(cols), probs, _QUANTILE_ERR)

    ranks = [
        _bucket_rank(_as_double(df, c), sorted(set(cuts)))
        for c, cuts in zip(cols, all_cuts)
    ]
    # interleave: output bit (i * ncols + j) = bit i of rank j, so all
    # columns contribute equally at every scale of the sort key
    parts = []
    for i in range(bits):
        for j, r in enumerate(ranks):
            parts.append(
                F.shiftleft(
                    F.shiftright(r.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * len(ranks) + j,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias(_ZCOL)


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    Files carry tight min/max footer stats in every z-ordered column,
    so Spark's parquet reader (filter pushdown + row-group stats) and
    any lakehouse file-pruning layer skip non-matching files on
    filters over ANY of ``cols`` — not just the leading one.
    """
    z = df.withColumn(_ZCOL, zorder_key(df, cols, bits))
    (
        z.repartitionByRange(n_files, F.col(_ZCOL))
        .sortWithinPartitions(_ZCOL)
        .drop(_ZCOL)
        .write.mode(mode)
        .parquet(path)
    )
