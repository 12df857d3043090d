"""Row-oriented edges: list[list] rows ↔ DataFrame (SURVEY §2.1 S3).

The reference's Sheets reads produce header + ragged string rows,
padded/truncated to header width before construction
(/root/reference/src/gsheets_handler.py:81-116, 176-194;
/root/reference/src/utils_.py:18-29). These edges are driver-bound by
nature (an API payload), so padding happens in plain Python before
``createDataFrame`` — the DataFrame side stays distributed.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def pad_rows(rows: list[list[str]], width: int) -> list[list[str | None]]:
    """Pad short rows with None, truncate long rows (data_padding,
    gsheets_handler.py:176-194)."""
    out: list[list[str | None]] = []
    for r in rows:
        if len(r) < width:
            out.append(list(r) + [None] * (width - len(r)))
        else:
            out.append(list(r[:width]))
    return out


def ragged_row_rate(
    rows: list[list[str]], width: int, sample_size: int = 20, seed: int = 0
) -> float:
    """QA sampling (utils_.py:5-15): share of sampled rows whose width
    matches the header. Deterministic via explicit seed."""
    if not rows:
        return 1.0
    rng = random.Random(seed)
    sample = [rng.choice(rows) for _ in range(min(sample_size, len(rows)))]
    matches = sum(1 for r in sample if len(r) == width)
    return matches / len(sample)


def rows_to_df(
    spark: SparkSession, header: list[str], rows: list[list[str]]
) -> DataFrame:
    """Header + string rows → all-string DataFrame, ragged rows padded
    (S3). Types are imposed downstream (dictionary cast layer)."""
    width = len(header)
    padded = pad_rows(rows, width)
    schema = T.StructType([T.StructField(h, T.StringType()) for h in header])
    return spark.createDataFrame(padded, schema=schema)


def df_to_rows(df: DataFrame) -> list[list]:
    """Terminal row-payload for API sinks (K1 shape,
    gsheets_handler.py:140-143): [header] + value rows. Explicitly a
    driver-side collect — only for driver-bound edges; use
    ``df.write`` for data-scale sinks."""
    header = list(df.columns)
    return [header] + [list(r) for r in df.collect()]
