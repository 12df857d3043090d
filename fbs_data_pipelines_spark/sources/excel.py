"""Excel source (SURVEY §2.1 S4).

The reference reads its data dictionary from an Excel workbook
(``pl.read_excel`` at /root/reference/etl.py:106, and a DuckDB
``st_read`` path at /root/reference/src/db_manager.py:42-53). Spark
has no built-in Excel reader; the idiomatic shape is a driver-side
parse (workbooks are small, driver-bound metadata by contract — the
dictionary is ~50 rows) into ``spark.createDataFrame``.

The actual xlsx parse requires openpyxl/fastexcel, which may be
absent; the reader is gated behind an import-try and raises a clear
error directing to the CSV fallback (``read_dict_csv``) when no
engine is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _excel_rows(path: str, sheet: str | int = 0) -> tuple[list[str], list[list]]:
    """Parse workbook → (header, rows). Tries pandas engines in order."""
    try:
        import pandas as pd
    except ImportError as ex:  # pragma: no cover
        raise NotImplementedError("pandas required for Excel parsing") from ex
    last_err: Exception | None = None
    # pandas' default xlsx engine IS openpyxl, so trying engine=None
    # adds nothing but a zip-sniff error path; enumerate explicitly
    for engine in ("calamine", "openpyxl"):
        try:
            pdf = pd.read_excel(path, sheet_name=sheet, engine=engine, dtype=str)
            header = [str(c) for c in pdf.columns]
            rows = pdf.where(pd.notna(pdf), None).values.tolist()
            return header, rows
        except ImportError as ex:
            last_err = ex
        except ValueError as ex:  # unknown engine name on this pandas
            last_err = ex
    raise NotImplementedError(
        "no Excel engine available (openpyxl/fastexcel not installed); "
        "export the workbook to CSV and use sources.csv.read_dialected_csv"
    ) from last_err


def read_excel(
    spark: SparkSession, path: str, sheet: str | int = 0
) -> DataFrame:
    """Excel sheet → all-string DataFrame (header row = column names).

    Same permissive typing regime as the CSV source: everything lands
    as string; the schema registry's cast program imposes types
    (N8 — the reference's dictionary-driven flow)."""
    header, rows = _excel_rows(path, sheet)
    from fbs_data_pipelines_spark.sources.rows import rows_to_df

    return rows_to_df(spark, header, rows)
