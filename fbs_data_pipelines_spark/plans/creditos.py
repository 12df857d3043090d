"""creditos entity pipeline (SURVEY §1.3, §2; reference
/root/reference/src/transformation_layer.py:37-121,163-168).

One lazy chain — Catalyst fuses the reference's 8 eager steps into a
single narrow-map stage (zero shuffles), and column pruning/pushdown
reach the scan for free.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.cleaning import (
    clean_percent,
    decimal_comma_to_double,
    drop_columns_matching,
    empty_to_null_all,
)
from fbs_data_pipelines_spark.functions.dates import (
    conditional_datediff,
    datediff_days,
    parse_flexible_date,
)
from fbs_data_pipelines_spark.sinks.writers import normalize_for_export

#: date columns parsed by the raw pipeline (transformation_layer.py:56)
DATE_COLUMNS = [
    "FechaIngreso",
    "FechaSolicitud",
    "Fecha Acta Aprobación",
    "FechaGiro",
    "FechaInicio",
    "FechaLegalización",
    "VencimientoCuota",
]

#: decimal-comma money columns (transformation_layer.py:96)
MONEY_COLUMNS = ["Monto", "Monto Aprobado", "Saldo"]

#: interest divisor — the code divides by 100*100000 = 1e7 (the
#: reference's comment says /100 but the executed semantics are /1e7;
#: preserved as executed — transformation_layer.py:50, SURVEY §7)
INTEREST_DIVISOR = 100 * 100000


def raw_creditos(
    df: DataFrame,
    run_date: _dt.date | None = None,
    for_export: bool = True,
) -> DataFrame:
    """Raw-layer creditos transform.

    ``run_date`` is the reference's driver-evaluated ``date.today()``
    (run-constant, injected as a literal — never ``current_date()``
    per-row; SURVEY §7 run-constant semantics). ``for_export=False``
    skips the final date→string normalization, keeping typed columns
    (the scale-friendly form for downstream relational work).
    """
    run_date = run_date or _dt.date.today()

    # Step 1 (P1): drop duplicate-header columns
    df = drop_columns_matching(df, "duplicated")

    # Step 2 (F1+F3+N1+N2): interest % → decimal
    df = df.withColumn("TasaInterés", clean_percent("TasaInterés") / INTEREST_DIVISOR)

    # Step 3 (F2-F4+D1): lenient locale date parse
    df = df.withColumns({c: parse_flexible_date(c) for c in DATE_COLUMNS})

    # Step 4 (D3): day-diff derived columns
    df = df.withColumns(
        {
            "tiempo_solicitud_giro": datediff_days("FechaGiro", "FechaSolicitud"),
            "tiempo_solicitud_inicio": datediff_days("FechaInicio", "FechaSolicitud"),
            "tiempo_solicitud_legalizacion": datediff_days(
                "FechaLegalización", "FechaSolicitud"
            ),
        }
    )

    # Step 5 (D4): run-constant current date
    df = df.withColumn("fecha_actual", F.lit(run_date).cast("date"))

    # Step 6 (D5): wait time only for un-disbursed credits
    df = df.withColumn(
        "tiempo_de_espera",
        conditional_datediff("FechaGiro", "fecha_actual", "FechaSolicitud"),
    )

    # Step 7 (N4): decimal-comma money
    df = df.withColumns({c: decimal_comma_to_double(c) for c in MONEY_COLUMNS})

    # Step 8 (K3/D6/N5): export normalization
    if for_export:
        df = normalize_for_export(df)
    return df


def modeled_creditos(df: DataFrame) -> DataFrame:
    """Modeled-layer creditos transform: empty-string → null across
    all columns (F8, transformation_layer.py:163-168)."""
    return empty_to_null_all(df)
