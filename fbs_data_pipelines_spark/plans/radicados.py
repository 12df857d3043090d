"""radicados entity pipeline (SURVEY §1.3, §2; reference
/root/reference/src/transformation_layer.py:123-161).

All narrow maps — single stage, no shuffle. The working-group mapping
is a 21-entry inline map literal (constant-folded; J5) — at real
lookup-table scale this becomes `operators.joins.lookup_join`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.cleaning import map_values, split_unnest
from fbs_data_pipelines_spark.functions.dates import parse_timestamp

#: code → working-group name (reference data table,
#: transformation_layer.py:13-34 — data, reproduced for parity)
WORKING_GROUPS = {
    "TL": "Tramite en línea",
    "DDB": "Direccion de desarrollo bienestar",
    "GCIG": "Grupo de control interno de gestión",
    "GGAFCC": "Grupo de gestion admin Crédito y cartera",
    "SDE": "Subdirección de desarrollo y emprendimiento",
    "GGC": "Grupo de gestion de cesantias",
    "GGEC": "Grupo de gestion educativa y colegio",
    "GGTHDO": "Grupo de gestion de talento humano y desarrollo organizacional",
    "DGC": "Dirección de gestion corporativa",
    "GER": "Gerencia",
    "GBRCD": "Grupo de bienestar y recreación, cultura y deporte",
    "GTICS": "Grupo de tecnología, informacion y comunicaciones",
    "GCMAIS": "Grupo centro medico y atencion integral",
    "OPL": "Oficina de planeación",
    "GSAGD": "Grupo de seguimiento y atencion a gerencias dptales",
    "GGF": "Grupo de gestion financiera",
    "GAJ": "Grupo de asuntos juridicos",
    "GGA": "Grupo de gestion administrativa",
    "SDBV": "Subdirección de bienestar",
    "GAUEGI": "Grupo de atencion al usuario",
    "OAD": "Oficina de asuntos disciplinarios",
}

DESTINO_FIELDS = ["cargo_destino", "cod_grupo_destino", "funcionario_destino"]


def raw_radicados(df: DataFrame) -> DataFrame:
    """Raw-layer radicados transform.

    - ``Fecha Radicacion``: lenient ``dd/MM/yyyy HH:mm`` parse (D2).
    - ``Destino`` split (F5/F6): ``cargo-COD-funcionario`` → 3 columns;
      bare names → (null, 'GAUEGI', null) defaults
      (transformation_layer.py:131-146).
    - ``grupo_destino``: dictionary map with null default (F7/J5).
    """
    df = df.withColumn(
        "Fecha Radicacion", parse_timestamp("Fecha Radicacion", "dd/MM/yyyy HH:mm")
    )

    has_hyphen = F.col("Destino").contains("-")
    df = df.select(
        "*",
        *split_unnest(
            "Destino",
            "-",
            DESTINO_FIELDS,
            defaults={"cod_grupo_destino": F.lit("GAUEGI")},
            condition=has_hyphen,
        ),
    )

    return df.withColumn(
        "grupo_destino", map_values("cod_grupo_destino", WORKING_GROUPS)
    )


def modeled_radicados(df: DataFrame) -> DataFrame:
    """Modeled-layer radicados: lenient Int64 casts of Radicado/Rpta
    (N3, transformation_layer.py:156-161)."""
    return df.withColumns(
        {
            "Radicado": F.col("Radicado").try_cast("long"),
            "Rpta": F.col("Rpta").try_cast("long"),
        }
    )
