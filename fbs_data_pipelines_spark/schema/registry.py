"""Dictionary-driven schema registry.

Re-expression of the reference's data-dictionary layer: per-column
logical types, PK/FK hierarchy, derived-ness, audit flags
(/root/reference/src/log_handler.py:7-40 ``map_data_types``;
/root/reference/etl.py:106-107 PK discovery; dictionary shape per
FIXTURES.md §3).

Logical → Spark physical mapping (preserving the reference's
deliberate choices):
    Integer   → long        (Polars Int64)
    Float     → double
    Timestamp → timestamp   (parsed dd/MM/yyyy[ HH:mm] when string)
    String    → string
    Bool      → string      (log_handler.py:13 maps Bool to String —
                             '70/30'-style flags stay strings)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.dates import parse_flexible_date, parse_timestamp

LOGICAL_TO_SPARK = {
    "Integer": "long",
    "Float": "double",
    "Timestamp": "timestamp",
    "String": "string",
    "Bool": "string",
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    logical_type: str  # Integer | String | Timestamp | Float | Bool
    hierarchy: str = "0"  # PK | FK | 0
    calculated: bool = False
    audit: bool = False


class DataDictionary:
    """In-memory registry for one entity's column dictionary."""

    def __init__(self, entity: str, columns: list[ColumnSpec]):
        self.entity = entity
        self.columns = columns
        self._by_name = {c.name: c for c in columns}

    @classmethod
    def from_dataframe(cls, entity: str, df: DataFrame) -> "DataDictionary":
        """Build from a dictionary table with the reference's columns
        (Nombre_columna, Tipo, Jerarquia, Calculado, Sujeto_auditoria)."""
        rows = df.select(
            "Nombre_columna", "Tipo", "Jerarquia", "Calculado", "Sujeto_auditoria"
        ).collect()
        cols = [
            ColumnSpec(
                name=r["Nombre_columna"],
                logical_type=r["Tipo"],
                hierarchy=str(r["Jerarquia"]),
                calculated=str(r["Calculado"]) == "1",
                audit=str(r["Sujeto_auditoria"]) == "1",
            )
            for r in rows
        ]
        return cls(entity, cols)

    def primary_key(self) -> str:
        """PK discovery (etl.py:107): the single PK-flagged column."""
        pks = [c.name for c in self.columns if c.hierarchy == "PK"]
        if len(pks) != 1:
            raise ValueError(f"{self.entity}: expected exactly 1 PK, got {pks}")
        return pks[0]

    def foreign_keys(self) -> list[str]:
        return [c.name for c in self.columns if c.hierarchy == "FK"]

    def audit_cols(self) -> list[str]:
        """Sujeto_auditoria=1 columns → C1 target_cols."""
        return [c.name for c in self.columns if c.audit]

    def derived_cols(self) -> list[str]:
        return [c.name for c in self.columns if c.calculated]

    def apply_types(self, df: DataFrame, timestamp_fmt: str = "dd/MM/yyyy HH:mm") -> DataFrame:
        """The cast program (N8, log_handler.py:7-40).

        For each dictionary column present in ``df``: cast to the
        declared physical type. String-typed timestamp columns are
        parsed with the locale format (the reference sniffs the first
        value's Python type; here we branch on the column's dtype —
        same decision, schema-driven instead of value-peek). Missing
        columns are skipped (reference warns + continues). Lenient:
        failures → null.
        """
        exprs = []
        present = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for name in df.columns:
            spec = self._by_name.get(name)
            if spec is None:
                exprs.append(F.col(name))
                continue
            target = LOGICAL_TO_SPARK[spec.logical_type]
            if target == "timestamp" and present[name] == "string":
                # try full datetime format first, then date-only
                exprs.append(
                    F.coalesce(
                        parse_timestamp(name, timestamp_fmt),
                        parse_flexible_date(name).cast("timestamp"),
                    ).alias(name)
                )
            else:
                exprs.append(F.col(name).try_cast(target).alias(name))
        return df.select(*exprs)
