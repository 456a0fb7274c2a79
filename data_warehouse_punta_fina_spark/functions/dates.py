"""Date/time scalar helpers (reference SURVEY.md §2.8 date table).

The reference derives integer date keys, Spanish calendar names, weekend
flags and period keys with pandas (`complete_dimension_builder.py:79-120`,
`complete_fact_builder.py:570, :722-724, :879-880`). Everything here is a
built-in-function composition — JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1=Lunes … 7=Domingo (reference stores Monday=1, docs/MAPPING_TABLAS_DW_REAL.md:203)
SPANISH_DAYS = [
    "Lunes",
    "Martes",
    "Miércoles",
    "Jueves",
    "Viernes",
    "Sábado",
    "Domingo",
]
SPANISH_MONTHS = [
    "Enero",
    "Febrero",
    "Marzo",
    "Abril",
    "Mayo",
    "Junio",
    "Julio",
    "Agosto",
    "Septiembre",
    "Octubre",
    "Noviembre",
    "Diciembre",
]


def date_key(col: Column | str) -> Column:
    """yyyyMMdd integer key (reference `strftime('%Y%m%d').astype(int)`)."""
    return F.date_format(col, "yyyyMMdd").cast("int")


def period_key(col: Column | str) -> Column:
    """yyyyMM integer period key."""
    return F.date_format(col, "yyyyMM").cast("int")


def period_of_date_key(fecha_id: Column | str) -> Column:
    """periodo_id = fecha_id // 100 (reference `complete_fact_builder.py:879-880`)."""
    c = F.col(fecha_id) if isinstance(fecha_id, str) else fecha_id
    return F.floor(c.cast("long") / F.lit(100)).cast("int")


def iso_dow(col: Column | str) -> Column:
    """Day of week with 1=Monday … 7=Sunday.

    Spark ``dayofweek`` is 1=Sunday; the reference uses pandas Monday-based
    numbering +1 (`complete_dimension_builder.py:88`).
    """
    return ((F.dayofweek(col) + F.lit(5)) % F.lit(7)) + F.lit(1)


def _name_from_list(index_col: Column, names: list[str]) -> Column:
    expr = F.lit(names[-1])
    for i in range(len(names) - 2, -1, -1):
        expr = F.when(index_col == F.lit(i + 1), F.lit(names[i])).otherwise(expr)
    return expr


def spanish_day_name(col: Column | str) -> Column:
    """Nombre del día (reference `complete_dimension_builder.py:90-104`)."""
    return _name_from_list(iso_dow(col), SPANISH_DAYS)


def spanish_month_name(col: Column | str) -> Column:
    """Nombre del mes (reference `complete_dimension_builder.py:105-115`)."""
    return _name_from_list(F.month(col), SPANISH_MONTHS)


def is_weekend(col: Column | str) -> Column:
    """Sábado/Domingo flag (reference `complete_dimension_builder.py:117`)."""
    return iso_dow(col).isin(6, 7)
