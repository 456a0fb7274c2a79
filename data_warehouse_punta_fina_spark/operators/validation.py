"""Declarative data-validation engine (reference SURVEY.md §2.12).

Port of ``DataValidator.validate_and_populate`` (`core/data_validator.py:27-99`):
a table schema is a dict of column rules (type/required/default/min/max)
plus table-level primary_key/foreign_keys. Applies, in the reference's
order: structure → type coercion → required fill → range clamp → PK dedup,
and returns (clean_df, report). Counts in the report are computed with
aggregations (one pass over the data per metric batch), never collects.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.functions.strings import auto_id
from data_warehouse_punta_fina_spark.operators.dedup import dedupe_by_grain

_TYPE_MAP = {
    "int": "long",
    "integer": "long",
    "float": "double",
    "number": "double",
    "string": "string",
    "str": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "decimal": "decimal(15,2)",
}


@dataclass
class ColumnRule:
    """Per-column rule (reference `transformers/dimension_builder.py:46-100`)."""

    type: str = "string"
    required: bool = False
    default: Any = None
    min: float | None = None
    max: float | None = None
    auto_id_from: list[str] | None = None


@dataclass
class TableRules:
    columns: dict[str, ColumnRule]
    primary_key: list[str] = field(default_factory=list)
    foreign_keys: dict[str, tuple[DataFrame, str]] = field(default_factory=dict)


def _coerce(col: Column, rule: ColumnRule) -> Column:
    target = _TYPE_MAP.get(rule.type, rule.type)
    if target == "boolean":
        s = F.lower(F.trim(col.cast("string")))
        return F.when(s.isin("true", "1", "t", "yes", "si", "sí"), F.lit(True)).when(
            s.isin("false", "0", "f", "no"), F.lit(False)
        )
    return col.cast(target)


def _orderable(dt) -> bool:
    """Whether a data type supports ORDER BY: maps don't, and neither do
    arrays/structs with a map anywhere inside."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def validate_and_populate(df: DataFrame, rules: TableRules) -> tuple[DataFrame, dict]:
    """Apply the rule pipeline; return (clean_df, nested report dict)."""
    report: dict[str, Any] = {"structure": {}, "nulls_filled": {}, "range_clamped": {}, "fk": {}}
    in_rows = df.count()

    # 1. structure: add missing declared columns (`data_validator.py:101-123`)
    for name, rule in rules.columns.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(rule.default).cast(_TYPE_MAP.get(rule.type, rule.type)))
            report["structure"][name] = "added"

    # 2. type coercion (`data_validator.py:125-164`)
    df = df.select(
        *[
            _coerce(F.col(c), rules.columns[c]).alias(c) if c in rules.columns else F.col(c)
            for c in df.columns
        ]
    )

    # 3+5. required-field population with defaults / AUTO_ID (`:166-202`, `:227-258`)
    null_counts = {}
    to_fill = [c for c, r in rules.columns.items() if r.required or r.default is not None]
    if to_fill:
        agg = df.agg(*[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in to_fill]).collect()[0]
        null_counts = agg.asDict()
    for name in to_fill:
        rule = rules.columns[name]
        if rule.auto_id_from:
            filler = auto_id(*rule.auto_id_from)
        elif rule.default == "current_timestamp":
            filler = F.current_timestamp()
        elif rule.default is not None:
            filler = F.lit(rule.default).cast(_TYPE_MAP.get(rule.type, rule.type))
        else:
            continue
        df = df.withColumn(name, F.coalesce(F.col(name), filler))
        if null_counts.get(name):
            report["nulls_filled"][name] = null_counts[name]

    # 6. range clamp (`data_validator.py:260-297`)
    for name, rule in rules.columns.items():
        if rule.min is not None:
            df = df.withColumn(name, F.greatest(F.col(name), F.lit(rule.min).cast(_TYPE_MAP.get(rule.type, rule.type))))
        if rule.max is not None:
            df = df.withColumn(name, F.least(F.col(name), F.lit(rule.max).cast(_TYPE_MAP.get(rule.type, rule.type))))

    # 4. referential integrity — count-only check (`data_validator.py:204-225`)
    for fk_col, (dim, pk) in rules.foreign_keys.items():
        orphans = (
            df.filter(F.col(fk_col).isNotNull())
            .join(F.broadcast(dim.select(pk)), df[fk_col] == dim[pk], "left_anti")
            .count()
        )
        report["fk"][fk_col] = {"orphans": orphans}

    # 7. PK dedup (`data_validator.py:299-331`) — deterministic survivor.
    # Order by the NON-key payload columns: within a PK group the key
    # columns are constant, so ordering by them would leave the survivor
    # arbitrary when duplicate PKs carry different payloads. Unorderable
    # columns (maps, or arrays/structs containing them) are excluded —
    # sorting by a MapType raises in Spark.
    if rules.primary_key:
        payload = [
            c
            for c in df.columns
            if c not in rules.primary_key and _orderable(df.schema[c].dataType)
        ]
        order = [F.col(c) for c in payload] or [F.col(c) for c in rules.primary_key]
        df = dedupe_by_grain(df, rules.primary_key, order)

    out_rows = df.count()
    report["rows_in"] = in_rows
    report["rows_out"] = out_rows
    report["rows_deduped"] = in_rows - out_rows
    return df, report
