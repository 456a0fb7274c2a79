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


def profile_table(df, columns=None):
    """Schema-driven column profile: (column, dtype, n, n_null,
    n_distinct, min_str, max_str) per column — the reference validator's
    per-column profiling (`core/data_validator.py` null/range checks)
    generalized into ONE generated aggregate. All statistics are exact;
    min/max stringify so one schema serves every dtype (cast AFTER the
    typed comparison, so numeric/date ordering is the column's own).

    Shape: a single pass producing 5 aggregates per column inside one
    hash aggregate (count-distincts expand to one grouping per column —
    at 100 TB profile a sampled or bucketed slice, or drop n_distinct to
    keep the pass fully map-side). Output is columns-sized.
    """
    from pyspark.sql import functions as F

    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    # ONE consumption of the aggregate row: explode an array of per-column
    # structs (a union of per-column selects would re-execute the full
    # aggregate once per column — the multi-branch trap)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(df.schema[c].dataType.simpleString()).alias("dtype"),
            F.col(f"__n_{c}").alias("n"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def benford_deviation(df, value_col, group_cols=None):
    """Benford's-law first-digit screen — the classic forensic DQ check
    for amount columns: organically-generated magnitudes follow
    P(d) = log10(1 + 1/d); fabricated or truncated data does not. Emits
    per (group, digit): observed count, observed share, expected share,
    and the round-6'd absolute deviation — consumers alert on the max or
    the sum (the reference's validator has range checks only; this is
    the distributional upgrade).

    Exactness: the first significant digit is string-derived from the
    ABS value (no float log in the digit path); shares are
    integer-count ratios, expected shares are round-6'd constants —
    fully oracle-mirrorable. Rows with |value| = 0 or null carry no
    first digit and are excluded (they have no magnitude to screen).
    Shape: one filtered projection + one (group, digit)-keyed count.
    """
    import math

    from pyspark.sql import functions as F

    from data_warehouse_punta_fina_spark.functions.money import pround

    groups = group_cols or []
    # first significant digit via the string form of abs(value): strip
    # sign/zeros/dot — deterministic for any numeric dtype
    digits = F.regexp_replace(
        F.abs(F.col(value_col)).cast("string"), "[^1-9]", ""
    )
    d = df.filter(F.col(value_col).isNotNull() & (F.abs(F.col(value_col)) > 0)).select(
        *groups, F.substring(digits, 1, 1).cast("int").alias("digit")
    ).filter(F.col("digit").isNotNull())
    counts = d.groupBy(*groups, "digit").agg(F.count("*").alias("n_obs"))
    totals = d.groupBy(*groups).agg(F.count("*").alias("_total"))
    joined = counts.join(totals, groups) if groups else counts.crossJoin(
        F.broadcast(totals)
    )
    expected = F.lit(0.0)
    for dig in range(1, 10):
        expected = F.when(
            F.col("digit") == dig, F.lit(round(math.log10(1 + 1 / dig), 6))
        ).otherwise(expected)
    share = F.col("n_obs").cast("double") / F.col("_total")
    return joined.select(
        *groups,
        "digit",
        "n_obs",
        pround(share, 6, 12).cast("double").alias("obs_share"),
        expected.alias("exp_share"),
        pround(F.abs(share - expected), 6, 12).cast("double").alias("abs_dev"),
    )
