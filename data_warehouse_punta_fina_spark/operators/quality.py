"""Post-load data-quality suite (reference SURVEY.md §5.3; `main.py:724-994`).

Each check returns rows (check_name, target, metric, value, passed) so the
suite composes into a single report DataFrame — the engine's equivalent of
the reference's FASE 5 validation log output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _row(spark: SparkSession, check: str, target: str, metric: str, value: int, passed: bool) -> DataFrame:
    return spark.createDataFrame(
        [(check, target, metric, int(value), bool(passed))],
        "check string, target string, metric string, value long, passed boolean",
    )


def check_counts(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-table counts > 0 (`main.py:662-667`)."""
    spark = next(iter(tables.values())).sparkSession
    out = None
    for name, df in tables.items():
        n = df.count()
        r = _row(spark, "count_gt_zero", name, "rows", n, n > 0)
        out = r if out is None else out.unionByName(r)
    return out


def check_fk_orphans(fact: DataFrame, fact_name: str, fks: dict[str, tuple[DataFrame, str]]) -> DataFrame:
    """FK-orphan anti-join counts for each declared FK (`main.py:798-835`).
    Orphans are counted AFTER default-member fallback, so passing means
    full FK closure."""
    spark = fact.sparkSession
    out = None
    for fk_col, (dim, pk) in fks.items():
        orphans = (
            fact.filter(F.col(fk_col).isNotNull())
            .join(F.broadcast(dim.select(pk).distinct()), fact[fk_col] == dim[pk], "left_anti")
            .count()
        )
        r = _row(spark, "fk_orphans", f"{fact_name}.{fk_col}", "orphans", orphans, orphans == 0)
        out = r if out is None else out.unionByName(r)
    return out


def check_grain_unique(fact: DataFrame, fact_name: str, keys: list[str]) -> DataFrame:
    """Duplicate-grain check (`main.py:838-880`)."""
    dups = fact.groupBy(*keys).count().filter(F.col("count") > 1).count()
    return _row(fact.sparkSession, "grain_unique", fact_name, "dup_groups", dups, dups == 0)


def check_not_null(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
    """NULL/empty checks on critical columns (`main.py:883-909`)."""
    spark = df.sparkSession
    out = None
    for c in cols:
        bad = df.filter(F.col(c).isNull() | (F.trim(F.col(c).cast("string")) == "")).count()
        r = _row(spark, "not_null", f"{name}.{c}", "bad_rows", bad, bad == 0)
        out = r if out is None else out.unionByName(r)
    return out


def check_reconciliation(source_count: int, target: DataFrame, name: str) -> DataFrame:
    """Source-vs-DW count reconciliation (`main.py:911-967`)."""
    n = target.count()
    return _row(target.sparkSession, "reconciliation", name, "dw_minus_source", n - source_count, n == source_count)


def check_double_entry(journal: DataFrame, monto: str = "monto", tipo: str = "tipo_movimiento") -> DataFrame:
    """Σ débitos == Σ créditos ± 0.01 (`complete_fact_builder.py:973-980`)."""
    spark = journal.sparkSession
    row = journal.agg(
        F.sum(F.when(F.col(tipo) == "DEBITO", F.col(monto)).otherwise(F.lit(0))).alias("d"),
        F.sum(F.when(F.col(tipo) == "CREDITO", F.col(monto)).otherwise(F.lit(0))).alias("c"),
    ).collect()[0]
    diff_cents = int(round(abs(float(row["d"] or 0) - float(row["c"] or 0)) * 100))
    return _row(spark, "double_entry", "journal", "abs_diff_cents", diff_cents, diff_cents <= 1)
