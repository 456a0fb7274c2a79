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


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    z: float = 3.5,
) -> DataFrame:
    """Median/MAD outlier flagging (Iglewicz-Hoaglin modified z-score):
    ``score = 0.6745·|x − median| / MAD``, flagged when ``score > z`` —
    the robust alternative to mean/stddev that one fat-tailed 100 TB
    partition can't poison (both statistics have a 50% breakdown point).

    Exactness: medians use Spark's exact ``percentile`` (bit-identical to
    DuckDB ``quantile_cont``, proven by the percentile query family); the
    score is portable-round-6'd BEFORE the threshold compare, so the flag
    never flips across engines on a boundary value. Groups with MAD = 0
    (over half the values identical) flag nothing — score is undefined
    there, and anything ≠ median in such a group surfaces via
    ``is_mad_degenerate`` instead of a fabricated infinite score.

    Shape: two grouped exact-percentile aggregates (each one shuffle of
    (group, value) pairs) + two broadcast-or-hash joins of group-sized
    tables back onto the rows. Returns the input + (score,
    is_outlier, is_mad_degenerate)."""
    from data_warehouse_punta_fina_spark.functions.money import pround

    groups = group_cols or []
    gb = lambda d: d.groupBy(*groups) if groups else d.groupBy()  # noqa: E731
    med = gb(df).agg(F.percentile(F.col(value_col), F.lit(0.5)).alias("_med"))
    with_med = df.join(med, groups) if groups else df.crossJoin(F.broadcast(med))
    dev = with_med.withColumn("_absdev", F.abs(F.col(value_col) - F.col("_med")))
    mad = gb(dev).agg(F.percentile(F.col("_absdev"), F.lit(0.5)).alias("_mad"))
    scored = (
        (dev.join(mad, groups) if groups else dev.crossJoin(F.broadcast(mad)))
        .withColumn(
            "score",
            F.when(
                F.col("_mad") > 0,
                pround(
                    F.lit(0.6745) * F.col("_absdev") / F.col("_mad"), 6, 15
                ).cast("double"),
            ),
        )
        .withColumn(
            "is_outlier",
            F.when(F.col("_mad") > 0, F.col("score") > F.lit(z)).otherwise(
                F.lit(False)
            ),
        )
        .withColumn("is_mad_degenerate", F.col("_mad") == 0)
    )
    return scored.drop("_med", "_absdev", "_mad")
