"""Generated sources (reference SURVEY.md §2.1 S7-S8).

The reference materializes a 2020-2030 calendar with ``pd.date_range``
(`complete_dimension_builder.py:79-80`) and several hard-coded literal
catalogs (`:700-761`). Spark-first: ``sequence()`` + ``explode`` generates
the range inside the JVM — no driver-side loop, scales to any span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def date_range_source(
    spark: SparkSession, start: str, end: str, col_name: str = "fecha"
) -> DataFrame:
    """One row per day in [start, end] — distributed, no driver loop."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
                )
            ).alias(col_name)
        )
        # repartition so downstream per-day derivations parallelize even
        # though the generator itself starts from a single row
        .repartition(8)
    )


def monthly_periods(spark: SparkSession, start: str, end: str) -> DataFrame:
    """One row per month: periodo_id (yyyyMM int), first/last day.

    Mirrors the reference's monthly period generator loop
    (`complete_dimension_builder.py:1142-1169`) declaratively.
    """
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.trunc(F.to_date(F.lit(start)), "month"),
                    F.trunc(F.to_date(F.lit(end)), "month"),
                    F.expr("interval 1 month"),
                )
            ).alias("inicio_mes")
        )
        .select(
            F.date_format("inicio_mes", "yyyyMM").cast("int").alias("periodo_id"),
            F.col("inicio_mes").alias("fecha_inicio"),
            F.last_day("inicio_mes").alias("fecha_fin"),
        )
    )


def literal_table(spark: SparkSession, rows: list[dict], schema: T.StructType | str) -> DataFrame:
    """Inline catalog table (S8) — e.g. tax types, payment methods."""
    return spark.createDataFrame(rows, schema=schema)
