"""Slowly-changing-dimension type 2 merge.

The reference declares ``incremental`` / ``upsert`` load strategies but
stubs both to truncate-and-load (`loaders/database_loader.py:204-212`,
SURVEY.md §2.1 S12) — this operator completes them the warehouse way.
Without a transactional table format (Delta/Iceberg MERGE INTO is not in
this image), SCD2 is the classic emulation: split current rows into
unchanged / closed, append new versions, union (the CDC/SCD2 pattern from
the public Spark playbook).

Shuffle shape: two broadcast-or-hash joins on the business key + a union —
at 100 TB the updates batch is normally the small side and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: Column,
    end_of_time: str = "9999-12-31",
) -> DataFrame:
    """Merge an updates batch into an SCD2 dimension.

    ``current`` must carry (key, tracked..., valid_from, valid_to,
    is_current); ``updates`` carries (key, tracked...). Semantics:

    - key in both, any tracked column differs → close the current row
      (valid_to = effective_date, is_current = false) and append a new
      version (valid_from = effective_date);
    - key only in updates → brand-new member row;
    - key only in current, or values unchanged → row passes through.
    """
    cur = current.alias("c")
    upd = updates.alias("u")
    changed_cond = None
    for col in tracked:
        piece = ~F.col(f"c.{col}").eqNullSafe(F.col(f"u.{col}"))
        changed_cond = piece if changed_cond is None else (changed_cond | piece)

    joined = cur.filter(F.col("c.is_current")).join(upd, F.col(f"c.{key}") == F.col(f"u.{key}"), "left")
    untouched_current = joined.filter(F.col(f"u.{key}").isNull() | ~changed_cond).select("c.*")
    closed = (
        joined.filter(F.col(f"u.{key}").isNotNull() & changed_cond)
        .select("c.*")
        .withColumn("valid_to", effective_date)
        .withColumn("is_current", F.lit(False))
    )
    new_versions = (
        joined.filter(F.col(f"u.{key}").isNotNull() & changed_cond)
        .select(F.col(f"c.{key}").alias(key), *[F.col(f"u.{col}").alias(col) for col in tracked])
        .withColumn("valid_from", effective_date)
        .withColumn("valid_to", F.to_date(F.lit(end_of_time)))
        .withColumn("is_current", F.lit(True))
    )
    brand_new = (
        upd.join(cur.filter(F.col("c.is_current")), F.col(f"u.{key}") == F.col(f"c.{key}"), "left_anti")
        .select(F.col(key), *[F.col(col) for col in tracked])
        .withColumn("valid_from", effective_date)
        .withColumn("valid_to", F.to_date(F.lit(end_of_time)))
        .withColumn("is_current", F.lit(True))
    )
    history = current.filter(~F.col("is_current"))
    cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    return (
        history.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(new_versions.select(*cols))
        .unionByName(brand_new.select(*cols))
    )
