"""Window/analytic operators (reference SURVEY.md §2.5 W1-W4).

All windows are partitioned by a business key, so at 100 TB each group is
small and the shuffle is a standard hash repartition on the key — no
global sort. The one exception, dense global id assignment, is documented
on :func:`sequential_id`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    value: str,
    partition_by: str | list[str],
    order_by: str | list[str],
    out: str = "running_total",
) -> DataFrame:
    """Cumulative sum per group (W1: `complete_fact_builder.py:941-947` —
    cumulative account balance)."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob = [order_by] if isinstance(order_by, str) else order_by
    w = Window.partitionBy(*pb).orderBy(*ob).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(value).over(w))


def lag_prev(
    df: DataFrame,
    value: str,
    partition_by: str | list[str],
    order_by: str | list[str],
    default: float = 0,
    out: str = "prev",
) -> DataFrame:
    """Prior-row value per group with default (W2:
    `complete_fact_builder.py:948` — prior-period closing balance)."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob = [order_by] if isinstance(order_by, str) else order_by
    w = Window.partitionBy(*pb).orderBy(*ob)
    return df.withColumn(out, F.lag(value, 1, default).over(w))


def top_n_per_group(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: list[Column],
    n: int = 1,
    rank_col: str = "_rn",
) -> DataFrame:
    """Top-N per group via row_number (W3: the reference's
    ``SELECT DISTINCT ON (line_item_id) ... ORDER BY amount DESC``,
    `complete_fact_builder.py:272-280`). Pass a deterministic tie-break in
    ``order_by`` (e.g. the natural id) for reproducible output."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    w = Window.partitionBy(*pb).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n).drop(rank_col)


def sequential_id(
    df: DataFrame,
    order_by: str | list[str],
    out: str = "id",
    start: int = 1,
) -> DataFrame:
    """Dense sequential ids 1..n ordered by a natural key (W4: reference
    `df.insert(0, 'line_item_id', range(1, len(df)+1))`,
    `complete_dimension_builder.py:560-561`).

    Scale note: a global row_number funnels through one partition — fine
    for dimension tables (≤ millions of rows). For 100 TB facts prefer
    :func:`partitioned_sequential_id`, which computes per-partition counts
    and offsets (two passes, no single-partition bottleneck), or drop the
    density requirement and use ``monotonically_increasing_id``.
    """
    ob = [order_by] if isinstance(order_by, str) else order_by
    w = Window.orderBy(*ob)
    return df.withColumn(out, F.row_number().over(w) + F.lit(start - 1))


def ranked_sequential_id(
    df: DataFrame,
    order_by: str | list[str],
    out: str = "id",
    start: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Dense ids 1..n ordered by a key, WITHOUT a global window.

    Semantics identical to ``ROW_NUMBER() OVER (ORDER BY key)`` + start-1
    (assumes unique keys), but computed scalably in two passes:

    1. ``repartitionByRange(key)`` → per-range ``row_number`` (windows are
       per-partition, fully parallel);
    2. per-partition row counts → cumulative offsets (one tiny window over
       ≤ #partitions rows, bounded by cluster width not data size) →
       broadcast-joined back.

    Correct for ANY range boundaries the sampler picks: partitions are
    non-overlapping ordered key ranges, so offset + local rank = global
    rank. This is the scale-safe replacement for a dim-builder global
    window: at sf100 dim_producto/dim_cliente are tens of millions of
    rows, far past the single-partition sort a global window forces.
    """
    ob = [order_by] if isinstance(order_by, str) else list(order_by)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *[F.col(c) for c in ob]).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = parted.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy(*ob))
    ).localCheckpoint(eager=False)
    # ^ the checkpoint is CORRECTNESS, not caching: counts and the final
    # join both consume the ranked rows, and without materialization each
    # branch re-executes the range shuffle independently — the range
    # partitioner's sampled boundaries (and AQE's coalescing) can differ
    # between executions, so _pid would not line up across branches and
    # the offsets would be wrong (verified empirically: the un-checkpointed
    # variant is ~2x faster and returns incorrect ranks).
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # constant partition key: the offsets table is ≤ #partitions rows by
    # construction, so a single-partition window here is intentional (and
    # shouldn't trip the WindowExec global-window warning)
    w_off = Window.partitionBy(F.lit(0)).orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))).select(
        "_pid", "_off"
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_rn") + F.col("_off") + F.lit(start - 1))
        .drop("_pid", "_rn", "_off")
    )


def partitioned_sequential_id(df: DataFrame, out: str = "id", start: int = 1) -> DataFrame:
    """Dense global ids without a global sort: zipWithIndex semantics via
    per-partition offsets. Order follows the current partition layout (not
    a business key) — use when density matters but a specific order does
    not. Scales linearly: one count per partition + one map."""
    spark = df.sparkSession
    rdd = df.rdd.zipWithIndex()
    new_schema = df.schema.add(out, "long")
    out_rdd = rdd.map(lambda pair: (*pair[0], pair[1] + start))
    return spark.createDataFrame(out_rdd, new_schema)
