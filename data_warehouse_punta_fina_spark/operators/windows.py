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
    (assumes unique keys; reference
    `complete_dimension_builder.py:560-561`), computed scalably:

    1. a deterministic hash-sample of the keys → ≤ n-1 collected range
       cutpoints → every row's bucket ``_pid`` = #cutpoints ≤ its key
       (a pure function of the key — no materialization needed for
       branch consistency, unlike range-shuffle partition ids);
    2. per-bucket counts (≤ n rows, collected) → cumulative offsets as a
       literal array;
    3. per-bucket ``row_number`` + offset lookup — windows are
       per-bucket, fully parallel, one shuffle.

    Correct for ANY cutpoints the sample yields: buckets are
    non-overlapping ordered key ranges, so offset + local rank = global
    rank. Cluster-robust: every branch recomputes to the same answer, so
    nothing needs materializing — lost executors just replay lineage. This is
    the scale-safe replacement for a dim-builder global window: at sf100
    dim_producto/dim_cliente are tens of millions of rows, far past the
    single-partition sort a global window forces.
    """
    ob = [order_by] if isinstance(order_by, str) else list(order_by)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    dtypes = {c: df.schema[c].dataType for c in ob}
    key = F.struct(*[F.col(c).alias(c) for c in ob])

    # Pass 1 (key columns only — Catalyst prunes the rest): a deterministic
    # hash-sample of ~1/512 of the keys, collected and turned into ≤ n-1
    # range cutpoints. xxhash64 is a pure function of the key, so this
    # branch can re-execute freely and always yields the same sample —
    # unlike repartitionByRange's random sampler, whose boundaries can
    # differ between executions of the same plan.
    sampled = [
        tuple(r)
        for r in df.select(*ob)
        .filter(F.pmod(F.xxhash64(*[F.col(c) for c in ob]), F.lit(512)) == 0)
        .collect()
        if all(v is not None for v in r)
    ]
    sampled.sort()
    cuts: list[tuple] = []
    if len(sampled) >= 2 and n > 1:
        step = len(sampled) / n
        for i in range(1, n):
            c = sampled[min(int(i * step), len(sampled) - 1)]
            if not cuts or c != cuts[-1]:
                cuts.append(c)

    def _cut_lit(t: tuple) -> Column:
        return F.struct(
            *[F.lit(v).cast(dtypes[c]).alias(c) for v, c in zip(t, ob)]
        )

    # _pid is a PURE FUNCTION of the key: bucket = #cutpoints ≤ key. Rows
    # with null key fields compare null → coalesce to 0 → bucket 0, which
    # matches NULLS FIRST sort order, so offset + local rank = global rank.
    # The pmod(hash,1) term is always 0 but non-foldable: it keeps Catalyst
    # from folding a cut-less (single-bucket) partition spec into an empty
    # one, which would both trip WindowExec's "No Partition Defined"
    # warning and force a true global window.
    pid = F.pmod(F.xxhash64(*[F.col(c) for c in ob]), F.lit(1)).cast("int")
    for t in cuts:
        pid = pid + F.coalesce((key >= _cut_lit(t)).cast("int"), F.lit(0))
    withpid = df.withColumn("_pid", pid)

    # Pass 2 (key columns only): per-bucket counts → cumulative offsets.
    # ≤ n rows, collected on the driver; safe to recompute because _pid is
    # deterministic. Replaces the old tiny constant-key window + broadcast
    # join (and its WindowExec warning) with an O(1) array lookup.
    counts = {
        r["_pid"]: r["_cnt"]
        for r in withpid.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    }
    offs: list[int] = []
    acc = 0
    for p in range(len(cuts) + 1):
        offs.append(acc)
        acc += counts.get(p, 0)
    off_expr = F.element_at(
        F.array(*[F.lit(o).cast("long") for o in offs]), F.col("_pid") + 1
    )

    w = Window.partitionBy("_pid").orderBy(*ob)
    return (
        withpid.withColumn("_rn", F.row_number().over(w))
        .withColumn(out, (F.col("_rn") + off_expr + F.lit(start - 1)).cast("long"))
        .drop("_pid", "_rn")
    )


def partitioned_sequential_id(df: DataFrame, out: str = "id", start: int = 1) -> DataFrame:
    """Dense global ids without a global sort, via per-partition offsets,
    fully JVM-side (no Python row round-trip).

    ``monotonically_increasing_id`` encodes (partition id << 33) +
    consecutive-from-0 record number; per-partition counts (≤ #partitions
    rows) collect to the driver and become cumulative offsets, broadcast
    back for ``id = offset + record#``. Order follows the current
    partition layout (not a business key) — use when density matters but
    a specific order does not; like any layout-dependent id, the input
    should be a deterministic lineage (e.g. a file scan), not the
    unordered output of a shuffle fetch. Scales linearly: one count pass
    + one map, no shuffle of the data itself."""
    spark = df.sparkSession
    rec_mask = (1 << 33) - 1
    df2 = df.withColumn("_mid", F.monotonically_increasing_id())
    counts = (
        df2.groupBy(F.shiftrightunsigned("_mid", 33).alias("_pid"))
        .agg(F.count("*").alias("_cnt"))
        .collect()
    )
    offs, acc = [], start
    for p, c in sorted((r["_pid"], r["_cnt"]) for r in counts):
        offs.append((p, acc))
        acc += c
    odf = spark.createDataFrame(offs or [(0, start)], "_pid long, _off long")
    return (
        df2.withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .join(F.broadcast(odf), "_pid")
        .withColumn(out, F.col("_mid").bitwiseAND(F.lit(rec_mask)) + F.col("_off"))
        .drop("_pid", "_mid", "_off")
    )
