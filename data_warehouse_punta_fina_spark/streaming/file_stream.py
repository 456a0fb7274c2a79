"""Structured Streaming wrappers (reference SURVEY.md §2.11).

The reference's ``StreamingBatchProcessor`` (`core/batch_processor.py:314-411`)
is chunked file iteration with checkpoint/resume, retry, and per-chunk
metrics. Spark-first mapping:

- chunks        → file-source micro-batches (``maxFilesPerTrigger``)
- checkpoint    → ``checkpointLocation`` (exactly-once resume)
- retry/timeout → ``spark.task.maxFailures`` (task-level, automatic)
- metrics       → ``StreamingQuery.lastProgress``

``trigger(availableNow=True)`` drains everything that exists then stops —
the batch-with-resume semantics the reference actually implements. True
streaming additions (watermarked event-time windows, stateful sessionize)
go beyond the reference: the batch-equivalent windowed aggregation lives
in __spark_entry__ (q_events_tumbling_window) with a SQL oracle; this
module provides the incremental execution of the same plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Checkpointable file-source stream (S5)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling window counts/sums with late-data watermark.

    Works identically on a batch or streaming DataFrame — the same plan
    both ways, which is the point of Structured Streaming.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.window(ts_col, window_duration).alias("w"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        # round-then-decimal per row before the sum: exact under any
        # partial-aggregation order (float sums are not)
        F.sum(F.round("value", 2).cast("decimal(15,2)")).cast("decimal(18,2)").alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("event_type"),
        F.col("n_events"),
        F.col("total_value"),
    )


def event_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    how: str = "inner",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream (or batch) event-time interval join: rows match when
    keys are equal and ``right_ts`` falls within [left_ts, left_ts +
    interval]. The §2.11 shape Spark bounds state with — the interval
    condition is what lets the engine EVICT buffered rows once the
    watermark passes their join window, instead of holding both streams
    forever.

    ``how='left_outer'`` additionally emits left rows that found no match,
    with nulls, AFTER the watermark passes their window — so unmatched
    results are delayed by the watermark, never wrong. Both inputs get
    ``watermark`` applied when streaming; join-state size is then bounded
    by (watermark + interval) of data per key. NOTE (join semantics, not a
    bug): the outer join's watermark is the MIN across both input streams
    — if one side simply stops receiving data, unmatched results stop
    flushing; production feeds emit heartbeats for exactly this reason
    (tests/test_streaming.py proves the flush with sentinel rows).

    The same expression on static frames is the batch equivalent — used as
    the oracle in tests. The four column names must be distinct across the
    two frames (alias before calling).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, how)


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    output_path: str,
    output_mode: str = "append",
    fmt: str = "parquet",
) -> StreamingQuery:
    """Drain-all-then-stop execution with resume-on-failure semantics
    (the reference's checkpointed chunk loop, `core/batch_processor.py:250-283`)."""
    q = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .option("path", output_path)
        .trigger(availableNow=True)
        .start()
    )
    return q
