"""Structured Streaming wrapper tests (SURVEY.md §2.11): the streamed
windowed aggregation equals the batch plan, and checkpointed availableNow
runs drain-then-stop with resume semantics."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def _events_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    from data_warehouse_punta_fina_spark.sources.readers import load_table
    from data_warehouse_punta_fina_spark.streaming.file_stream import (
        read_file_stream,
        tumbling_window_agg,
    )

    # stage the events table as a clean parquet dir the file source can list
    events = load_table(spark, sf_dir, "events").drop("props")
    staged = str(tmp_path / "events_in")
    events.write.mode("overwrite").parquet(staged)

    stream = read_file_stream(spark, staged, _events_schema(), max_files_per_trigger=4)
    agg = tumbling_window_agg(stream, "1 hour", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # complete mode: the final micro-batch result IS the full aggregation —
    # identical plan batch vs stream (the Structured Streaming contract)
    got = spark.sql("SELECT * FROM stream_out")
    want = tumbling_window_agg(events, "1 hour")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_available_now_checkpoint_resume(spark, sf_dir, tmp_path):
    from data_warehouse_punta_fina_spark.sources.readers import load_table
    from data_warehouse_punta_fina_spark.streaming.file_stream import (
        read_file_stream,
        run_available_now,
    )

    events = load_table(spark, sf_dir, "events").drop("props")
    staged = str(tmp_path / "in")
    events.limit(100).write.mode("overwrite").parquet(staged)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    stream = read_file_stream(spark, staged, _events_schema())
    q = run_available_now(stream.select("event_id", "event_type", "value"), ckpt, out)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == 100

    # re-run with the same checkpoint: nothing new → no duplicates (resume)
    stream2 = read_file_stream(spark, staged, _events_schema())
    q2 = run_available_now(stream2.select("event_id", "event_type", "value"), ckpt, out)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1

    shutil.rmtree(ckpt, ignore_errors=True)
    assert os.path.exists(out)
