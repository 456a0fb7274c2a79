"""applyInPandasWithState: state must carry across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_state_accumulates_across_microbatches(spark, sf_dir, tmp_path):
    from data_warehouse_punta_fina_spark.sources.readers import load_table
    from data_warehouse_punta_fina_spark.streaming.stateful import running_user_totals

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # stage as TWO files so maxFilesPerTrigger=1 yields two micro-batches
    half = events.filter(F.col("event_id") % 2 == 0)
    other = events.filter(F.col("event_id") % 2 == 1)
    staged = str(tmp_path / "in")
    half.coalesce(1).write.mode("overwrite").parquet(staged)
    other.coalesce(1).write.mode("append").parquet(staged)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(staged)
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("SELECT * FROM stateful_out")
    # multiple micro-batches ran → at least one user appears twice
    per_user = got.groupBy("user_id").count()
    assert per_user.filter(F.col("count") >= 2).count() > 0
    # final running_rows per user equals the batch-side count
    final = got.groupBy("user_id").agg(F.max("running_rows").alias("rows"))
    want = events.groupBy("user_id").count()
    joined = final.join(want, "user_id")
    assert joined.filter(F.col("rows") != F.col("count")).count() == 0
    # running totals accumulate monotonically: batch deltas sum to the final
    sums = got.groupBy("user_id").agg(F.sum("batch_rows").alias("s"), F.max("running_rows").alias("m"))
    assert sums.filter(F.col("s") != F.col("m")).count() == 0


def test_transform_with_state_multi_state_vars(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas: ValueState totals + MapState
    per-type counts accumulate across micro-batches; final state matches
    the batch-side ground truth.

    ENV GATE: the transformWithState runtime speaks protobuf between the
    JVM state server and the Python driver worker
    (pyspark/sql/streaming/proto/StateMessage_pb2) — with no
    google.protobuf in the container the query crashes at schema
    validation, so this skips exactly like the openpyxl/PIL gates. The
    operator itself (streaming/stateful.user_activity_profile) is plain
    public-API code and unlocks by installing protobuf."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs protobuf for its state-server wire format",
    )
    from data_warehouse_punta_fina_spark.sources.readers import load_table
    from data_warehouse_punta_fina_spark.streaming.stateful import user_activity_profile

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    half = events.filter(F.col("event_id") % 2 == 0)
    other = events.filter(F.col("event_id") % 2 == 1)
    staged = str(tmp_path / "in")
    half.coalesce(1).write.mode("overwrite").parquet(staged)
    other.coalesce(1).write.mode("append").parquet(staged)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(staged)
    )
    out = user_activity_profile(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("SELECT * FROM tws_out")
    # at least one user spans both micro-batches
    assert got.groupBy("user_id").count().filter(F.col("count") >= 2).count() > 0
    final = got.groupBy("user_id").agg(
        F.max("running_rows").alias("rows"),
        F.max("n_types_seen").alias("types"),
    )
    want = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("event_type").alias("nt"),
    )
    j = final.join(want, "user_id")
    assert j.filter(F.col("rows") != F.col("n")).count() == 0
    assert j.filter(F.col("types") != F.col("nt")).count() == 0
