"""Continuous filter-model scoring: Structured Streaming × the persisted
NB model.

The curation-filter deployment loop: documents arrive continuously; each
micro-batch is scored against the PERSISTED model (``nb_save_model`` —
trained once, scheme-fingerprinted) and routed keep/drop by the predicted
class and the decision margin. This is the streaming twin of
``doc_nb_persisted_classifier`` exactly as ``dedup_stream`` is the
streaming twin of the persisted band index: ``foreachBatch`` hosts the
batch-only pieces (the per-doc argmax window), and every per-batch output
lands in a partition keyed by the micro-batch id with dynamic partition
overwrite, so a replayed batch (failure between write and checkpoint
commit) overwrites its own partition — the idempotent-foreachBatch
exactly-once posture.

Scale shape per micro-batch: only the batch is tokenized (batch-sized
explode); the vocabulary-sized model broadcasts; nothing in the loop
re-reads the training corpus. The model is deliberately STATIC between
retrains (standard filter-model ops): admitting scored docs never
changes the scorer, so batches are independently replayable in any
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_warehouse_punta_fina_spark.operators.classify import nb_score_model

BATCH_COL = "ingest_batch"


def classify_stream_batch(
    batch: DataFrame,
    batch_id: int,
    model_dir: str,
    scores_path: str,
    keep_class: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_margin: float = 0.0,
) -> None:
    """Score ONE micro-batch against the persisted model and write the
    verdicts ``(id, predicted, margin, n_tokens, keep)`` to the batch's
    own partition. ``keep`` = predicted == ``keep_class`` AND margin ≥
    ``min_margin`` (the standard confidence-thresholded filter; margin
    is the exact decimal best-vs-second gap, so the threshold is
    engine-portable). Callable directly for batch-mode replay — the test
    replays the stream's own batch grouping through this function and
    asserts identical verdicts."""
    scored = nb_score_model(
        batch, model_dir, text_col=text_col, id_col=id_col, label_col=None
    )
    # margin is NULL when the persisted model has a single class (lead()
    # over one candidate row yields NULL) — coalesce the verdict to an
    # explicit False so such docs are visible drops, never NULL rows that
    # silently vanish from a downstream filter(keep).
    verdicts = scored.withColumn(
        "keep",
        F.coalesce(
            (F.col("predicted") == F.lit(keep_class))
            & (F.col("margin") >= F.lit(float(min_margin))),
            F.lit(False),
        ),
    )
    (
        verdicts.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(scores_path)
    )


def run_classify_stream(
    spark: SparkSession,
    input_path: str | None,
    schema: T.StructType | None,
    checkpoint_dir: str,
    model_dir: str,
    scores_path: str,
    keep_class: str,
    max_files_per_trigger: int = 1,
    stream: DataFrame | None = None,
    available_now: bool = True,
    **score_kwargs,
) -> StreamingQuery:
    """Drain ``input_path`` (availableNow) through the filter-model loop —
    or pass any streaming DataFrame via ``stream`` (foreachBatch is
    source-agnostic). Resume-safe: the checkpoint replays an uncommitted
    batch, whose partitioned overwrite makes the rerun idempotent."""
    from data_warehouse_punta_fina_spark.streaming.file_stream import read_file_stream

    if stream is None:
        if input_path is None or schema is None:
            raise ValueError("provide either stream= or (input_path, schema)")
        stream = read_file_stream(
            spark, input_path, schema, max_files_per_trigger=max_files_per_trigger
        )

    def _process(batch: DataFrame, batch_id: int) -> None:
        classify_stream_batch(
            batch,
            batch_id,
            model_dir=model_dir,
            scores_path=scores_path,
            keep_class=keep_class,
            **score_kwargs,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
