"""Continuous similarity search: Structured Streaming × the persisted
IVF-PQ index.

Completes the persisted-index streaming triad (dedup_stream over the
band index, classify_stream over the NB model): query vectors arrive
continuously — e.g. freshly embedded documents looking for their corpus
neighbors — and each micro-batch searches the PERSISTED IVF-PQ index
(``ivfpq_build_index``: trained once, parameter-fingerprinted), never
retraining anything in the loop. ``foreachBatch`` hosts the batch-only
pieces (the per-query top-k window), and every per-batch result lands in
a partition keyed by the micro-batch id with dynamic partition
overwrite, so a replayed batch (failure between write and checkpoint
commit) overwrites its own partition — the idempotent-foreachBatch
exactly-once posture shared by all three streaming twins.

Scale shape per micro-batch: the batch's query vectors broadcast into
the cell join; dynamic partition pruning keeps the codes scan at
``probes`` cells per query; the exact rerank joins only ``rerank``
corpus vectors per query by id. The index is deliberately STATIC between
rebuilds — searches never mutate the searched structure, so batches are
independently replayable in any order (append new corpus vectors via
``ivfpq_append_index`` in a separate maintenance job, exactly as the
band index and NB model retrain out-of-band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_warehouse_punta_fina_spark.operators.similarity import ivfpq_search_index

BATCH_COL = "ingest_batch"


def ann_stream_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    corpus: DataFrame,
    results_path: str,
    k: int = 5,
    **search_kwargs,
) -> None:
    """Search ONE micro-batch of query vectors against the persisted
    index and write (query_id, neighbor_id, cosine, rank) to the batch's
    own partition. ``corpus`` supplies only the exact-rerank vectors (an
    id-keyed join — the codes scan stays cell-pruned). Callable directly
    for batch-mode replay; the test replays the stream's own batch
    grouping through this function and asserts identical neighbors."""
    results = ivfpq_search_index(batch, corpus, index_dir, k=k, **search_kwargs)
    (
        results.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(results_path)
    )


def run_ann_stream(
    spark: SparkSession,
    input_path: str | None,
    schema: T.StructType | None,
    checkpoint_dir: str,
    index_dir: str,
    corpus: DataFrame,
    results_path: str,
    k: int = 5,
    max_files_per_trigger: int = 1,
    stream: DataFrame | None = None,
    available_now: bool = True,
    **search_kwargs,
) -> StreamingQuery:
    """Drain ``input_path`` (availableNow) through the persisted-index
    search loop — or pass any streaming DataFrame via ``stream``
    (foreachBatch is source-agnostic). Resume-safe: the checkpoint
    replays an uncommitted batch, whose partitioned overwrite makes the
    rerun idempotent."""
    from data_warehouse_punta_fina_spark.streaming.file_stream import read_file_stream

    if stream is None:
        if input_path is None or schema is None:
            raise ValueError("provide either stream= or (input_path, schema)")
        stream = read_file_stream(
            spark, input_path, schema, max_files_per_trigger=max_files_per_trigger
        )

    def _process(batch: DataFrame, batch_id: int) -> None:
        ann_stream_batch(
            batch,
            batch_id,
            index_dir=index_dir,
            corpus=corpus,
            results_path=results_path,
            k=k,
            **search_kwargs,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
