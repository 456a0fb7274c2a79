"""Continuous lexical retrieval: Structured Streaming × the persisted
BM25 inverted index.

The fourth member of the persisted-artifact streaming family
(dedup_stream × band index, classify_stream × NB model, ann_stream ×
IVF-PQ index): queries arrive continuously as (query_id, term) rows —
e.g. freshly ingested documents looking for their lexical lookalikes —
and each micro-batch searches the PERSISTED inverted index
(``retrieval.bm25_build_index``: word count run once per corpus
snapshot, scheme-fingerprinted), never tokenizing the corpus in the
loop. ``foreachBatch`` hosts the batch-only pieces (the per-query top-k
window), and every per-batch result lands in a partition keyed by the
micro-batch id with dynamic partition overwrite, so a replayed batch
(failure between write and checkpoint commit) overwrites its own
partition — the idempotent-foreachBatch exactly-once posture shared by
all four streaming twins.

Scale shape per micro-batch: the batch's (query_id, term) rows
broadcast into the (bucket, term) join; the batch side carries a
streaming-source predicate, so dynamic partition pruning keeps the
postings scan at the batch's term buckets. The index is deliberately
STATIC between rebuilds — searches never mutate the searched structure,
so batches are independently replayable in any order (rebuild the
postings in a separate maintenance job when the corpus snapshot rolls,
exactly as the band index, NB model, and IVF-PQ index retrain
out-of-band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_warehouse_punta_fina_spark.operators.retrieval import bm25_search_index

BATCH_COL = "ingest_batch"


def bm25_stream_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    results_path: str,
    k: int = 5,
    **search_kwargs,
) -> None:
    """Search ONE micro-batch of (query_id, term) rows against the
    persisted inverted index and write (query_id, doc_id, score, rank)
    to the batch's own partition. Callable directly for batch-mode
    replay; the test replays the stream's own batch grouping through
    this function and asserts identical rankings."""
    results = bm25_search_index(batch, index_dir, k=k, **search_kwargs)
    (
        results.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(results_path)
    )


def run_bm25_stream(
    spark: SparkSession,
    input_path: str | None,
    schema: T.StructType | None,
    checkpoint_dir: str,
    index_dir: str,
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
        bm25_stream_batch(
            batch,
            batch_id,
            index_dir=index_dir,
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
