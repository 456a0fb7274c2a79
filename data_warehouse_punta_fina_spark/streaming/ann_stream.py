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


# ---------------------------------------------------------------------------
# IVF-PQ index MAINTENANCE stream (round-13) — continuous encode-only
# ingestion, completing the maintenance family (band index, NB model,
# positional, BM25 all stream; IVF-PQ was the one persisted index without
# a continuous-ingest path, VERDICT r12 "what's missing" #2). The design
# honors the quantizer-drift reality the roadmap documented: the stream
# NEVER retrains — quantizers are trained once on an init snapshot
# (:func:`ivfpq_stream_init`) and every micro-batch is encoded with them
# (Jégou et al. 2011 ops posture). Drift detection is the recall probe's
# job (``similarity.ivfpq_recall_probe`` — the freshness fingerprint
# tracks corpus identity, not quantizer fit); refresh orchestration
# rebuilds out-of-band when the probe reads below the trained floor.
# ---------------------------------------------------------------------------


def ivfpq_stream_init(
    train_corpus: DataFrame,
    index_dir: str,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> None:
    """Train the quantizers ONCE on a snapshot and lay an EMPTY
    stream-maintained index: centroids + codebook only — no codes, no
    fingerprint (every indexed vector arrives through
    :func:`ivfpq_maintenance_batch`, which establishes and merges the
    fingerprint epoch chain). The parameter fingerprint rides on the
    CODEBOOK's ``cid`` column metadata so batches can self-configure and
    searches can validate before/after any codes exist; each batch
    re-stamps it on its codes' ``scid`` (the batch-world discipline).

    The training snapshot need not equal the streamed corpus — that is
    the operational norm (train on day-0 data, ingest forever) and
    exactly why the drift probe exists."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        IVFPQ_SCHEME,
        kmeans_fit,
        pq_fit,
    )

    meta = {
        "scheme": IVFPQ_SCHEME,
        "n_cells": n_cells,
        "m": m,
        "n_centroids": n_centroids,
        "iters": iters,
        "dims": dims,
    }
    coarse = kmeans_fit(
        train_corpus, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col
    )
    coarse.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    cb = pq_fit(train_corpus, m, n_centroids, iters, id_col, vec_col, dims)
    cb.select(
        "sub", F.col("cid").alias("cid", metadata=meta), "cvec", "cn2"
    ).write.mode("overwrite").parquet(f"{index_dir}/codebook")


def ivfpq_maintenance_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Land ONE micro-batch of vectors in the maintained IVF-PQ index —
    encode-only with the STORED quantizers (`similarity.
    ivfpq_append_index`'s algebra) under the maintenance-stream
    discipline shared with BM25/NB (``streaming/epochs.py``):

    - codes land under ``codes/ingest_batch=<id>/cid=<c>`` with dynamic
      partition overwrite (idempotent replay; the plain batch append's
      ``mode("append")`` would DOUBLE-encode on replay, which is why the
      stream does not reuse it);
    - the content fingerprint — the one piece of global state — merges
      as EPOCHS (``fingerprint_epochs/epoch=<id>`` derived from the
      newest epoch strictly below ``batch_id``), and the flat
      ``fingerprint/`` the freshness checks read publishes LAST;
    - the batch-id regression guard refuses a reset checkpoint.

    The maintained index is content-identical to init-train +
    batch-world ``ivfpq_append_index`` of the same batches (same frozen
    quantizers, same encode) — searches are bit-equal, which the pytest
    pins. Caller contract: batch ids are disjoint from everything
    already streamed."""
    from data_warehouse_punta_fina_spark.operators.freshness import (
        fingerprint_row,
    )
    from data_warehouse_punta_fina_spark.operators.similarity import (
        IVFPQ_SCHEME,
        _assign,
        _assign_sub,
        _subvectors,
    )
    from data_warehouse_punta_fina_spark.functions.vectors import quantize
    from data_warehouse_punta_fina_spark.streaming.epochs import (
        guard_batch_regression,
        guard_stream_ownership,
        max_epoch_below,
        prune_epochs,
    )

    spark = batch.sparkSession
    # round-13 inverse guard: a batch-built index (root-level cid=*
    # codes) cannot be adopted in place
    guard_stream_ownership(spark, f"{index_dir}/codes")
    guard_batch_regression(
        spark,
        index_dir,
        int(batch_id),
        epoch_subdirs=("fingerprint_epochs",),
        batch_subdirs=("codes",),
    )
    coarse = spark.read.parquet(f"{index_dir}/centroids")
    cb = spark.read.parquet(f"{index_dir}/codebook")
    stored = dict(cb.schema["cid"].metadata or {})
    if stored.get("scheme") != IVFPQ_SCHEME:
        raise ValueError(
            "codebook carries no (or a foreign) parameter fingerprint "
            f"(stored scheme {stored.get('scheme')!r} != {IVFPQ_SCHEME!r}) — "
            "the maintained index must be initialized with ivfpq_stream_init "
            "so batches encode under validated parameters."
        )
    m, dims = int(stored["m"]), int(stored["dims"])

    cv = batch.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    cells = _assign(cv, coarse, id_col).select(id_col, "cid")
    codes = (
        _assign_sub(_subvectors(batch, id_col, vec_col, m, dims), cb, id_col)
        .select(id_col, "sub", F.col("cid").alias("scid"))
        .join(cells, id_col)
        .select(id_col, "sub", F.col("scid").alias("scid", metadata=stored), "cid")
    )
    (
        codes.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL, "cid")
        .parquet(f"{index_dir}/codes")
    )

    # ---- fingerprint epoch: pre-batch state ∪ batch, published last ----
    src = max_epoch_below(spark, f"{index_dir}/fingerprint_epochs", int(batch_id))
    if src is None:
        old_n, old_xor, old_sum = 0, 0, 0
    else:
        old = spark.read.parquet(
            f"{index_dir}/fingerprint_epochs/epoch={src}"
        ).collect()[0]
        old_n, old_xor, old_sum = int(old["fp_n"]), int(old["fp_xor"]), int(old["fp_sum"])
    bfp = fingerprint_row(batch, id_col, vec_col)
    merged = spark.range(1).select(
        F.lit(old_n + int(bfp["fp_n"])).cast("long").alias("fp_n"),
        F.lit(old_xor ^ int(bfp["fp_xor"])).cast("long").alias("fp_xor"),
        F.lit(str(old_sum + int(bfp["fp_sum"]))).cast("decimal(38,0)").alias("fp_sum"),
    )
    merged.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/fingerprint_epochs/epoch={int(batch_id)}"
    )
    (
        spark.read.parquet(f"{index_dir}/fingerprint_epochs/epoch={int(batch_id)}")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/fingerprint")
    )
    prune_epochs(spark, index_dir, ("fingerprint_epochs",), keep=2)


def run_ivfpq_maintenance_stream(
    spark: SparkSession,
    input_path: str | None,
    schema: T.StructType | None,
    checkpoint_dir: str,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
    stream: DataFrame | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Drain a vector stream through the IVF-PQ maintenance loop
    (:func:`ivfpq_maintenance_batch`; the index must be laid by
    :func:`ivfpq_stream_init` first). Resume-safe: an uncommitted batch
    replays, overwriting its own codes partitions and re-deriving its
    fingerprint epoch from pre-batch state."""
    from data_warehouse_punta_fina_spark.streaming.file_stream import read_file_stream

    if stream is None:
        if input_path is None or schema is None:
            raise ValueError("provide either stream= or (input_path, schema)")
        stream = read_file_stream(
            spark, input_path, schema, max_files_per_trigger=max_files_per_trigger
        )

    def _process(batch: DataFrame, batch_id: int) -> None:
        ivfpq_maintenance_batch(batch, batch_id, index_dir, id_col, vec_col)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
