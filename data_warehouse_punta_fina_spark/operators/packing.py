"""Sequence packing for training-data pipelines (north-star extension).

Before tokens reach a trainer they are packed into fixed-size budgets
(e.g. 4096-token sequences). The contiguous-greedy policy below is the
deterministic, shuffle-friendly variant: within a shard, documents are
taken in a stable order and a document starts in the bin its exclusive
cumulative token count falls into — so bin assignment is a pure function
of (shard, order, token counts) and reproduces bit-for-bit on any engine
or partitioning.

Scale shape: ONE window partitioned by the shard key (language here —
real pipelines shard by language/source/dedup-cluster anyway). No global
ordering; shards pack independently and in parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.functions.text import token_count, tokens


def pack_documents(
    df: DataFrame,
    budget: int = 512,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Assign each document to a (shard, bin) under a token budget.

    Output adds: ``n_tokens``, ``cum_before`` (exclusive running total in
    the shard), ``bin_id`` = cum_before div budget, ``offset_in_bin`` =
    cum_before % budget. A document longer than the budget still gets the
    bin its start falls in (the trainer's chunker splits it downstream) —
    packing never drops or reorders data.
    """
    n = tokens_col if tokens_col is not None else token_count(text_col)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("n_tokens", n).withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        out.withColumn("bin_id", F.expr(f"cum_before div {budget}").cast("int"))
        .withColumn("offset_in_bin", (F.col("cum_before") % budget).cast("int"))
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    counterpart to :func:`pack_documents` (packing combines short docs,
    chunking splits long ones): context-window preparation for training
    and retrieval pipelines. Chunk ``k`` of a document starts at token
    ``k·(chunk_tokens − overlap)`` and carries up to ``chunk_tokens``
    tokens; every chunk start strictly below the token count emits, so
    trailing partial chunks are kept (they carry the document's tail) and
    empty documents emit nothing.

    Scale shape: pure per-row array math (tokenize once, a sequence of
    chunk starts, one explode) — no shuffle at all until whatever
    consumes the chunks; the explode factor is ~n_tokens/stride per doc.
    Fully oracle-mirrorable: token slicing is deterministic, chunk ids
    are (doc, ordinal).
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens}); "
            "the stride would be zero or negative and chunking would not advance"
        )
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - F.lit(1), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    ex = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_tokens"),
    )
