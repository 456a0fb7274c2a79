"""Multimodal (image/audio/video) column plumbing (north-star extensions).

Media ride through the engine as opaque ``binary`` payloads + typed
metadata (schemas.MEDIA_ASSET). Decode / feature-extraction runs in
Arrow-batched pandas via ``mapInPandas`` — the only sanctioned Python
path — so each task decodes a whole batch without per-row overhead, and
partitioning stays fully distributed (payloads never visit the driver).

The actual codec step is STUBBED: image/audio libraries are not in this
container. ``decode_stub=True`` (default) produces deterministic fake
features derived from the bytes; ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/librosa/ffmpeg) would slot
in. The Spark-side contract — schema, batch shape, partition pruning —
is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, header_word long, checksum long"
)


def media_from_documents(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Adapter: wrap the documents table as opaque media payloads so the
    binary plumbing is exercisable on the driver testdata (text bytes
    stand in for encoded media)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True, batch_size_hint: int = 256) -> DataFrame:
    """Decode+featurize each asset via Arrow-batched mapInPandas.

    Real deployment: replace the stub branch with the codec call (e.g.
    PIL.Image.open → resize → embed). The surrounding plumbing (binary
    batches in, feature rows out, 1:1) is the production shape.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/librosa/ffmpeg — not available in this container"
                )
            content = pdf["content"]
            n_bytes = content.map(lambda b: len(b) if b is not None else 0)
            header = content.map(
                lambda b: int.from_bytes(b[:4], "big") if b is not None and len(b) >= 4 else 0
            )
            checksum = content.map(lambda b: sum(b) % 1_000_000_007 if b is not None else 0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "header_word": header,
                    "checksum": checksum,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame via
    sequence+explode on metadata only — the heavy decode happens later in
    :func:`extract_features` per sampled frame. Keeps the row explosion
    JVM-side and prunable."""
    return media.withColumn(
        "frame_ms",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
    )
