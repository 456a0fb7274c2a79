"""Embedding-vector helpers (north-star similarity-search extensions).

Design note for oracle parity and cluster determinism: float summation is
order-dependent, so a distributed float dot product is not bit-stable. We
quantize components to integers (×1000, half-up) and do the dot/norm
arithmetic in exact int64 — bit-identical on any engine and any partition
layout — then take the final cosine in one double-precision division.
At 64 dims and |x|≤~10 the int64 accumulator cannot overflow
(64 · (10·1000)² = 6.4e9 ≪ 9.2e18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1000


def quantize(vec: Column | str) -> Column:
    """array<float> → array<long>, components floor(x·1000 + 0.5) —
    the same portable half-up primitive as functions.money.pround."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: F.floor(x.cast("double") * F.lit(QUANT) + F.lit(0.5)))


def dot_q(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_sq_q(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_q(a: Column, b: Column, a_norm_sq: Column | None = None, b_norm_sq: Column | None = None) -> Column:
    """Quantized cosine similarity in [-1, 1], rounded to 6 decimals.

    Pass precomputed squared norms to avoid recomputing per pair.
    """
    from data_warehouse_punta_fina_spark.functions.money import pround6

    nsa = a_norm_sq if a_norm_sq is not None else norm_sq_q(a)
    nsb = b_norm_sq if b_norm_sq is not None else norm_sq_q(b)
    return pround6(dot_q(a, b).cast("double") / F.sqrt(nsa.cast("double") * nsb.cast("double")))
