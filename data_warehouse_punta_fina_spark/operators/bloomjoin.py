"""Bloom-prefiltered semi-join — the classic semi-join reduction.

At warehouse scale the expensive part of ``big ⋉ small`` is shuffling
``big`` on the join key. When ``small``'s key SET is too large to
broadcast as rows but its BLOOM FILTER is not (m bits ≈ 10·|small| for
~1% false positives), the scalable plan is:

1. build a Bloom bitmap from ``small``'s keys (one aggregation,
   m/64 int64 words);
2. broadcast the bitmap and pre-filter ``big`` locally — no shuffle,
   eliminates ~all non-matching rows at the scan;
3. run the EXACT semi-join on the survivors only, so the shuffle moves
   candidate rows instead of the whole table and false positives drop
   out.

The result is therefore EXACTLY ``big ⋉ small`` (the Bloom stage is
perf-only), which keeps the operator oracle-checkable. Spark's own
runtime-filter does this invisibly for some shapes; this operator makes
the technique explicit, tunable, and usable where the optimizer won't
inject it (e.g. ahead of an aggregation or a non-equi post-filter).

Implementation is pure DataFrame ops (``bloom_filter_agg`` is not in
the public function registry): word-indexed bitmap via ``bit_or``
grouping, broadcast as ≤ m/64 rows, membership = all ``hashes`` probe
bits set. Hash h_i(key) = xxhash64(key, seed=i) mod m — independent
seeds, the standard double-hashing-free construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probe_positions(key, m_bits: int, hashes: int):
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(hashes)]


def bloom_bitmap(small: DataFrame, key: str, m_bits: int = 1 << 20, hashes: int = 2) -> DataFrame:
    """(word_id, word): the Bloom bitmap of ``small[key]`` as int64
    words — at most m_bits/64 rows, built with one hash aggregation."""
    bits = small.select(
        F.explode(F.array(*_probe_positions(F.col(key), m_bits, hashes))).alias("_pos")
    )
    # shiftleft by a COLUMN needs the SQL form (the pyspark wrapper only
    # takes a literal bit count)
    return bits.select(
        (F.col("_pos") / 64).cast("long").alias("word_id"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))").alias("_bit"),
    ).groupBy("word_id").agg(F.bit_or("_bit").alias("word"))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = 1 << 20,
    hashes: int = 2,
) -> DataFrame:
    """``big ⋉ small`` with a broadcast-Bloom pre-filter (exact result;
    see module docstring for when this beats a plain semi-join)."""
    small_key = small_key or big_key
    bitmap = bloom_bitmap(small, small_key, m_bits, hashes)
    cand = big
    for i, pos in enumerate(_probe_positions(F.col(big_key), m_bits, hashes)):
        probe = bitmap.select(
            F.col("word_id").alias(f"_w{i}"), F.col("word").alias(f"_word{i}")
        )
        probe_bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p{i}, 64) AS INT))"
        )
        cand = (
            cand.withColumn(f"_p{i}", pos)
            .join(
                F.broadcast(probe),
                (F.col(f"_p{i}") / 64).cast("long") == F.col(f"_w{i}"),
                "left",
            )
            .filter(
                F.col(f"_word{i}").isNotNull()
                & (F.col(f"_word{i}").bitwiseAND(probe_bit) != 0)
            )
            .drop(f"_p{i}", f"_w{i}", f"_word{i}")
        )
    # exact verification pass removes Bloom false positives
    return cand.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        big_key,
        "left_semi",
    )
