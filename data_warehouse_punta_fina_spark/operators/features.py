"""Feature extraction for downstream ML (the hashing trick).

``feature_hashing`` maps a token stream into a FIXED-dimension signed
count vector (Weinberger et al. 2009, "Feature Hashing for Large Scale
Multitask Learning"): index = h(token) mod d, sign = ±1 from an
independent hash bit, value = Σ sign over occurrences. No vocabulary,
no fit step, no driver state — the property that makes it the default
text featurizer at corpus scale (a vocabulary dictionary would itself
be a 100 TB-era shuffle + broadcast problem).

Determinism is the repo's md5 idiom (`operators/sampling.weighted_sample`,
`_hex13` on the oracle side): index from the first 13 hex digits of
md5(token) (exact int64), sign from the parity of the 14th digit —
bit-identical on any engine, unlike engine-native hash() functions
(Spark xxhash64 has no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.functions.text import tokens


def feature_hashing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dims: int = 16,
) -> DataFrame:
    """(id, features): ``dims``-dimension signed hashed token counts.

    One explode + one (id, index) aggregate + one per-id regroup; the
    dense vector assembles via a dims-sized sequence transform against
    an index→value map, so absent indexes are explicit zeros. Every id
    in ``df`` appears in the output (empty token streams → zero
    vectors).
    """
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    h13 = F.conv(F.substring(F.md5("_t"), 1, 13), 16, 10).cast("long")
    sign_digit = F.conv(F.substring(F.md5("_t"), 14, 1), 16, 10).cast("long")
    hashed = tok.select(
        id_col,
        F.pmod(h13, F.lit(dims)).cast("int").alias("_ix"),
        (F.lit(1) - 2 * F.pmod(sign_digit, F.lit(2))).cast("long").alias("_sg"),
    )
    per_ix = hashed.groupBy(id_col, "_ix").agg(F.sum("_sg").alias("_v"))
    vec = per_ix.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_ix", "_v"))).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("int")), F.lit(0)),
    )
    out = vec.select(F.col(id_col), dense.alias("features"))
    # ids whose text tokenized to nothing still get a zero vector
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(dims)])
    all_ids = df.select(id_col).distinct()
    return all_ids.join(out, id_col, "left").select(
        id_col, F.coalesce(F.col("features"), zeros).alias("features")
    )
