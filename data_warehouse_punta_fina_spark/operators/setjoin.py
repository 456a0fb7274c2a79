"""Lossless set-similarity join via prefix filtering (PPJoin family).

`prefix_jaccard_join` finds ALL document pairs with token-set Jaccard ≥
t — exactly, unlike the MinHash/LSH tier (`operators/dedup`), which
trades recall for candidate count. The prefix-filtering principle
(Chaudhuri et al. 2006 "A Primitive Operator for Similarity Joins";
Xiao et al. 2008 PPJoin): order every document's tokens by a GLOBAL
rarity order (document frequency asc, token asc as tiebreak); if two
sets have Jaccard ≥ t they MUST share a token within each other's first
``|x| − ⌈t·|x|⌉ + 1`` tokens, so joining only on prefix tokens loses
nothing. Rare-token prefixes keep the candidate join sparse — the
inverted-index join runs on the least frequent tokens instead of all of
them (stopwords never enter a prefix at any realistic t).

Scale shape: one tokenize, one df aggregate, per-doc windows are
doc-sized; the candidate join is prefix×prefix (rare tokens → short
posting lists); verification joins candidates back to full token sets
(Σ|A| over candidates). All counts exact int64; the one division
round-6s. The exactness guarantee is pytest-pinned against the brute
all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.functions.money import pround6
from data_warehouse_punta_fina_spark.functions.text import tokens


def prefix_jaccard_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ ``threshold`` —
    exact. Output: (id_a, id_b, n_a, n_b, intersection, jaccard)."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "tok")
    ordered = (
        toks.join(dfreq, "tok")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("_id")))
    )
    # prefix length n − ⌈t·n⌉ + 1: any qualifying pair must collide here
    prefix = ordered.filter(
        F.col("_rn") <= F.col("_n") - F.ceil(F.col("_n") * F.lit(threshold)) + 1
    )
    # PPJoin length filter: J(A,B) ≥ t forces t·|A| ≤ |B| ≤ |A|/t, so
    # cross-length prefix collisions drop BEFORE the distinct/verify
    # stages (lossless, like the prefix itself)
    pa_ = prefix.select(F.col("_id").alias("id_a"), "tok", F.col("_n").alias("_na"))
    pb_ = prefix.select(F.col("_id").alias("id_b"), "tok", F.col("_n").alias("_nb"))
    cand = (
        pa_.join(pb_, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_nb").cast("double") >= F.lit(threshold) * F.col("_na"))
            & (F.col("_na").cast("double") >= F.lit(threshold) * F.col("_nb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = toks.select(F.col("_id").alias("id_a"), "tok")
    tb = toks.select(F.col("_id").alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a").join(tb, ["id_b", "tok"]).groupBy("id_a", "id_b").agg(
            F.count("*").alias("intersection")
        )
    )
    sizes = toks.groupBy("_id").agg(F.count("*").alias("_n"))
    out = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")), "id_b")
    )
    jac = F.col("intersection").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("intersection")
    ).cast("double")
    return out.filter(jac >= F.lit(threshold)).select(
        "id_a", "id_b", "n_a", "n_b", "intersection", pround6(jac).alias("jaccard")
    )
