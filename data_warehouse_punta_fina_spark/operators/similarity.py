"""Similarity search over embedding columns (north-star extensions).

Two tiers, matching how a 100 TB corpus is actually searched:

- :func:`brute_force_topk` — exact cosine top-k. O(|Q|·|N|) pairs; fine
  when the query set is small (broadcast) even if the corpus is huge:
  the corpus is scanned once, map-side, and only the per-partition top-k
  survive the shuffle (window over small candidate set).
- :func:`ivf_topk` — IVF/LSH-bucketed approximate search: vectors are
  assigned to a coarse bucket (sign-bit code over leading dims); search
  touches only the query's bucket. Recall < 1.0, cost ~1/2^bits.

All arithmetic uses the quantized-int scheme from functions/vectors.py so
results are deterministic under any partitioning (see that module's note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.functions.vectors import cosine_q, dot_q, norm_sq_q, quantize
from data_warehouse_punta_fina_spark.operators.freshness import (
    StaleIndexError,
    content_fingerprint,
    fingerprint_row,
    merge_fingerprints,
    rows_match,
)


def _prepare(df: DataFrame, id_col: str, vec_col: str, bucket_bits: int | None = None) -> DataFrame:
    """One projection: quantized vector + squared norm (+ optional coarse
    bucket) — computed together so later stages never re-touch the raw
    embedding column."""
    q = quantize(vec_col)
    cols = [F.col(id_col), q.alias("qvec"), norm_sq_q(q).alias("nsq")]
    if bucket_bits is not None:
        cols.append(sign_bucket(vec_col, bucket_bits).alias("bucket"))
    return df.select(*cols)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every row of ``queries``.

    Output: (query_id, neighbor_id, cosine, rank). Self-matches excluded.
    The small side (queries) is broadcast; the corpus is never shuffled
    until the per-query candidate reduction.
    """
    qid = query_id_col or id_col
    c = _prepare(corpus, id_col, vec_col).alias("c")
    q = _prepare(queries, qid, vec_col).withColumnRenamed(qid, "query_id").alias("q")
    pairs = c.join(F.broadcast(q), F.col(f"c.{id_col}") != F.col("query_id"))
    scored = pairs.select(
        F.col("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        cosine_q(F.col("q.qvec"), F.col("c.qvec"), F.col("q.nsq"), F.col("c.nsq")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sign_bucket(vec_col: Column | str, bits: int = 4) -> Column:
    """Coarse LSH bucket id: sign bits of the first ``bits`` components.
    A stand-in for trained IVF centroids that stays deterministic and
    engine-portable; 2^bits buckets.

    Occupancy bound: with b bits, the expected within-bucket pair count of
    a self-join is ~N²/2^b (uniform signs) — bits must grow with corpus
    size. 4 bits = 16 buckets is test-scale only; at 100 TB use ≥ 16 bits
    (65k buckets) or trained centroids, plus multiprobe on the query side
    to recover recall."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(v.getItem(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only within the query's coarse bucket(s).

    At scale the corpus is written bucketed/partitioned by ``bucket`` so a
    query probes one partition (partition pruning) instead of the full
    scan — the IVF index pattern expressed relationally.

    ``multiprobe`` additionally probes every Hamming-1 neighbor of the
    query's bucket (``bits`` extra probes — the standard multi-probe LSH
    recall recovery): a query near a sign boundary still reaches the
    adjacent cell, so ``bits`` can be raised (smaller buckets, cheaper
    scan) without the recall cliff of single-probe.
    """
    c = _prepare(corpus, id_col, vec_col, bucket_bits=bits).alias("c")
    q = _prepare(queries, id_col, vec_col, bucket_bits=bits).withColumnRenamed(id_col, "query_id")
    if multiprobe:
        probes = F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
        q = q.withColumn("bucket", F.explode(probes))
    q = q.alias("q")
    pairs = c.join(F.broadcast(q), (F.col("c.bucket") == F.col("q.bucket")) & (F.col(f"c.{id_col}") != F.col("query_id")))
    scored = pairs.select(
        F.col("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        cosine_q(F.col("q.qvec"), F.col("c.qvec"), F.col("q.nsq"), F.col("c.nsq")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _sq_dist_q(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two quantized int64 vectors.
    Integer arithmetic end-to-end — no float summation order to disagree
    on across engines (same design as functions.vectors.cosine_q)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means over quantized vectors → (cid, cvec).

    The trained-centroid upgrade over :func:`sign_bucket` (round-1 verdict:
    sign bits are a stand-in; real IVF trains centroids). Every step is
    engine-portable and partition-order independent:

    - init: the ``k`` vectors with the smallest ids (no RNG);
    - assign: exact int64 squared-L2 argmin, ties to the smaller cid;
    - update: component-wise mean ROUNDED to int64 —
      ``floor((2·sum + n) / (2n))`` — so the next iteration's distances
      stay exact integers (quantized centroids, standard IVF practice);
    - clusters that lose all members drop out (both engines agree).

    Shape per iteration: one broadcast of k centroids + one shuffle of
    (cid, pos, component) for the update agg — corpus vectors are never
    shuffled whole, and nothing depends on a global sort.
    """
    v = corpus.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    # orderBy+limit (TakeOrdered: per-partition top-k + driver merge, no
    # global sort) — NOT filter(id < k), which silently yields < k centroids
    # on sparse or 1-based id domains
    cent = (
        v.orderBy(id_col).limit(k)
        .select(F.col(id_col).alias("cid"), F.col("qvec").alias("cvec"))
    )
    for _ in range(iters):
        assigned = _assign(v, cent, id_col)
        pos = assigned.select(
            "cid", F.posexplode("qvec").alias("pos", "q")
        )
        stats = pos.groupBy("cid", "pos").agg(
            F.sum("q").alias("s"), F.count("*").alias("n")
        )
        comp = stats.withColumn(
            "c",
            F.floor((2 * F.col("s") + F.col("n")) / (2 * F.col("n"))).cast("long"),
        )
        cent = comp.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda t: t["c"]
            ).alias("cvec")
        )
    return cent


def _assign(v: DataFrame, cent: DataFrame, id_col: str, probes: int = 1) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, exact int64
    argmin with deterministic (dist, cid) tie-break. ``probes > 1`` keeps
    the p nearest cells (multi-probe for the QUERY side of IVF search —
    corpus rows always live in exactly one cell)."""
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "dist", _sq_dist_q(F.col("qvec"), F.col("cvec"))
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= probes)
        .select(id_col, "qvec", "cid")
    )


def ivf_trained_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
    centroids_path: str | None = None,
) -> DataFrame:
    """Approximate top-k over a TRAINED coarse quantizer: fit k-means on
    the corpus, assign corpus and queries to their nearest centroid, and
    search only within the query's cell(s). At warehouse scale the corpus
    is written partitioned by ``cid`` so a query probes ``probes``
    partitions — the real IVF index (with standard nprobe), not the
    sign-bit stand-in. Recall/scan trade measured in tools/ann_recall.py.
    ``centroids_path`` durably materializes the trained centroids to
    parquet (reusable index, survives executor loss); default is an
    ephemeral local checkpoint."""
    from data_warehouse_punta_fina_spark.operators.materialize import materialize

    cent = kmeans_fit(corpus, k=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col)
    cent = materialize(cent, centroids_path)  # reused by both assigns
    cv = corpus.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    c_assigned = _assign(cv, cent, id_col).withColumn("nsq", norm_sq_q(F.col("qvec")))
    q_assigned = (
        _assign(
            queries.select(F.col(id_col), quantize(vec_col).alias("qvec")),
            cent,
            id_col,
            probes=probes,
        )
        .withColumnRenamed(id_col, "query_id")
        .withColumn("nsq", norm_sq_q(F.col("qvec")))
    )
    c = c_assigned.alias("c")
    q = q_assigned.alias("q")
    pairs = c.join(
        F.broadcast(q),
        (F.col("c.cid") == F.col("q.cid")) & (F.col(f"c.{id_col}") != F.col("query_id")),
    )
    scored = pairs.select(
        F.col("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        cosine_q(F.col("q.qvec"), F.col("c.qvec"), F.col("q.nsq"), F.col("c.nsq")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(F.col("rank") <= k)


def embedding_near_dup_pairs_trained(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs blocked by TRAINED k-means cells instead of
    sign buckets: cells follow the data's density (measured 2.8× the
    recall of sign buckets at equal scan fraction — tools/ann_recall.py),
    so the within-cell self-join finds more true near-dups for the same
    pair budget. Same deterministic Lloyd fit as :func:`ivf_trained_topk`."""
    cent = kmeans_fit(df, k=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col)
    v = df.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    assigned = (
        _assign(v, cent.localCheckpoint(eager=False), id_col)
        .withColumn("nsq", norm_sq_q(F.col("qvec")))
        .localCheckpoint(eager=False)
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    return (
        a.join(b, (F.col("a.cid") == F.col("b.cid")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_q(F.col("a.qvec"), F.col("b.qvec"), F.col("a.nsq"), F.col("b.nsq")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
) -> DataFrame:
    """Near-duplicate detection by embedding cosine ≥ threshold, bucketed
    by the coarse code so the self-join is block-diagonal rather than a
    full cross product (the standard blocking trick for pairwise dedup)."""
    # self-join: materialize the quantized projection once for both branches
    p = _prepare(df, id_col, vec_col, bucket_bits=bits).localCheckpoint(eager=False)
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_q(F.col("a.qvec"), F.col("b.qvec"), F.col("a.nsq"), F.col("b.nsq")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def projection_matrix(
    spark, in_dims: int, out_dims: int, seed: str = "jl"
) -> DataFrame:
    """Deterministic ±1 random-projection matrix as a tiny DataFrame
    (pos, out_dim, sign) — in_dims·out_dims rows, broadcastable at any
    scale. Signs derive from md5 of "{seed}|{pos}|{out_dim}": the SAME
    digest any engine computes, so an external oracle can rebuild the
    identical matrix (sign = +1 iff the first hex nibble is even).
    Achlioptas (2003) shows ±1 entries satisfy the Johnson-Lindenstrauss
    lemma like Gaussians do — and they keep the arithmetic exact int64."""
    import hashlib

    rows = [
        (
            p,
            k,
            1 if int(hashlib.md5(f"{seed}|{p}|{k}".encode()).hexdigest()[0], 16) % 2 == 0 else -1,
        )
        for p in range(in_dims)
        for k in range(out_dims)
    ]
    return spark.createDataFrame(rows, "pos int, out_dim int, sign int")


def random_projection(
    emb: DataFrame,
    out_dims: int = 16,
    in_dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dims`` deterministic ±1 directions. The 100 TB
    play for ANN/near-dup over wide embeddings: a 64→16 reduction cuts
    every downstream dot product 4× while JL preserves pairwise
    distances within ~ε for out_dims = O(ln n / ε²); run the cheap
    search in the reduced space, re-rank survivors in the original.

    Scale shape: posexplode the quantized vector (rows × in_dims), join
    the broadcast matrix (in_dims·out_dims rows), ONE combiner-reduced
    sum keyed by (id, out_dim) — exact int64 arithmetic end-to-end
    (qv ≤ 10⁴, 64 terms ⇒ |sum| ≤ 6.4e5·signs, far from overflow), so
    the result is bit-identical under any partitioning and any engine.
    Output: (vec_id, out_dim, value) rows with value = sum(qv·sign)/1000
    round-6'd — row form keeps the oracle a plain GROUP BY; pivot to an
    array column downstream with collect_list over a sorted struct if an
    array is needed.
    """
    from data_warehouse_punta_fina_spark.functions.money import pround
    from data_warehouse_punta_fina_spark.functions.vectors import QUANT, quantize

    mat = projection_matrix(emb.sparkSession, in_dims, out_dims, seed)
    exploded = emb.select(
        F.col(id_col), F.posexplode(quantize(vec_col)).alias("pos", "qv")
    )
    return (
        exploded.join(F.broadcast(mat), "pos")
        .groupBy(id_col, "out_dim")
        .agg(F.sum(F.col("qv") * F.col("sign")).alias("_acc"))
        .select(
            F.col(id_col),
            F.col("out_dim").cast("int").alias("out_dim"),
            pround(F.col("_acc").cast("double") / F.lit(float(QUANT)), 6, 15)
            .cast("double")
            .alias("value"),
        )
    )


def sq8_fit(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """FIT half of int8 scalar quantization (the FAISS ``SQ8`` /
    Milvus ``IVF_SQ8`` compression tier): one row with per-dimension
    quantized ``lo``/``hi`` bounds (int64 arrays, ×1000 scale). The model
    is tiny (2·d ints), broadcastable, persistable — codes encode any
    later batch against the SAME bounds.

    All integer: per-dim min/max over the quantized components (one
    posexplode + map-side-combined groupBy(pos), re-assembled with
    array_sort — never collect_list order)."""
    ex = corpus.select(F.posexplode(quantize(vec_col)).alias("pos", "qx"))
    per = ex.groupBy("pos").agg(F.min("qx").alias("lo"), F.max("qx").alias("hi"))
    return per.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lo"))), lambda s: s["lo"]
        ).alias("lo"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "hi"))), lambda s: s["hi"]
        ).alias("hi"),
    )


def _sq8_xhat(qvec, lo, hi):
    """Reconstructed vector at ×255 scale, pure int64: code_i = half-up
    round of (x_i−lo_i)·255/span_i (integer rational rounding —
    floor((2n+d)/2d); constant dims code 0), then x̂·255 = lo·255 +
    code·span. Exact on both engines; scale factors cancel in cosine."""
    spans = F.zip_with(hi, lo, lambda h, l: h - l)
    deltas = F.zip_with(qvec, lo, lambda x, l: x - l)
    codes = F.zip_with(
        deltas,
        spans,
        lambda d, s: F.when(s == 0, F.lit(0).cast("long")).otherwise(
            F.floor((d * 510 + s).cast("double") / (s * 2).cast("double")).cast("long")
        ),
    )
    return F.zip_with(
        F.zip_with(codes, spans, lambda c, s: c * s), lo, lambda cs, l: cs + l * 255
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """ANN top-k over int8 scalar-quantized codes with EXACT re-ranking —
    the memory-compression tier next to the blocking tiers (sign buckets,
    trained IVF): codes are d bytes instead of 4d, so the full-corpus
    approximate scan reads ~4× less and the exact float path touches only
    ``rerank`` candidates per query.

    Stage 1 scores every (query, code) pair with the asymmetric distance
    (query at full precision × reconstructed x̂ — integer-exact dot/norms,
    one double division, round-6) and keeps the top ``rerank`` per query;
    stage 2 re-scores ONLY those candidates with the exact quantized
    cosine and emits the top ``k``. Output matches
    :func:`brute_force_topk`: (query_id, neighbor_id, cosine, rank) with
    EXACT cosines — SQ8 affects which candidates survive, never the
    reported score. Both fit and queries broadcast; the corpus shuffles
    only the per-query candidate reductions.
    """
    qid = query_id_col or id_col
    fit = sq8_fit(corpus, vec_col)
    enc = corpus.crossJoin(F.broadcast(fit)).select(
        F.col(id_col),
        _sq8_xhat(quantize(vec_col), F.col("lo"), F.col("hi")).alias("xhat"),
    )
    enc = enc.select(id_col, "xhat", norm_sq_q(F.col("xhat")).alias("xn"))
    q = _prepare(queries, qid, vec_col).withColumnRenamed(qid, "query_id")
    approx = (
        enc.alias("c")
        .join(F.broadcast(q.alias("q")), F.col(id_col) != F.col("query_id"))
        .select(
            F.col("query_id"),
            F.col(id_col).alias("neighbor_id"),
            cosine_q(F.col("q.qvec"), F.col("c.xhat"), F.col("q.nsq"), F.col("c.xn")).alias(
                "approx"
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = approx.withColumn("_r", F.row_number().over(wa)).filter(F.col("_r") <= rerank)
    cq = _prepare(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    exact = (
        cand.select("query_id", "neighbor_id")
        .join(cq.alias("c"), "neighbor_id")
        .join(F.broadcast(q.alias("q")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_q(F.col("q.qvec"), F.col("c.qvec"), F.col("q.nsq"), F.col("c.nsq")).alias(
                "cosine"
            ),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (the FAISS PQ / IVF-PQ compression tier)
# ---------------------------------------------------------------------------


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, dims: int) -> DataFrame:
    """(id, sub, sv): each quantized vector split into ``m`` contiguous
    subvectors of dims/m components. One projection + one explode of an
    m-element array — the raw embedding column is touched once.

    ``dims`` is verified against every vector inline (JVM-side branch,
    no extra job): a wrong ``dims`` would otherwise make ``F.slice``
    silently emit truncated/empty subvectors and train a garbage
    codebook (ADVICE r5)."""
    d_sub = dims // m
    q0 = quantize(vec_col)
    q = F.when(F.size(q0) == dims, q0).otherwise(
        F.raise_error(
            F.concat(
                F.lit("pq: embedding length "),
                F.size(q0).cast("string"),
                F.lit(f" != dims={dims}"),
            )
        )
    )
    subs = F.array(
        *[
            F.struct(F.lit(s).alias("sub"), F.slice(q, s * d_sub + 1, d_sub).alias("sv"))
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(subs).alias("_s")).select(
        id_col, F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv")
    )


def pq_fit(
    corpus: DataFrame,
    m: int = 4,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``m`` subvectors and k-means each subspace independently — a vector
    is then representable as ``m`` small codes (m bytes at k≤256) instead
    of 4·dims bytes, the compression tier below SQ8 (:func:`sq8_fit`).

    All ``m`` subspace fits run as ONE grouped Lloyd iteration chain —
    rows are (vec_id, sub, sv) and every step groups by ``sub``, so the
    m codebooks train in a single pass over the corpus per iteration
    (never m sequential jobs). Determinism matches :func:`kmeans_fit`:
    seeds are the n_centroids smallest ids' subvectors (no RNG), exact
    int64 squared-L2 argmin with (dist, cid) tie-break, means rounded to
    int64 via floor((2s+n)/(2n)), emptied clusters drop out.

    Returns (sub, cid, cvec, cn2): the codebook plus each centroid's
    precomputed squared norm (int64) — the ADC scorer needs it for the
    reconstructed-vector norm and it costs one array fold here vs one
    per corpus row later.
    """
    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must be divisible by m ({m})")
    vs = _subvectors(corpus, id_col, vec_col, m, dims)
    # seed ids chosen once, globally (TakeOrdered — no global sort), then
    # the per-sub seed codebooks are those ids' subvectors
    seed_ids = corpus.select(id_col).orderBy(id_col).limit(n_centroids)
    cent = vs.join(F.broadcast(seed_ids), id_col).select(
        "sub", F.col(id_col).alias("cid"), F.col("sv").alias("cvec")
    )
    for _ in range(iters):
        assigned = _assign_sub(vs, cent, id_col)
        pos = assigned.select("sub", "cid", F.posexplode("sv").alias("pos", "q"))
        stats = pos.groupBy("sub", "cid", "pos").agg(
            F.sum("q").alias("s"), F.count("*").alias("n")
        )
        comp = stats.withColumn(
            "c", F.floor((2 * F.col("s") + F.col("n")) / (2 * F.col("n"))).cast("long")
        )
        cent = comp.groupBy("sub", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda t: t["c"]
            ).alias("cvec")
        )
    return cent.withColumn("cn2", norm_sq_q(F.col("cvec")))


def _assign_sub(vs: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """Per-(vector, subspace) nearest-centroid assignment: broadcast the
    m·k codebook rows, exact int64 argmin, (dist, cid) tie-break. The
    window partitions on (id, sub) — n_centroids rows each, never
    data-sized."""
    scored = vs.join(F.broadcast(cent.select("sub", "cid", "cvec")), "sub").withColumn(
        "dist", _sq_dist_q(F.col("sv"), F.col("cvec"))
    )
    w = Window.partitionBy(id_col, "sub").orderBy("dist", "cid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub", "sv", "cid")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_centroids: int = 8,
    iters: int = 2,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    dims: int = 64,
    codebook_path: str | None = None,
) -> DataFrame:
    """ANN top-k over PQ codes with asymmetric-distance scoring and EXACT
    re-ranking — the full IVF-PQ search recipe minus the coarse stage
    (compose with :func:`ivf_trained_topk`'s cell assignment for that).

    Stage 1 (ADC): each query precomputes a lookup table of partial dot
    products against every (sub, centroid) — |Q|·m·k rows, broadcast —
    and a corpus vector's approximate dot is the sum of m LUT hits keyed
    by its codes. The shuffle carries (query_id, vec_id, int64 partial)
    rows; document vectors themselves never move after encoding. The
    approximate cosine divides by the RECONSTRUCTED norm (Σ sub-centroid
    norms — exact int64 from the codebook's ``cn2``), so scores are
    deterministic on any engine. Stage 2 re-scores only the top
    ``rerank`` per query with the exact quantized cosine, exactly like
    :func:`sq8_topk` — PQ decides which candidates survive, never the
    reported score.

    At 100 TB the corpus persists as (vec_id, sub, cid) int codes
    (``codebook_path`` makes the codebook itself durable/reusable): the
    approximate scan reads m small ints per vector instead of 4·dims
    bytes — 64× less I/O at the defaults — and the exact path touches
    rerank·|Q| vectors.
    """
    from data_warehouse_punta_fina_spark.functions.money import pround6
    from data_warehouse_punta_fina_spark.operators.materialize import materialize

    qid = query_id_col or id_col
    cb = materialize(
        pq_fit(corpus, m, n_centroids, iters, id_col, vec_col, dims), codebook_path
    )
    codes = _assign_sub(_subvectors(corpus, id_col, vec_col, m, dims), cb, id_col).select(
        id_col, "sub", "cid"
    )
    q = _prepare(queries, qid, vec_col).withColumnRenamed(qid, "query_id")
    # LUT: per (query, sub, centroid) partial dot of the query's SUBVECTOR
    # against the centroid — tiny (|Q|·m·k rows), stays broadcast
    d_sub = dims // m
    qsub = q.select(
        "query_id",
        "nsq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(F.col("qvec"), s * d_sub + 1, d_sub).alias("qsv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("_s"),
    ).select("query_id", "nsq", F.col("_s.sub").alias("sub"), F.col("_s.qsv").alias("qsv"))
    lut = qsub.join(cb, "sub").select(
        "query_id",
        "nsq",
        "sub",
        "cid",
        dot_q(F.col("qsv"), F.col("cvec")).alias("pdot"),
        "cn2",
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(
            F.sum("pdot").alias("_adot"),
            F.sum("cn2").alias("_xn2"),
            F.first("nsq").alias("_qn2"),
        )
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            pround6(
                F.col("_adot").cast("double")
                / F.sqrt(F.col("_xn2").cast("double") * F.col("_qn2").cast("double"))
            ).alias("approx"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = approx.withColumn("_r", F.row_number().over(wa)).filter(F.col("_r") <= rerank)
    cq = _prepare(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    exact = (
        cand.select("query_id", "neighbor_id")
        .join(cq.alias("c"), "neighbor_id")
        .join(F.broadcast(q.alias("q")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_q(F.col("q.qvec"), F.col("c.qvec"), F.col("q.nsq"), F.col("c.nsq")).alias(
                "cosine"
            ),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(wk).cast("int")).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 32,
    probes: int = 4,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    centroids_path: str | None = None,
    codebook_path: str | None = None,
) -> DataFrame:
    """The full IVF-PQ search recipe (Jégou et al. 2011 §V): a TRAINED
    coarse quantizer restricts the scan to ``probes``/``n_cells`` of the
    corpus, the ADC stage scores only the probed cells' PQ codes, and an
    exact re-rank of the top ``rerank`` decides the reported scores —
    the composition VERDICT r6 #4 asked for (trained IVF alone reached
    0.944 recall but scanned 37.5%; PQ alone scanned 100% of codes).

    Pipeline, all deterministic (no RNG anywhere):

    1. coarse: :func:`kmeans_fit` → ``n_cells`` centroids; corpus rows
       assign to exactly one cell, queries to their ``probes`` nearest
       cells (standard nprobe);
    2. encode: :func:`pq_fit` codebooks on the RAW vectors (not
       residuals — the integer-lattice codebook stays reusable across
       cells and the exact re-rank absorbs the residual-encoding recall
       gap at these rerank depths) → each vector is ``m`` small codes;
    3. ADC scan: candidate pairs are (query, vector-in-probed-cell);
       each pair's approximate dot is the sum of ``m`` broadcast-LUT
       hits — the scan reads m ints per candidate, never the vector;
    4. exact re-rank: the top ``rerank`` per query re-score with the
       exact quantized cosine (:func:`sq8_topk`'s discipline — the
       approximation chooses candidates, never the reported value).

    At 100 TB: corpus persists as (vec_id, cid, m codes) partitioned by
    ``cid``; a query touches ``probes`` partitions of m-byte codes plus
    ``rerank`` full vectors — the measured recall/scan row lives in
    tools/ann_recall.py + docs/SCALE.md.
    """
    from data_warehouse_punta_fina_spark.functions.money import pround6
    from data_warehouse_punta_fina_spark.operators.materialize import (
        build_concurrently,
        materialize,
    )

    # round-16 (guide §2.6, VERDICT r15 #3): the coarse quantizer and the
    # PQ codebook train on the same corpus but are INDEPENDENT — built
    # sequentially, their per-iteration stage chains serialize into the
    # ~33 tiny 1-task AQE jobs the r15 profiler measured. Two driver
    # threads overlap the chains; plans and results are unchanged.
    coarse, cb = build_concurrently(
        [
            lambda: materialize(
                kmeans_fit(
                    corpus, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col
                ),
                centroids_path,
            ),
            lambda: materialize(
                pq_fit(corpus, m, n_centroids, iters, id_col, vec_col, dims),
                codebook_path,
            ),
        ]
    )
    cv = corpus.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    c_cells = _assign(cv, coarse, id_col).select(id_col, "cid")
    q_cells = (
        _assign(
            queries.select(F.col(id_col), quantize(vec_col).alias("qvec")),
            coarse,
            id_col,
            probes=probes,
        )
        .withColumnRenamed(id_col, "query_id")
        .select("query_id", "cid")
    )
    codes = _assign_sub(_subvectors(corpus, id_col, vec_col, m, dims), cb, id_col).select(
        id_col, "sub", F.col("cid").alias("scid")
    )

    # candidate pairs: one row per (query, corpus vector in a probed
    # cell) — the cell join happens BEFORE the m-way code expansion
    pairs = c_cells.join(F.broadcast(q_cells), "cid").filter(
        F.col(id_col) != F.col("query_id")
    ).select("query_id", id_col)
    cand_codes = pairs.join(codes, id_col)
    return _adc_rerank(
        cand_codes, corpus, queries, cb, k, rerank, m, id_col, vec_col, dims
    )


def _adc_rerank(
    cand_codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    cb: DataFrame,
    k: int,
    rerank: int,
    m: int,
    id_col: str,
    vec_col: str,
    dims: int,
) -> DataFrame:
    """Shared IVF-PQ tail: ADC scoring of candidate code rows via a
    broadcast per-query LUT, then exact-cosine rerank of the top
    ``rerank`` — used by both the in-query :func:`ivfpq_topk` and the
    persisted-index :func:`ivfpq_search_index` path. ``cand_codes``
    carries one row per (query_id, candidate id, sub, scid)."""
    from data_warehouse_punta_fina_spark.functions.money import pround6

    # per-query LUT: partial dots against every (sub, centroid) — tiny
    # (|Q|·m·n_centroids rows), broadcast
    q = _prepare(queries, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    d_sub = dims // m
    qsub = q.select(
        "query_id",
        "nsq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(F.col("qvec"), s * d_sub + 1, d_sub).alias("qsv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("_s"),
    ).select("query_id", "nsq", F.col("_s.sub").alias("sub"), F.col("_s.qsv").alias("qsv"))
    lut = qsub.join(cb.withColumnRenamed("cid", "scid"), "sub").select(
        "query_id",
        "nsq",
        "sub",
        "scid",
        dot_q(F.col("qsv"), F.col("cvec")).alias("pdot"),
        "cn2",
    )
    approx = (
        cand_codes.join(F.broadcast(lut), ["query_id", "sub", "scid"])
        .groupBy("query_id", id_col)
        .agg(
            F.sum("pdot").alias("_adot"),
            F.sum("cn2").alias("_xn2"),
            F.first("nsq").alias("_qn2"),
        )
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            pround6(
                F.col("_adot").cast("double")
                / F.sqrt(F.col("_xn2").cast("double") * F.col("_qn2").cast("double"))
            ).alias("approx"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = approx.withColumn("_r", F.row_number().over(wa)).filter(F.col("_r") <= rerank)
    cq = _prepare(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    exact = (
        cand.select("query_id", "neighbor_id")
        .join(cq.alias("c"), "neighbor_id")
        .join(F.broadcast(q.alias("q")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_q(F.col("q.qvec"), F.col("c.qvec"), F.col("q.nsq"), F.col("c.nsq")).alias(
                "cosine"
            ),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(wk).cast("int")).filter(
        F.col("rank") <= k
    )


#: versioned fingerprint of the IVF-PQ encoding scheme — bumped if the
#: quantization, k-means seeding, or code layout ever changes, so a
#: persisted index from an incompatible engine version is rejected
#: instead of silently searched (the minhash band-index discipline,
#: operators/dedup.MINHASH_SCHEME).
IVFPQ_SCHEME = "ivfpq-md5seed-v1"

#: default per-query probe count shared by ivfpq_search_index and the
#: federated compensation rule (ADVICE r12: compensation must scale the
#: SAME base the single-index search defaults to — a duplicated literal
#: would silently drift apart)
IVFPQ_DEFAULT_PROBES = 4


def ivfpq_build_index(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Train the IVF-PQ index ONCE and persist it — the 100 TB deployment
    shape (docs/SCALE.md): training is a one-off job; every subsequent
    search reads the stored artifacts and touches only the probed cells'
    code partitions.

    Writes three parquet tables under ``index_dir``:

    - ``centroids``: the coarse quantizer (:func:`kmeans_fit` output);
    - ``codebook``: the ``m`` per-subspace PQ codebooks (:func:`pq_fit`);
    - ``codes``: one row per (vector, subspace) — (id, sub, scid, cid) —
      written ``partitionBy(cid)`` so a search with ``probes`` cells
      reads exactly ``probes`` partitions (partition pruning via the
      broadcast cell join, no full-index scan).

    The training parameters ride on the ``scid`` column's metadata
    (parquet-footer-durable, the :func:`~.dedup.minhash_band_keys`
    discipline); :func:`ivfpq_search_index` refuses an index whose
    stored parameters don't match the search call, because a mismatched
    codebook silently degrades every score. Returns the codes frame as
    read back from storage.
    """
    coarse = kmeans_fit(corpus, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    coarse.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    cb = pq_fit(corpus, m, n_centroids, iters, id_col, vec_col, dims)
    cb.write.mode("overwrite").parquet(f"{index_dir}/codebook")

    spark = corpus.sparkSession
    coarse_r = spark.read.parquet(f"{index_dir}/centroids")
    cb_r = spark.read.parquet(f"{index_dir}/codebook")
    cv = corpus.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    cells = _assign(cv, coarse_r, id_col).select(id_col, "cid")
    meta = {
        "scheme": IVFPQ_SCHEME,
        "n_cells": n_cells,
        "m": m,
        "n_centroids": n_centroids,
        "iters": iters,
        "dims": dims,
    }
    codes = (
        _assign_sub(_subvectors(corpus, id_col, vec_col, m, dims), cb_r, id_col)
        .select(id_col, "sub", F.col("cid").alias("scid"))
        .join(cells, id_col)
        .select(
            id_col, "sub", F.col("scid").alias("scid", metadata=meta), "cid"
        )
    )
    codes.write.mode("overwrite").partitionBy("cid").parquet(f"{index_dir}/codes")
    # corpus CONTENT fingerprint (round-11, VERDICT r10 #7 — see
    # operators/freshness.py): lets ivfpq_index_is_fresh detect an index
    # whose parameters still match but whose corpus mutated underneath
    (
        content_fingerprint(corpus, id_col, vec_col)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/fingerprint")
    )
    return spark.read.parquet(f"{index_dir}/codes")


def ivfpq_append_index(
    new_vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate_index: bool = True,
) -> DataFrame:
    """Encode-only ingestion into a persisted IVF-PQ index — the
    production append path (new vectors arrive; re-training the coarse
    quantizer and codebooks for every batch would re-read the whole
    corpus). The batch is assigned to cells by the STORED centroids and
    encoded by the STORED codebooks, then appended to the
    cid-partitioned codes table; searches immediately see the union.

    Self-configuring: ``m``/``dims`` come from the index's parameter
    fingerprint (scid column metadata), so a batch can never be encoded
    under different parameters than the index it joins. Ids must be
    globally unique across the index and every appended batch (the
    incremental-dedup contract, `operators/dedup.incremental_lsh_dedup`).

    Semantics note (standard IVF-PQ ops, Jégou et al. 2011): appended
    vectors do NOT influence the quantizers — recall on a heavily
    drifted append stream degrades gracefully until the next re-train,
    exactly as in a production ANN deployment. The exact re-rank keeps
    reported scores exact regardless.
    """
    spark = new_vectors.sparkSession
    coarse = spark.read.parquet(f"{index_dir}/centroids")
    cb = spark.read.parquet(f"{index_dir}/codebook")
    codes0 = spark.read.parquet(f"{index_dir}/codes")
    if "ingest_batch" in codes0.columns:
        # a STREAM-MAINTAINED index partitions codes under
        # ingest_batch=<id>/cid=<c>; a batch append would write
        # root-level cid=* directories next to them — a mixed partition
        # layout Spark cannot read back (the bm25_append_index guard,
        # round-13). Refuse with the remedy instead of corrupting.
        raise ValueError(
            f"IVF-PQ index at {index_dir!r} is stream-maintained (codes are "
            "partitioned by ingest_batch) — batch appends would corrupt its "
            "layout; keep feeding the maintenance stream (streaming/"
            "ann_stream.run_ivfpq_maintenance_stream), or graduate it to the "
            "batch shape with ivfpq_compact_index first."
        )
    stored = dict(codes0.schema["scid"].metadata or {})
    if validate_index and stored.get("scheme") != IVFPQ_SCHEME:
        raise ValueError(
            "persisted codes carry no (or an incompatible) parameter fingerprint "
            f"(stored scheme {stored.get('scheme')!r} != {IVFPQ_SCHEME!r}); encoding a "
            "batch under mismatched parameters silently corrupts the index. Rebuild "
            "with ivfpq_build_index, or pass validate_index=False for an index KNOWN "
            "to match."
        )
    m, dims = int(stored["m"]), int(stored["dims"])
    cv = new_vectors.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    cells = _assign(cv, coarse, id_col).select(id_col, "cid")
    codes = (
        _assign_sub(_subvectors(new_vectors, id_col, vec_col, m, dims), cb, id_col)
        .select(id_col, "sub", F.col("cid").alias("scid"))
        .join(cells, id_col)
        .select(id_col, "sub", F.col("scid").alias("scid", metadata=stored), "cid")
    )
    codes.write.mode("append").partitionBy("cid").parquet(f"{index_dir}/codes")
    # O(batch) fingerprint maintenance: disjoint ids (the append
    # contract) make counts/sums add and XORs xor exactly, so the
    # appended index stays freshness-checkable without rescanning the
    # indexed corpus. A pre-fingerprint index stays fingerprint-less
    # (reported stale until the next full rebuild re-establishes it).
    from pyspark.errors import AnalysisException

    try:
        old_fp = spark.read.parquet(f"{index_dir}/fingerprint").collect()[0]
    except AnalysisException:
        old_fp = None
    if old_fp is not None:
        batch_fp = fingerprint_row(new_vectors, id_col, vec_col)
        mn, mx, ms = merge_fingerprints(old_fp, batch_fp)
        if mn is not None:
            merged = spark.createDataFrame(
                [(mn, mx, str(ms))], "fp_n long, fp_xor long, fp_sum string"
            ).select(
                "fp_n", "fp_xor", F.col("fp_sum").cast("decimal(38,0)").alias("fp_sum")
            )
            merged.coalesce(1).write.mode("overwrite").parquet(
                f"{index_dir}/fingerprint"
            )
    return spark.read.parquet(f"{index_dir}/codes")


def ivfpq_compact_index(
    spark,
    src_index_dir: str,
    dst_index_dir: str,
    validate_index: bool = True,
) -> None:
    """Compact an IVF-PQ index that has taken many encode-only appends —
    the vector member of the compaction triptych (round-12; see
    ``retrieval.bm25_compact_index``): every :func:`ivfpq_append_index`
    adds one file set per append into each touched ``cid`` partition,
    so a long-lived index accumulates small files that degrade every
    probed-cell scan. Compaction rewrites ``codes`` with ONE file per
    cell (one repartition-by-cid shuffle) and copies the quantizers and
    the content fingerprint verbatim — appends never touch them, and
    compaction changes layout, not content, so searches are bit-equal
    and the freshness cycle carries over unchanged. src → dst (no
    in-place rewrite; cut over by path swap, the lakehouse convention;
    after the swap, ``operators.index_admin.retire_index_dir`` owns
    deleting the superseded layout and its epoch history)."""
    codes = spark.read.parquet(f"{src_index_dir}/codes")
    stored = dict(codes.schema["scid"].metadata or {})
    if validate_index and stored.get("scheme") != IVFPQ_SCHEME:
        raise ValueError(
            "persisted codes carry no (or an incompatible) parameter fingerprint "
            f"(stored scheme {stored.get('scheme')!r} != {IVFPQ_SCHEME!r}); "
            "compacting an unverifiable index would bless a corrupt layout."
        )
    n_cells = int(stored.get("n_cells", 32))
    # a stream-maintained source carries ingest_batch partitions; the
    # compacted output drops them — the "graduation" to batch shape
    # (round-13; the bm25/positional compaction discipline)
    id_cols = [
        c for c in codes.columns if c not in ("sub", "scid", "cid", "ingest_batch")
    ]
    if len(id_cols) != 1:
        raise ValueError(
            f"cannot identify the vector-id column in codes schema {codes.columns}"
        )
    id_col = id_cols[0]
    (
        codes.select(
            id_col, "sub", F.col("scid").alias("scid", metadata=stored), "cid"
        )
        .repartition(n_cells, "cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(f"{dst_index_dir}/codes")
    )
    for sub in ("centroids", "codebook"):
        spark.read.parquet(f"{src_index_dir}/{sub}").write.mode("overwrite").parquet(
            f"{dst_index_dir}/{sub}"
        )
    from pyspark.errors import AnalysisException

    try:
        (
            spark.read.parquet(f"{src_index_dir}/fingerprint")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dst_index_dir}/fingerprint")
        )
    except AnalysisException:
        pass  # a pre-fingerprint index compacts fingerprint-less (stays stale)


def ivfpq_recall_probe(
    queries: DataFrame,
    corpus: DataFrame,
    index_dir: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **search_kwargs,
) -> float:
    """Sampled recall@k of a persisted IVF-PQ index against a
    brute-force pass over the live corpus — the DRIFT SIGNAL the
    freshness fingerprint cannot provide (VERDICT r12 #3):
    :func:`ivfpq_append_index` encodes new vectors with FROZEN
    quantizers, so a distribution shift in the appended data degrades
    recall while the content fingerprint stays "fresh" (it tracks
    corpus identity, not quantizer fit). Refresh orchestration should
    run this probe on a small query sample periodically: a reading
    below the index's trained recall floor (RECALL.json) means the
    quantizers no longer describe the data — rebuild with
    :func:`ivfpq_refresh_index` even though ``ivfpq_index_is_fresh``
    still returns True.

    Cost: one probed-cell index search + ONE brute-force pass of
    ``corpus`` × ``queries`` (sample-sized — keep ``queries`` to tens
    of rows; the brute side is |corpus| × |sample| dot products, the
    same shape as one exact-rerank stage). Returns recall@k in [0, 1]:
    |approx ∩ exact| / |exact| over (query, neighbor) pairs."""
    got = ivfpq_search_index(
        queries, corpus, index_dir, k=k, id_col=id_col, vec_col=vec_col,
        **search_kwargs,
    ).select("query_id", "neighbor_id")
    truth = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    n_truth = truth.count()
    if n_truth == 0:
        raise ValueError("recall probe needs a non-empty query sample")
    n_hit = truth.join(got, ["query_id", "neighbor_id"]).count()
    return n_hit / n_truth


def ivfpq_index_is_fresh(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """True iff the persisted index's stored corpus fingerprint matches
    the LIVE corpus. False when the corpus mutated since build+appends,
    and when the fingerprint is absent (pre-fingerprint index):
    unknowable staleness is staleness for a refresh decision. One
    corpus scan — refresh-orchestration, not a per-query guard
    (``operators/freshness.py``)."""
    from pyspark.errors import AnalysisException

    spark = corpus.sparkSession
    try:
        stored = spark.read.parquet(f"{index_dir}/fingerprint").collect()[0]
    except AnalysisException:
        return False
    return rows_match(stored, fingerprint_row(corpus, id_col, vec_col))


def ivfpq_refresh_index(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> bool:
    """The reject-then-rebuild cycle (round-11, VERDICT r10 #7): a FRESH
    index is left untouched (return False); a stale, missing, or
    fingerprint-less one is rebuilt from ``corpus`` — retraining the
    quantizers on the current snapshot and re-establishing the
    fingerprint (return True)."""
    if ivfpq_index_is_fresh(corpus, index_dir, id_col, vec_col):
        return False
    ivfpq_build_index(
        corpus, index_dir, n_cells, m, n_centroids, iters, id_col, vec_col, dims
    )
    return True


def ivfpq_capacity_probe(
    queries: DataFrame,
    corpus: DataFrame,
    index_dir: str,
    target_recall: float,
    k: int = 5,
    rerank_ladder: tuple[int, ...] = (30, 120, 600),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **search_kwargs,
) -> dict:
    """Diagnose WHY a persisted IVF-PQ index under-recalls — the
    advisor between :func:`ivfpq_recall_probe` (detects) and the fix
    (retrain? deepen rerank? widen probes?). Runs the recall probe at
    increasing exact-rerank depths against ONE shared brute-force
    truth; the shape of the curve separates the two failure modes:

    - ``code_tied``: recall recovers as rerank deepens — the true
      neighbors ARE in the probed cells, but the PQ codes cannot rank
      them (ties: a tight cluster quantizes to one code under any
      training). Retraining will NOT help; the knobs are rerank depth
      or codebook richness (``m`` / ``n_centroids``). Measured on the
      drifted-append fixture: 0.06 → 0.30 → 1.00 up the (30, 120, 600)
      ladder.
    - ``assignment_miss``: recall stays low at every depth — the true
      neighbors are not in the probed cells at all. The knobs are
      ``probes`` or a coarse-quantizer retrain
      (:func:`ivfpq_refresh_if_drifted`).
    - ``healthy``: the shallowest reading already meets
      ``target_recall`` (pin it from RECALL.json's trained tier).

    Cost: len(ladder) index searches + ONE sample-sized brute pass
    (the truth set is shared across depths). Returns ``{"readings":
    {rerank: recall}, "diagnosis": str}``."""
    if not rerank_ladder or list(rerank_ladder) != sorted(set(rerank_ladder)):
        raise ValueError("rerank_ladder must be strictly increasing and non-empty")
    truth = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    truth = truth.localCheckpoint()  # one brute pass, reused per depth
    n_truth = truth.count()
    if n_truth == 0:
        raise ValueError("capacity probe needs a non-empty query sample")
    readings: dict[int, float] = {}
    for rr in rerank_ladder:
        got = ivfpq_search_index(
            queries, corpus, index_dir, k=k, rerank=rr,
            id_col=id_col, vec_col=vec_col, **search_kwargs,
        ).select("query_id", "neighbor_id")
        readings[int(rr)] = (
            truth.join(got, ["query_id", "neighbor_id"]).count() / n_truth
        )
    first, deepest = readings[rerank_ladder[0]], readings[rerank_ladder[-1]]
    if first >= target_recall:
        diagnosis = "healthy"
    elif deepest >= target_recall:
        diagnosis = "code_tied"
    else:
        diagnosis = "assignment_miss"
    return {"readings": readings, "diagnosis": diagnosis}


def ivfpq_refresh_if_drifted(
    corpus: DataFrame,
    index_dir: str,
    sample_queries: DataFrame,
    recall_floor: float,
    k: int = 5,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    **search_kwargs,
) -> tuple[bool, float]:
    """The DRIFT-aware refresh cycle — the orchestration composition
    :func:`ivfpq_refresh_index` cannot be (round-13, closing VERDICT
    r12 #3): the fingerprint cycle rebuilds when the CORPUS changed
    under the index, but an append-maintained index tracks its corpus
    exactly while its FROZEN quantizers drift away from the data —
    ``is_fresh`` True, recall silently degrading. This runs the
    sampled :func:`ivfpq_recall_probe` and retrains
    (:func:`ivfpq_build_index` on the current corpus — re-fitting
    quantizers AND re-establishing the fingerprint) when the reading
    falls below ``recall_floor`` (pin it from RECALL.json's trained
    tier for the index's parameters).

    Returns ``(rebuilt, measured_recall)`` — the recall is the
    PRE-rebuild reading, the number an operator would alert on. Run
    once per ingest/maintenance cycle next to the fingerprint check,
    not per query: the probe costs one sample-sized brute pass, the
    rebuild one training job.

    Scope note: retraining re-fits the quantizers to the CURRENT
    distribution; whether the drifted mode then recovers is a
    quantizer-CAPACITY question (an adversarially tight cluster ties
    the PQ codes under any training — the knobs are rerank depth /
    ``m`` / ``n_cells``). Re-probe after the rebuild: a reading still
    under the floor means re-parameterize, not re-train."""
    measured = ivfpq_recall_probe(
        sample_queries, corpus, index_dir, k=k, id_col=id_col, vec_col=vec_col,
        n_cells=n_cells, m=m, n_centroids=n_centroids, iters=iters, dims=dims,
        **search_kwargs,
    )
    if measured >= recall_floor:
        return False, measured
    ivfpq_build_index(
        corpus, index_dir, n_cells, m, n_centroids, iters, id_col, vec_col, dims
    )
    return True, measured


def ivfpq_remediate_drift(
    corpus: DataFrame,
    index_dir: str,
    sample_queries: DataFrame,
    recall_floor: float,
    k: int = 5,
    probes: int = IVFPQ_DEFAULT_PROBES,
    rerank: int = 50,
    rerank_ladder: tuple[int, ...] = (30, 120, 600),
    probe_ladder: tuple[int, ...] | None = None,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> dict:
    """Diagnose-FIRST drift remediation (round-14, VERDICT r13 #5) —
    the composition :func:`ivfpq_refresh_if_drifted` deliberately is
    not: that cycle retrains unconditionally below the floor, but
    :func:`ivfpq_capacity_probe` can already tell when retraining is
    the WRONG remedy. This runs the probe chain and applies the
    cheapest fix the diagnosis indicates:

    - ``healthy``: the current (``probes``, ``rerank``) reading meets
      ``recall_floor`` — no action.
    - ``code_tied``: recall recovers up the rerank ladder, so the true
      neighbors ARE in the probed cells and the PQ codes merely tie —
      a retrain cannot untie an adversarially tight cluster, but a
      deeper exact rerank ranks it exactly. Remedy: recommend the
      SHALLOWEST ladder depth that meets the floor. Zero index writes,
      zero training jobs — the fix is a search-parameter bump.
    - ``assignment_miss``: recall plateaus below the floor at every
      rerank depth — the neighbors are not in the probed cells. Remedy:
      widen ``probes`` up ``probe_ladder`` (default: doublings from the
      current setting up to ``n_cells``), scaling ``rerank``
      PROPORTIONALLY at each rung (measured on sf0.001: widening probes
      at a FIXED rerank *lowers* recall — 0.86 at probes=1 → 0.70 at
      probes=16, rerank=50 — because the ADC candidate pool grows while
      the exact-rank window doesn't, so true neighbors fall out of the
      ADC top-``rerank``; holding the reranked FRACTION constant
      recovers monotonically: 0.89/0.91/0.99/1.00 up the doubled
      (probes, rerank) ladder). Take the first rung that meets the
      floor; only if the widest rung still misses does the coarse
      quantizer itself no longer describe the data, and the remedy
      escalates to a retrain (:func:`ivfpq_build_index` on the current
      corpus, the :func:`ivfpq_refresh_if_drifted` action) with a
      post-rebuild re-probe.

    Returns ``{"diagnosis", "action", "pre", "post", "params",
    "readings"}`` — ``pre`` is the reading an operator would alert on,
    ``post`` the reading under the applied remedy, ``params`` the
    (probes, rerank) to run searches with afterward. Cost: one shared
    brute-force truth pass per probe stage (sample-sized — keep
    ``sample_queries`` to tens of rows), the ladder's index searches
    (each probes/n_cells-pruned), and a training job ONLY on the
    escalation path. Run from maintenance orchestration next to the
    fingerprint check, never per query."""
    params = dict(
        n_cells=n_cells, m=m, n_centroids=n_centroids, iters=iters, dims=dims
    )
    pre = ivfpq_recall_probe(
        sample_queries, corpus, index_dir, k=k, id_col=id_col, vec_col=vec_col,
        probes=probes, rerank=rerank, **params,
    )
    out = {
        "pre": pre,
        "params": {"probes": probes, "rerank": rerank},
        "readings": {f"probes={probes},rerank={rerank}": pre},
    }
    if pre >= recall_floor:
        return {**out, "diagnosis": "healthy", "action": "none", "post": pre}
    ladder = tuple(sorted({*rerank_ladder, rerank}))
    cap = ivfpq_capacity_probe(
        sample_queries, corpus, index_dir, target_recall=recall_floor, k=k,
        rerank_ladder=ladder, id_col=id_col, vec_col=vec_col, probes=probes,
        **params,
    )
    out["readings"].update(
        {f"probes={probes},rerank={r}": v for r, v in cap["readings"].items()}
    )
    if cap["diagnosis"] in ("healthy", "code_tied"):
        # the candidates are in the probed cells — rank them exactly at
        # the shallowest depth that clears the floor. No retrain.
        depth = min(r for r, v in cap["readings"].items() if v >= recall_floor)
        return {
            **out,
            "diagnosis": "code_tied",
            "action": f"rerank={depth}",
            "post": cap["readings"][depth],
            "params": {"probes": probes, "rerank": int(depth)},
        }
    if probe_ladder is None:
        probe_ladder = tuple(
            p for p in (probes * 2, probes * 4, probes * 8, n_cells)
            if probes < p <= n_cells
        )
    for p in sorted(set(probe_ladder)):
        # hold the reranked fraction constant as the candidate pool
        # widens (see docstring — fixed rerank REGRESSES under wider
        # probes on the measured fixture)
        rr = max(rerank, (rerank * int(p) + probes - 1) // probes)
        reading = ivfpq_recall_probe(
            sample_queries, corpus, index_dir, k=k, id_col=id_col, vec_col=vec_col,
            probes=int(p), rerank=rr, **params,
        )
        out["readings"][f"probes={int(p)},rerank={rr}"] = reading
        if reading >= recall_floor:
            return {
                **out,
                "diagnosis": "assignment_miss",
                "action": f"probes={int(p)},rerank={rr}",
                "post": reading,
                "params": {"probes": int(p), "rerank": rr},
            }
    # widest probes still miss: the coarse quantizer no longer describes
    # the data — escalate to the retrain cycle and re-probe
    ivfpq_build_index(
        corpus, index_dir, n_cells, m, n_centroids, iters, id_col, vec_col, dims
    )
    post = ivfpq_recall_probe(
        sample_queries, corpus, index_dir, k=k, id_col=id_col, vec_col=vec_col,
        probes=probes, rerank=rerank, **params,
    )
    out["readings"][f"retrained:probes={probes},rerank={rerank}"] = post
    if post >= recall_floor:
        return {**out, "diagnosis": "assignment_miss", "action": "retrain", "post": post}
    # the residual the r13 verdict documented: a tight cluster stays
    # code-tied under ANY training (measured: retrain on the drifted
    # union reads 0.075 at rerank=50 but 1.00 at 600). Re-diagnose the
    # RETRAINED index once and apply the code-tied rerank remedy.
    cap2 = ivfpq_capacity_probe(
        sample_queries, corpus, index_dir, target_recall=recall_floor, k=k,
        rerank_ladder=ladder, id_col=id_col, vec_col=vec_col, probes=probes,
        **params,
    )
    out["readings"].update(
        {f"retrained:probes={probes},rerank={r}": v for r, v in cap2["readings"].items()}
    )
    recovered = [r for r, v in cap2["readings"].items() if v >= recall_floor]
    if recovered:
        depth = min(recovered)
        return {
            **out,
            "diagnosis": "assignment_miss",
            "action": f"retrain+rerank={depth}",
            "post": cap2["readings"][depth],
            "params": {"probes": probes, "rerank": int(depth)},
        }
    # nothing on the ladder clears the floor even retrained: the floor
    # is beyond this parameterization's capacity — the remaining knobs
    # are codebook richness, and whether they HELP is measurable:
    # run :func:`ivfpq_reparameterize_probe` next (it builds candidate
    # parameterizations in scratch and reports which, if any, clears
    # the floor at the caller's settings — or an honest None when the
    # data is near-tied beyond any code resolution)
    return {
        **out,
        "diagnosis": "assignment_miss",
        "action": "reparameterize",
        "post": max(cap2["readings"].values()),
    }


def ivfpq_reparameterize_probe(
    corpus: DataFrame,
    index_dir: str,
    sample_queries: DataFrame,
    recall_floor: float,
    scratch_dir: str,
    k: int = 5,
    probes: int = IVFPQ_DEFAULT_PROBES,
    rerank: int = 50,
    candidates: tuple[dict, ...] | None = None,
    apply: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> dict:
    """The tool :func:`ivfpq_remediate_drift`'s ``reparameterize``
    terminal verdict points at (round-14): when no (probes, rerank)
    setting clears the floor even after a retrain, the remaining knobs
    are CODEBOOK RICHNESS — and whether richer codes actually help is
    an empirical question this probe answers instead of guessing.
    Measured on sf0.001 at fixed (probes=16, rerank=50): m=8/nc=8 reads
    0.70, nc=32 reads 0.85, m=16 reads 0.78, m=16+nc=32 reads 1.00 —
    monotone and decisive. But on the adversarial near-tie fixture
    (a +10-shifted cluster whose TRUE cosine neighbors differ only at
    the 4th decimal) EVERY parameterization reads 0.075: no codebook
    can resolve what the exact metric barely resolves, and the honest
    answer is ``recommended: None`` (deepen rerank instead).

    Protocol: reads the stored parameters from the index metadata,
    builds each candidate parameterization in its own subdirectory of
    ``scratch_dir`` (training jobs — this is the admin cost class, run
    it offline), and measures recall at the CALLER'S (probes, rerank)
    against ONE shared brute-force truth. The default candidate ladder
    doubles the knobs cheapest-storage-first: richer codebooks
    (``n_centroids``×4 — same code rows, a 4× LUT) before more
    subspaces (``m``×2 — DOUBLES the codes-table rows) before both.
    First candidate to clear ``recall_floor`` wins; ``apply=True``
    rebuilds ``index_dir`` itself at the winning parameters (one more
    training job + fingerprint re-stamp via :func:`ivfpq_build_index`).

    Returns ``{"baseline", "readings", "recommended", "applied"}``."""
    spark = corpus.sparkSession
    codes = spark.read.parquet(f"{index_dir}/codes")
    stored = dict(codes.schema["scid"].metadata or {})
    if stored.get("scheme") != IVFPQ_SCHEME:
        raise ValueError(
            "cannot reparameterize an index without a valid parameter "
            f"fingerprint (stored scheme {stored.get('scheme')!r})"
        )
    base = {
        "n_cells": int(stored["n_cells"]),
        "m": int(stored["m"]),
        "n_centroids": int(stored["n_centroids"]),
        "iters": int(stored["iters"]),
    }
    if candidates is None:
        candidates = (
            {**base, "n_centroids": base["n_centroids"] * 4},
            {**base, "m": base["m"] * 2},
            {**base, "m": base["m"] * 2, "n_centroids": base["n_centroids"] * 4},
        )
    truth = brute_force_topk(
        corpus, sample_queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    truth = truth.localCheckpoint()  # ONE brute pass shared by every reading
    n_truth = truth.count()
    if n_truth == 0:
        raise ValueError("reparameterize probe needs a non-empty query sample")

    def _recall(idx_dir: str, params: dict) -> float:
        got = ivfpq_search_index(
            sample_queries, corpus, idx_dir, k=k, probes=probes, rerank=rerank,
            id_col=id_col, vec_col=vec_col, dims=dims, **params,
        ).select("query_id", "neighbor_id")
        return truth.join(got, ["query_id", "neighbor_id"]).count() / n_truth

    baseline = _recall(index_dir, base)
    readings: dict[str, float] = {}
    recommended: dict | None = None
    for i, cand in enumerate(candidates):
        label = ",".join(f"{k_}={cand[k_]}" for k_ in ("n_cells", "m", "n_centroids"))
        d = f"{scratch_dir.rstrip('/')}/cand{i}"
        ivfpq_build_index(
            corpus, d, cand["n_cells"], cand["m"], cand["n_centroids"],
            cand["iters"], id_col, vec_col, dims,
        )
        readings[label] = _recall(d, cand)
        if readings[label] >= recall_floor:
            recommended = dict(cand)
            break  # ladder is cost-ascending — the first clear is the pick
    applied = False
    if apply and recommended is not None:
        ivfpq_build_index(
            corpus, index_dir, recommended["n_cells"], recommended["m"],
            recommended["n_centroids"], recommended["iters"], id_col, vec_col, dims,
        )
        applied = True
    return {
        "baseline": baseline,
        "readings": readings,
        "recommended": recommended,
        "applied": applied,
    }


def ivfpq_search_index(
    queries: DataFrame,
    corpus: DataFrame,
    index_dir: str,
    k: int = 5,
    probes: int = IVFPQ_DEFAULT_PROBES,
    rerank: int = 50,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    validate_index: bool = True,
    verify_corpus: DataFrame | None = None,
) -> DataFrame:
    """Search a PERSISTED IVF-PQ index (:func:`ivfpq_build_index`) — no
    training job anywhere in the plan: the coarse centroids and codebook
    are small parquet reads, and the broadcast query→cell join against
    the ``cid``-partitioned codes table prunes the scan to the probed
    cells. ``corpus`` supplies only the ``rerank`` exact vectors (an
    id-keyed join, never a full ADC scan).

    Deterministic-by-construction: training is RNG-free, so searching a
    persisted index equals training in-query with the same parameters —
    which is exactly what the oracle checks.

    The stored parameter fingerprint (column metadata on ``scid``) must
    match the call's parameters; mismatches raise instead of silently
    scoring against the wrong codebook (``validate_index=False`` skips
    the check for indexes KNOWN to match, e.g. metadata-stripped copies).
    """
    spark = queries.sparkSession
    coarse = spark.read.parquet(f"{index_dir}/centroids")
    cb = spark.read.parquet(f"{index_dir}/codebook")
    codes = spark.read.parquet(f"{index_dir}/codes")
    missing = {id_col, "sub", "scid", "cid"} - set(codes.columns)
    if missing:
        raise ValueError(
            f"persisted codes table is missing required columns {sorted(missing)}; "
            f"expected the ({id_col}, sub, scid, cid) layout written by ivfpq_build_index"
        )
    stored = dict(codes.schema["scid"].metadata or {})
    expected = {
        "scheme": IVFPQ_SCHEME,
        "n_cells": n_cells,
        "m": m,
        "n_centroids": n_centroids,
        "iters": iters,
        "dims": dims,
    }
    if validate_index and not stored:
        raise ValueError(
            "persisted codes carry no parameter metadata on scid — the index was not "
            "written by this engine's ivfpq_build_index (or predates the versioned "
            f"scheme {IVFPQ_SCHEME!r}). A codebook/parameter mismatch silently degrades "
            "every ADC score, so unverifiable indexes are rejected by default; pass "
            "validate_index=False only for an index KNOWN to match."
        )
    drift = {
        k_: (stored[k_], v) for k_, v in expected.items() if k_ in stored and stored[k_] != v
    }
    if validate_index and drift:
        raise ValueError(
            "persisted IVF-PQ index was built under different parameters than this "
            f"search ({ {k_: f'stored={sv} != search={bv}' for k_, (sv, bv) in drift.items()} }); "
            "ADC scores against a mismatched codebook are silently wrong. Rebuild the "
            "index or pass matching parameters."
        )
    if verify_corpus is not None and not ivfpq_index_is_fresh(
        verify_corpus, index_dir, id_col, vec_col
    ):
        # parameters match but the CORPUS mutated since the build —
        # the codes describe a snapshot that no longer exists. Costs one
        # corpus scan; pass from refresh orchestration, not per query.
        raise StaleIndexError(
            f"persisted IVF-PQ index at {index_dir!r} does not match the live "
            "corpus (content fingerprint mismatch or absent) — rebuild with "
            "ivfpq_refresh_index before searching."
        )

    q_cells = (
        _assign(
            queries.select(F.col(id_col), quantize(vec_col).alias("qvec")),
            coarse,
            id_col,
            probes=probes,
        )
        .withColumnRenamed(id_col, "query_id")
        .select("query_id", "cid")
    )
    # broadcast cell join directly against the cid-partitioned codes:
    # dynamic partition pruning reads only the probed cells
    cand_codes = (
        codes.join(F.broadcast(q_cells), "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, "sub", "scid")
    )
    return _adc_rerank(
        cand_codes, corpus, queries, cb, k, rerank, m, id_col, vec_col, dims
    )


# ---------------------------------------------------------------------------
# MMR — diversified top-k selection (Carbonell & Goldstein 1998)
# ---------------------------------------------------------------------------


def ivfpq_federated_search(
    queries: DataFrame,
    corpus: DataFrame,
    index_dirs: list[str],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compensate: bool = False,
    verify_corpora: list[DataFrame] | None = None,
    **search_kwargs,
) -> DataFrame:
    """Federated top-k over PER-SHARD persisted IVF-PQ indexes — how a
    100 TB corpus is actually indexed: no single training job sees all
    the data; each shard trains/encodes its own index
    (:func:`ivfpq_build_index` per shard, built and refreshed
    independently), every query fans out to all shards, and the global
    top-k is the rank-merge of the per-shard lists.

    Correctness of the merge: a global top-k member is by definition
    inside its own shard's top-k, so merging per-shard top-k lists
    (each already exact-cosine reranked) and re-ranking by (cosine
    DESC, id) yields exactly the top-k over the union of the shards'
    candidate sets — the property the unrolled two-shard oracle checks.
    Shards must partition the corpus (disjoint ids).

    RECALL, however, is NOT free under federation (measured —
    RECALL.json federated tiers, docs/BENCH_NOTES.md r11): each shard's
    quantizer trained on 1/shards of the data, so a fixed per-shard
    ``probes`` scans a smaller corpus fraction per probe-quality unit
    and recall DROPS as shards grow (0.906 → 0.675 at 2 shards → 0.544
    at 4, sf0.1). The measured recovery law is *probe budget scales
    with shard count*: ``compensate=True`` (VERDICT r11 #2) multiplies
    the caller's ``probes`` by ``len(index_dirs)`` before fanning out,
    restoring (and then beating) the single-index recall at the cost of
    a proportionally wider per-shard codes scan. Left False by default
    so callers that already tuned per-shard probes (and the pinned
    naive-tier floors) keep their exact semantics.

    Per-shard freshness (VERDICT r11 #7): pass ``verify_corpora`` — one
    live corpus DataFrame per shard, parallel to ``index_dirs`` — and
    every shard's stored fingerprint is checked BEFORE any search work;
    a mutated shard raises :class:`~.freshness.StaleIndexError` naming
    the stale shard directory (refresh just that shard —
    ``ivfpq_refresh_index`` — the others are untouched).

    Scale shape: each shard search is the usual DPP-pruned codes scan +
    rerank; the merge input is shards × queries × k rows — candidate-
    bounded, never corpus-sized."""
    if not index_dirs:
        raise ValueError("ivfpq_federated_search needs at least one shard index")
    if verify_corpora is not None:
        from data_warehouse_punta_fina_spark.operators.freshness import (
            StaleIndexError,
        )

        if len(verify_corpora) != len(index_dirs):
            raise ValueError(
                f"verify_corpora must parallel index_dirs "
                f"({len(verify_corpora)} != {len(index_dirs)})"
            )
        for d, shard_corpus in zip(index_dirs, verify_corpora):
            if not ivfpq_index_is_fresh(shard_corpus, d, id_col, vec_col):
                raise StaleIndexError(
                    f"federated shard index at {d!r} does not match its live "
                    "corpus (content fingerprint mismatch or absent) — refresh "
                    "that shard with ivfpq_refresh_index; fresh shards need no "
                    "rebuild."
                )
    if compensate:
        # the fallback base is the SHARED module constant, not a literal
        # copy of ivfpq_search_index's default (ADVICE r12: a duplicated
        # literal would silently scale the wrong base if the default drifts)
        base = int(search_kwargs.get("probes", IVFPQ_DEFAULT_PROBES))
        search_kwargs = {**search_kwargs, "probes": base * len(index_dirs)}
    parts = [
        ivfpq_search_index(
            queries, corpus, d, k=k, id_col=id_col, vec_col=vec_col, **search_kwargs
        ).select("query_id", "neighbor_id", "cosine")
        for d in index_dirs
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return merged.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam_num: int = 1,
    lam_den: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance top-k: greedily pick documents that are
    relevant to the query but DISSIMILAR to what's already picked —
    the standard diversified-selection recipe for retrieval-augmented
    example curation (a plain top-k returns k near-copies whenever the
    corpus has duplicates; MMR returns k different ones).

        MMR(d) = λ·rel(q, d) − (1−λ)·max_{s∈selected} sim(d, s)

    λ is a RATIONAL ``lam_num/lam_den`` and every score comparison runs
    in exact int64 (the round-6 cosines' unscaled millionths):
    ``mmr_i = lam_num·rel_i − (lam_den−lam_num)·max_sim_i``, ordered by
    (mmr_i desc, id). No float arithmetic anywhere in the selection, so
    the picked set is bit-identical on any engine and any partitioning.

    Scale shape: stage 1 is :func:`brute_force_topk`'s map-side top-
    ``pool`` scan (the corpus never shuffles whole vectors); stage 2
    computes the pool's pairwise sims ONCE — |Q|·pool² tiny rows,
    materialized; the k−1 greedy rounds then touch only those two small
    tables (each round: one anti-join + one max-agg + one pool-sized
    argmax window). Greedy MMR is inherently sequential in k — k is
    single digits in practice, and each round's frames are
    query-count-sized, so the rounds cost scheduler time, not data time.

    Output: (query_id, neighbor_id, step, relevance) — ``step`` 1..k in
    pick order; ``relevance`` is the exact round-6 cosine to the query.
    """
    if not (0 < lam_num <= lam_den):
        raise ValueError(f"need 0 < lam_num <= lam_den, got {lam_num}/{lam_den}")
    top = brute_force_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col,
                           query_id_col=query_id_col)
    # exact int64 millionths of the round-6 cosine
    rel_i = (F.col("cosine") * F.lit(1_000_000)).cast("long")
    pool_df = top.select(
        "query_id", "neighbor_id", F.col("cosine").alias("relevance"), rel_i.alias("rel_i")
    ).localCheckpoint(eager=False)
    # pairwise sims among each query's pool members (pool² per query, tiny)
    pv = pool_df.select("query_id", "neighbor_id").join(
        _prepare(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id"),
        "neighbor_id",
    )
    a, b = pv.alias("a"), pv.alias("b")
    sim_i = (
        cosine_q(F.col("a.qvec"), F.col("b.qvec"), F.col("a.nsq"), F.col("b.nsq"))
        * F.lit(1_000_000)
    ).cast("long")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.neighbor_id").alias("id_a"),
            F.col("b.neighbor_id").alias("id_b"),
            sim_i.alias("sim_i"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel_i"), F.asc("neighbor_id"))
    selected = (
        pool_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", "neighbor_id", F.lit(1).alias("step"), "relevance")
    ).localCheckpoint(eager=False)
    for step in range(2, k + 1):
        remaining = pool_df.join(
            selected.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
        )
        max_sim = (
            pairs.join(
                selected.select("query_id", F.col("neighbor_id").alias("id_b")),
                ["query_id", "id_b"],
            )
            .groupBy("query_id", F.col("id_a").alias("neighbor_id"))
            .agg(F.max("sim_i").alias("ms_i"))
        )
        scored = remaining.join(max_sim, ["query_id", "neighbor_id"]).withColumn(
            "mmr_i",
            F.lit(lam_num) * F.col("rel_i") - F.lit(lam_den - lam_num) * F.col("ms_i"),
        )
        ws = Window.partitionBy("query_id").orderBy(F.desc("mmr_i"), F.asc("neighbor_id"))
        pick = (
            scored.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select("query_id", "neighbor_id", F.lit(step).alias("step"), "relevance")
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected.select(
        "query_id", "neighbor_id", F.col("step").cast("int").alias("step"), "relevance"
    )


def kmeans_quality_report(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Clustering-quality report for the trained coarse quantizer — the
    evaluation the IVF tier needs before anyone trusts its cells: per
    cell, the member count, the mean squared distance to the centroid
    (dispersion), and the mean SIMPLIFIED silhouette

        s_i = (b_i − a_i) / max(a_i, b_i)

    with a_i = squared distance to the OWN centroid and b_i = squared
    distance to the nearest OTHER centroid (the centroid-based
    silhouette — the O(n²) pairwise form never materializes, which is
    the only form that survives 100 TB). s ≈ 1 = tight well-separated
    cell; s ≈ 0 = boundary mush — cells to split or multiprobe.

    Exactness: distances are exact int64 (quantized vectors); each
    per-vector silhouette is ONE double division round-6'd to
    DECIMAL(12,6); per-cell means are exact decimal sums divided once,
    round-6. Shape: one broadcast of k centroids, one (vec × k) scored
    projection, a (vec)-partitioned rank over k rows, one groupBy(cid).
    Output: (cid, n_vecs, mean_sq_dist, mean_silhouette).
    """
    from data_warehouse_punta_fina_spark.functions.money import pround

    if n_centroids < 2:
        raise ValueError("silhouette needs >= 2 centroids (b_i is the nearest OTHER cell)")
    cent = kmeans_fit(corpus, k=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col)
    v = corpus.select(F.col(id_col), quantize(vec_col).alias("qvec"))
    scored = v.crossJoin(F.broadcast(cent)).select(
        F.col(id_col), "cid", _sq_dist_q(F.col("qvec"), F.col("cvec")).alias("dist")
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cid")
    ranked = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 2)
    per_vec = ranked.groupBy(id_col).agg(
        F.min(F.when(F.col("_rn") == 1, F.col("cid"))).alias("cid"),
        F.min(F.when(F.col("_rn") == 1, F.col("dist"))).alias("_a"),
        F.min(F.when(F.col("_rn") == 2, F.col("dist"))).alias("_b"),
    )
    sil = pround(
        (F.col("_b") - F.col("_a")).cast("double")
        / F.greatest(F.col("_a"), F.col("_b"), F.lit(1)).cast("double"),
        6,
        12,
    )
    r6 = lambda c: pround(c, 6, 18).cast("double")  # noqa: E731
    return (
        per_vec.withColumn("_s", sil)
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("_a").alias("_sum_a"),
            F.sum("_s").alias("_sum_s"),
        )
        .select(
            "cid",
            "n_vecs",
            r6(F.col("_sum_a").cast("double") / F.col("n_vecs").cast("double")).alias(
                "mean_sq_dist"
            ),
            r6(F.col("_sum_s").cast("double") / F.col("n_vecs").cast("double")).alias(
                "mean_silhouette"
            ),
        )
    )
