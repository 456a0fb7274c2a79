"""Retrieval-stack scaling sweep (round-11, VERDICT r10 #5).

The scale ladder (docs/SCALE.md) measures the ENUMERATION tier at
5/10/20/50/100×; the retrieval stack's "index once, candidate-bounded
reads" claim only had steady-state numbers at sf0.1. This sweep times
the three retrieval-stack legs the claim rests on, at any pair of SF
dirs (default sf0.1 vs the 50×-replicated .scaling/sf5.0 built by
tools/make_scaled_sf.py):

- ``bm25_build``   — the ONE corpus-sized shuffle (word count) per
  corpus snapshot; expected ~linear in corpus size.
- ``bm25_search``  — broadcast (bucket, term) join against the stored
  bucket-partitioned postings with a static bucket filter; expected
  ~flat (the scan is query-term-bucket-bounded, and within a bucket the
  postings of the ~12 query terms, not the corpus).
- ``ivfpq_shard_build`` — two per-shard IVF-PQ trainings (the federated
  posture: no single training job sees all data); ~linear per shard.
- ``federated_search`` — per-shard DPP-pruned codes scan + rerank +
  shards×queries×k merge; expected ~flat-to-sublinear (probed cells
  grow with corpus, but only the probed fraction is read).
- ``positional_build`` / ``phrase_search`` (round-11; v2 array layout
  since round-12) — the positional index's tokenize + (term, doc)
  group-by into delta-encoded position arrays (one row per POSTING —
  the round-12 re-lay that halved the family's steepest 100× build)
  and the static-bucket-pruned positional intersection; build ~linear,
  search ~flat.

Searches are timed WARM (second run) — the steady-state number is the
deployment claim; the first run pays one-time file-listing/footer costs.

Usage:  python tools/retrieval_scale.py [sf_dir ...]
Writes .scaling/retrieval_scale.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5
BM25_QUERIES = [
    (1, "spark window agg"),
    (2, "hash join fast"),
    (3, "customer order data"),
    (4, "stream batch merge sort"),
]
IVFPQ_PARAMS = dict(n_cells=32, m=8, n_centroids=32, iters=3)


def _bm25_query_df(spark):
    from pyspark.sql import functions as F

    from data_warehouse_punta_fina_spark.functions.text import TOKEN_SPLIT_RE

    qrows = [
        (qid, t)
        for qid, qtext in BM25_QUERIES
        for t in dict.fromkeys(w for w in re.split(TOKEN_SPLIT_RE, qtext.lower()) if w)
    ]
    qdf = spark.createDataFrame(qrows, "query_id int, term string")
    buckets = sorted(
        r["b"]
        for r in qdf.select(
            F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    return qdf, buckets


def sweep(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from data_warehouse_punta_fina_spark.operators.retrieval import (
        bm25_build_index,
        bm25_search_index,
    )
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_federated_search,
    )
    from data_warehouse_punta_fina_spark.sources.readers import load_table

    out: dict = {"sf_dir": sf_dir}
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out["n_docs"] = docs.count()
    out["n_vecs"] = emb.count()

    work = tempfile.mkdtemp(prefix="retrieval_scale_")
    try:
        idx = os.path.join(work, "bm25")
        t0 = time.monotonic()
        bm25_build_index(docs, idx, n_buckets=16)
        out["bm25_build_s"] = round(time.monotonic() - t0, 2)

        qdf, buckets = _bm25_query_df(spark)
        for run in ("cold", "warm"):
            t0 = time.monotonic()
            bm25_search_index(qdf, idx, k=K, prune_buckets=buckets).collect()
            out[f"bm25_search_{run}_s"] = round(time.monotonic() - t0, 2)

        from data_warehouse_punta_fina_spark.operators.retrieval import (
            phrase_search_index,
            positional_build_index,
        )

        pidx = os.path.join(work, "positional")
        t0 = time.monotonic()
        positional_build_index(docs, pidx, n_buckets=16)
        out["positional_build_s"] = round(time.monotonic() - t0, 2)
        for run in ("cold", "warm"):
            t0 = time.monotonic()
            phrase_search_index(spark, pidx, "order fast").collect()
            out[f"phrase_search_{run}_s"] = round(time.monotonic() - t0, 2)

        shard_dirs = []
        t0 = time.monotonic()
        for i in range(2):
            d = os.path.join(work, f"shard{i}")
            ivfpq_build_index(
                emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == i), d, **IVFPQ_PARAMS
            )
            shard_dirs.append(d)
        out["ivfpq_shard_build_s"] = round(time.monotonic() - t0, 2)

        queries = emb.filter(F.col("vec_id") < 8)
        for run in ("cold", "warm"):
            t0 = time.monotonic()
            ivfpq_federated_search(
                queries, emb, shard_dirs, k=K, probes=4, rerank=100, **IVFPQ_PARAMS
            ).collect()
            out[f"federated_search_{run}_s"] = round(time.monotonic() - t0, 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    from data_warehouse_punta_fina_spark import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scaling", "sf5.0"),
    ]
    spark = get_spark("retrieval_scale")
    blocks = [sweep(spark, d) for d in sf_dirs]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, ".scaling"), exist_ok=True)
    path = os.path.join(root, ".scaling", "retrieval_scale.json")
    with open(path, "w") as fh:
        json.dump(blocks, fh, indent=1)
    legs = [
        ("bm25_build_s", "bm25_build"),
        ("bm25_search_warm_s", "bm25_search (warm)"),
        ("positional_build_s", "positional_build"),
        ("phrase_search_warm_s", "phrase_search (warm)"),
        ("ivfpq_shard_build_s", "ivfpq_shard_build x2"),
        ("federated_search_warm_s", "federated_search (warm)"),
    ]
    print("| leg | " + " | ".join(os.path.basename(b["sf_dir"]) for b in blocks)
          + " | ratio |")
    print("|---|" + "---|" * (len(blocks) + 1))
    for key, label in legs:
        vals = [b[key] for b in blocks]
        ratio = vals[-1] / vals[0] if vals[0] else float("nan")
        print(f"| {label} | " + " | ".join(f"{v:.2f}s" for v in vals)
              + f" | {ratio:.1f}x |")
    data_ratio = blocks[-1]["n_docs"] / blocks[0]["n_docs"]
    print(f"\ndata ratio {data_ratio:.0f}x "
          f"({blocks[0]['n_docs']} -> {blocks[-1]['n_docs']} docs); raw: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
