"""Maintenance-batch scaling leg (round-14, VERDICT r13 #6).

The canonical drained-host 100× table (docs/BENCH_NOTES.md round-13)
covers BUILDS and SEARCHES; the per-micro-batch MAINTENANCE cost — the
O(batch ∪ vocabulary) claim behind ``bm25_maintenance_batch`` and the
encode-only claim behind ``ivfpq_maintenance_batch`` — had no committed
scale point. This sweep measures one micro-batch at 1× and 10× batch
size against indexes already holding the 1× corpus (sf0.1) and the 100×
corpus (.scaling/sf10.0, built by tools/make_scaled_sf.py):

- claim under test: per-batch wall is ~FLAT in corpus size (the batch
  never re-reads the corpus — postings land in the batch's own
  partition; the global-state merge touches the vocabulary-sized epoch,
  not the corpus) and ~sub-linear-to-linear in batch size (fixed
  Spark job overhead dominates small batches).
- the honest caveat: the BM25 dfstats merge IS O(vocabulary), and the
  100× corpus has a larger vocabulary, so a mild corpus-size term is
  expected there (report it, don't hide it); the IVF-PQ encode touches
  nothing global but the 1-row fingerprint epoch.

The index bootstraps (batch 0 = the whole corpus minus the held-out
batch docs) are timed too but are the BUILD cost class, not the claim.

Usage:  python tools/maintenance_scale.py [sf_dir ...]
Writes .scaling/maintenance_scale.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B1_DOCS, B10_DOCS = 100, 1000
B1_VECS, B10_VECS = 200, 2000
TRAIN_SAMPLE = 2000  # fixed stream_init training snapshot across corpora


def sweep(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from data_warehouse_punta_fina_spark.sources.readers import load_table
    from data_warehouse_punta_fina_spark.streaming.ann_stream import (
        ivfpq_maintenance_batch,
        ivfpq_stream_init,
    )
    from data_warehouse_punta_fina_spark.streaming.bm25_stream import (
        bm25_maintenance_batch,
    )

    out: dict = {"sf_dir": sf_dir}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out["n_docs"] = docs.count()
    out["n_vecs"] = emb.count()

    held_docs = [
        r["doc_id"] for r in docs.select("doc_id").limit(B1_DOCS + B10_DOCS).collect()
    ]
    d_b1, d_b10 = held_docs[:B1_DOCS], held_docs[B1_DOCS:]
    held_vecs = [
        r["vec_id"] for r in emb.select("vec_id").limit(B1_VECS + B10_VECS).collect()
    ]
    v_b1, v_b10 = held_vecs[:B1_VECS], held_vecs[B1_VECS:]

    work = tempfile.mkdtemp(prefix="maintenance_scale_")
    try:
        # ---- BM25 maintained index -----------------------------------
        idx = os.path.join(work, "bm25_maint")
        t0 = time.monotonic()
        bm25_maintenance_batch(
            docs.filter(~F.col("doc_id").isin(held_docs)), 0, idx, n_buckets=16
        )
        out["bm25_bootstrap_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        bm25_maintenance_batch(docs.filter(F.col("doc_id").isin(d_b1)), 1, idx, n_buckets=16)
        out[f"bm25_batch_{B1_DOCS}d_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        bm25_maintenance_batch(docs.filter(F.col("doc_id").isin(d_b10)), 2, idx, n_buckets=16)
        out[f"bm25_batch_{B10_DOCS}d_s"] = round(time.monotonic() - t0, 2)

        # ---- IVF-PQ maintained index ---------------------------------
        vidx = os.path.join(work, "ivfpq_maint")
        # training snapshot size is FIXED across corpora: init is the
        # one-off job; the per-batch encode is the claim under test
        ivfpq_stream_init(emb.limit(TRAIN_SAMPLE), vidx, n_cells=32, m=8,
                          n_centroids=8, iters=2)
        t0 = time.monotonic()
        ivfpq_maintenance_batch(emb.filter(~F.col("vec_id").isin(held_vecs)), 0, vidx)
        out["ivfpq_bootstrap_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        ivfpq_maintenance_batch(emb.filter(F.col("vec_id").isin(v_b1)), 1, vidx)
        out[f"ivfpq_batch_{B1_VECS}v_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        ivfpq_maintenance_batch(emb.filter(F.col("vec_id").isin(v_b10)), 2, vidx)
        out[f"ivfpq_batch_{B10_VECS}v_s"] = round(time.monotonic() - t0, 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    from data_warehouse_punta_fina_spark import get_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(root, ".scaling", "sf10.0"),
    ]
    spark = get_spark("maintenance_scale")
    blocks = [sweep(spark, d) for d in sf_dirs]
    os.makedirs(os.path.join(root, ".scaling"), exist_ok=True)
    path = os.path.join(root, ".scaling", "maintenance_scale.json")
    with open(path, "w") as fh:
        json.dump(blocks, fh, indent=1)
    legs = [
        ("bm25_bootstrap_s", "bm25 bootstrap (build class)"),
        (f"bm25_batch_{B1_DOCS}d_s", f"bm25 batch {B1_DOCS} docs"),
        (f"bm25_batch_{B10_DOCS}d_s", f"bm25 batch {B10_DOCS} docs"),
        ("ivfpq_bootstrap_s", "ivfpq bootstrap (build class)"),
        (f"ivfpq_batch_{B1_VECS}v_s", f"ivfpq batch {B1_VECS} vecs"),
        (f"ivfpq_batch_{B10_VECS}v_s", f"ivfpq batch {B10_VECS} vecs"),
    ]
    print("| leg | " + " | ".join(os.path.basename(b["sf_dir"]) for b in blocks)
          + " | corpus ratio |")
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
