"""Build a k-times-replicated copy of an sf dir for SCALING measurement.

The driver testdata tops out at sf0.1; VERDICT r5 #4 asks for one ≥5×
scaling point so the constant-overhead-tier calibration (SCALE.md) is
measured rather than argued. This tool replicates sf0.1 k times with
FK-consistent key offsets into a repo-local dir (never touching
/root/testdata) — a perf-only artifact; correctness stays on the
driver-generated SFs.

Replication scheme (copy i of k, OFFSET = 10_000_000):
- region/nation: single copy (tiny catalog dims; nationkeys 0-24 stay
  referenced by every customer/supplier copy)
- customer/supplier/part/orders/lineitem: every *key column += i*OFFSET,
  so joins fan out exactly k-fold with no cross-copy matches
- events: event_id/user_id += i*OFFSET (k-fold density per time window)
- documents: doc_id += i*OFFSET; copies i>0 get a " cpyi" suffix token so
  exact/fuzzy dedup workloads scale ~linearly instead of collapsing into
  k-cliques of identical texts
- embeddings: vec_id += i*OFFSET; copy i rotates the vector by i
  positions (deterministic, norm-preserving) so ANN neighborhoods are
  perturbed, not duplicated

Usage:  python tools/make_scaled_sf.py [k] [src_dir] [dst_dir]
Defaults: k=5, src=/root/testdata/sf0.1, dst=/root/repo/.scaling/sf0.5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]


def main() -> None:
    from pyspark.sql import functions as F

    from data_warehouse_punta_fina_spark import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scaling/sf0.5"
    os.makedirs(dst, exist_ok=True)

    spark = get_spark("make_scaled_sf")
    for t in SINGLE_COPY:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: 1 copy")
    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(k):
            c = base
            for kc in keys:
                c = c.withColumn(kc, F.col(kc) + F.lit(i * OFFSET))
            if t == "documents" and i > 0:
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" cpy{i}")))
                c = c.withColumn("n_chars", F.length("text"))
            if t == "embeddings" and i > 0:
                # rotate by i mod dims: a raw i >= 64 produced a negative
                # slice length and killed the k=100 build (found r11 —
                # rotations are cyclic, so the modulo loses nothing)
                n = 64
                r = i % n
                if r:
                    c = c.withColumn(
                        "embedding",
                        F.concat(
                            F.slice(F.col("embedding"), r + 1, n - r),
                            F.slice(F.col("embedding"), 1, r),
                        ),
                    )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: {k} copies")
    spark.stop()


if __name__ == "__main__":
    main()
