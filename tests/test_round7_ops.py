"""Round-7 gates: the non-foldable constant-partition idiom, the
range-partitioned cumulative sum, the ungrouped-AUC scale path, and the
top-k-before-cumsum Pareto plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_single_partitions_are_tiny(plan: str) -> None:
    """Every Exchange SinglePartition must sit directly on a partial
    aggregate (1-row totals, sample-sized collect_lists) — never on a
    data-sized Sort/scan (which would be a true global funnel)."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i + 1 : i + 3])
            # partial_* markers specifically: a bare final HashAggregate
            # over data-sized groups on a single-partition exchange is
            # exactly the funnel this gate exists to catch (ADVICE r7)
            assert (
                "partial_collect_list" in below
                or "partial_sum" in below
                or "partial_count" in below
                or "partial_min" in below
                or "partial_max" in below
            ), below


def test_const_partition_is_nonfoldable(spark):
    """partitionBy(lit(0)) — and even xxhash64(lit(0)) — constant-folds
    to an EMPTY partition spec (a SinglePartition global window);
    const_partition anchored on a real column must not."""
    from data_warehouse_punta_fina_spark.operators.windows import const_partition

    df = spark.range(100).withColumn("v", F.col("id") % 7)
    w = (
        Window.partitionBy(const_partition("v"))
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("c", F.sum("v").over(w))
    assert "SinglePartition" not in _plan(out)
    # and it is still a constant: the cumulative equals the global one
    got = [r["c"] for r in out.orderBy("id").collect()]
    want, acc = [], 0
    for i in range(100):
        acc += i % 7
        want.append(acc)
    assert got == want


def test_range_partitioned_cumsum_matches_global(spark):
    """Inclusive and exclusive range-partitioned running sums equal the
    single-window answer on a 5000-key total order, with enough sampled
    cutpoints to exercise multi-bucket offsets."""
    from data_warehouse_punta_fina_spark.operators.windows import (
        range_partitioned_cumsum,
    )

    n = 5000
    df = (
        spark.range(n)
        .select(
            ((F.col("id") * 37) % n).alias("k"),  # a permutation of 0..n-1
            (F.col("id") % 13).alias("v"),
        )
        .repartition(16)
    )
    rows = [((i * 37) % n, i % 13) for i in range(n)]
    rows.sort()
    want_inc, want_exc, acc = [], [], 0
    for _, v in rows:
        want_exc.append(acc)
        acc += v
        want_inc.append(acc)

    for inclusive, want in ((True, want_inc), (False, want_exc)):
        out = range_partitioned_cumsum(
            df, "k", "v", out="c", inclusive=inclusive, partitions=8, sample_mod=8
        )
        got = [r["c"] for r in out.orderBy("k").collect()]
        assert got == want, f"inclusive={inclusive}"
        _assert_single_partitions_are_tiny(_plan(out))


def test_binary_auc_ungrouped_matches_bruteforce_and_scales(spark):
    """The ungrouped AUC path (range-partitioned cumulative over distinct
    scores) matches an independent Python Mann-Whitney computation with
    average-rank ties, and its plan has no data-sized single-partition
    funnel."""
    from data_warehouse_punta_fina_spark.operators.evaluation import binary_auc

    n = 3000
    rows = []
    for i in range(n):
        s = ((i * 37) % 101) / 100.0  # 101 distinct scores, heavy ties
        y = 1 if ((i * 7919) % 100) < 15 + 60 * s else 0
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, y int").repartition(16)

    # brute force: average-rank Mann-Whitney
    by_score: dict[float, list[int]] = {}
    for s, y in rows:
        by_score.setdefault(s, []).append(y)
    n_pos = sum(y for _, y in rows)
    n_neg = n - n_pos
    rank_sum, seen = 0.0, 0
    for s in sorted(by_score):
        grp = by_score[s]
        avg_rank = seen + (len(grp) + 1) / 2.0
        rank_sum += avg_rank * sum(grp)
        seen += len(grp)
    want = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)

    out = binary_auc(df, "score", "y")
    row = out.collect()[0]
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert abs(float(row["auc"]) - want) < 1e-6, (row["auc"], want)
    _assert_single_partitions_are_tiny(_plan(out))


def test_binary_auc_grouped_unchanged(spark):
    """The grouped path still windows per group (sanity: a perfectly
    separable group scores 1.0, an anti-separable one 0.0)."""
    from data_warehouse_punta_fina_spark.operators.evaluation import binary_auc

    rows = [("a", s / 10.0, 1 if s >= 5 else 0) for s in range(10)]
    rows += [("b", s / 10.0, 0 if s >= 5 else 1) for s in range(10)]
    df = spark.createDataFrame(rows, "g string, score double, y int")
    got = {r["g"]: r["auc"] for r in binary_auc(df, "score", "y", ["g"]).collect()}
    assert got == {"a": 1.0, "b": 0.0}


def test_ewma_span_headroom_guard(spark):
    """span > 40 overflows the int64 weight lattice — must raise."""
    from data_warehouse_punta_fina_spark.operators.timeseries import ewma

    df = spark.createDataFrame([(1, 1.0)], "t int, v double")
    with pytest.raises(ValueError, match="span"):
        ewma(df, "t", "v", span=41)
    with pytest.raises(ValueError, match="span"):
        ewma(df, "t", "v", span=0)


def test_ivfpq_matches_bruteforce_on_clustered_data(spark):
    """On data with REAL cluster structure (unlike the near-uniform
    testdata embeddings), IVF-PQ with ample probes/rerank must recover
    the exact top-k: 4 well-separated clusters, query's neighbors are
    its own cluster."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    rows = []
    for i in range(80):
        c = i % 4
        base = [1000.0 if j // 4 == c * 4 else 0.0 for j in range(64)]
        # small deterministic within-cluster jitter
        vec = [b + ((i * 7 + j) % 5) for j, b in enumerate(base)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            df, q, k=5, n_cells=4, probes=2, m=8, n_centroids=8, iters=3, rerank=20
        ).collect()
    }
    assert got == truth


def test_ivfpq_plan_shape():
    """IVF-PQ: the LUT and cell joins broadcast; no cartesian product;
    the corpus parquet is scanned a bounded number of times (coarse fit
    chain + assign + codes + rerank branches — all lineage reuse, no
    data-sized single-partition exchange)."""
    import __spark_entry__ as entrymod
    from data_warehouse_punta_fina_spark import get_spark

    spark = get_spark("ivfpq-plan")
    qs = entrymod.all_queries()
    df = qs["ann_ivfpq_topk"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) == 40  # 8 queries x top-5
    ranks = sorted(r["rank"] for r in rows if r["query_id"] == rows[0]["query_id"])
    assert ranks == [1, 2, 3, 4, 5]


def test_revenue_pareto_plan_takes_topk_before_window():
    """The Pareto query must prune to the top-200 BEFORE the cumulative
    window: the plan carries a TakeOrderedAndProject (per-partition top-k
    + tiny merge) and no single-partition exchange on the full per-part
    aggregate."""
    import __spark_entry__ as entrymod
    from data_warehouse_punta_fina_spark import get_spark

    spark = get_spark("pareto-plan")
    qs = entrymod.all_queries()
    df = qs["revenue_pareto_parts"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    _assert_single_partitions_are_tiny(plan)
    # ranks must still be the GLOBAL ranks 1..200 in revenue order
    rows = df.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
