"""Behavioral analytics over event streams (north-star extension).

Ordered funnels and retention cohorts — the two analytics every
event-sourced warehouse ends up needing next to sessionization. The
reference has no behavioral tier (its events never leave the DW rows);
these compose from joins/aggregates only, no UDFs, no windows over the
full table.

Scale shape:

- :func:`funnel_progress` — one filtered aggregate per funnel step, each
  keyed by user (map-side combined); step k joins step k-1's per-user
  1-row table, so the data volume SHRINKS monotonically down the funnel.
  Event rows are scanned once per step WITH the step's type filter pushed
  to the scan — at 100 TB each step reads only its event-type partition
  slice (cluster the event table by type/date via ``write_clustered``).
- :func:`retention_cohorts` — two user-keyed aggregates and one join on
  user; output is (cohorts × offsets)-sized, tiny at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_progress(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user ordered-funnel progress: a user completes step ``k`` at
    the EARLIEST event of type ``steps[k]`` strictly after their step
    ``k-1`` completion (the standard strict-order funnel). Returns
    (user, steps_completed) for every user who entered the funnel
    (completed step 0); ``within_seconds`` additionally requires every
    step to land within that window of the step-0 time.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    lv = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    deadline = (
        F.col("_t0") + F.make_interval(secs=F.lit(float(within_seconds)))
        if within_seconds is not None
        else None
    )
    levels = [lv.select(user_col, F.lit(1).alias("_lv"))]
    prev = lv.withColumnRenamed("_t", "_t0").withColumn("_tprev", F.col("_t0"))
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_ts")
        )
        j = nxt.join(prev, user_col).filter(F.col("_ts") > F.col("_tprev"))
        if deadline is not None:
            j = j.filter(F.col("_ts") <= deadline)
        cur = j.groupBy(user_col, "_t0").agg(F.min("_ts").alias("_tprev"))
        levels.append(cur.select(user_col, F.lit(k).alias("_lv")))
        prev = cur
    allv = levels[0]
    for more in levels[1:]:
        allv = allv.unionByName(more)
    return allv.groupBy(user_col).agg(
        F.max("_lv").cast("int").alias("steps_completed")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-activity week
    (cohort), counted in every later week they appear. Output
    (cohort_week DATE, week_offset INT, n_users) — the classic cohort
    grid, computable by any engine with date_trunc('week') (ISO Monday
    weeks in both Spark and DuckDB)."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(wk).alias("_cohort"))
    active = events.select(F.col(user_col), wk.alias("_week")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.col("_cohort").cast("date").alias("cohort_week"),
            (F.datediff(F.col("_week"), F.col("_cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def rfm_scores(
    df: DataFrame,
    key: str,
    recency_col: str,
    frequency_col: str,
    monetary_col: str,
    k: int = 5,
) -> DataFrame:
    """RFM segmentation (the classic retention-marketing warehouse
    analysis): per-entity Recency / Frequency / Monetary quintile scores
    1..``k`` — each an independent exact NTILE over the whole population,
    higher = better on every axis (``recency_col`` must be a "later is
    better" value like a last-order timestamp; frequency and monetary
    rank ascending naturally) — plus a standard segment label:

        champion      R≥4 ∧ F≥4 ∧ M≥4     hibernating  R≤2 ∧ F≤2
        at_risk       R≤2 (but F≥3)        big_spender  M=k
        loyal         F≥4                  regular      everything else

    (CASE order matters and is mirrored verbatim in the oracle.)

    Input should already be aggregated to one row per key (entity-
    cardinality-sized) — the three :func:`exact_ntile` passes each run
    the two-pass distributed rank over that table, so the whole operator
    is window-free at any population size. Ties break on the key, making
    every score deterministic.
    """
    from data_warehouse_punta_fina_spark.operators.windows import exact_ntile

    # three INDEPENDENT rank branches from one checkpointed input, joined
    # back on the key — not a chain. Two reasons: a chain without
    # materialization boundaries re-executes upstream rank subplans
    # combinatorially (~3^3 lineage blowup, measured 28 s on a 1.5k-row
    # table), and even a checkpoint-linearized chain serializes the three
    # sorts' stages; independent branches let the scheduler overlap them
    # (each exact_ntile is constant-job-count, so the bench floor is
    # scheduling overhead, not data).
    base = df.localCheckpoint(eager=False)
    r = exact_ntile(base.select(key, recency_col), [recency_col, key], k, out="r_score").select(
        key, "r_score"
    )
    fq = exact_ntile(
        base.select(key, frequency_col), [frequency_col, key], k, out="f_score"
    ).select(key, "f_score")
    mo = exact_ntile(
        base.select(key, monetary_col), [monetary_col, key], k, out="m_score"
    ).select(key, "m_score")
    scored = base.join(r, key).join(fq, key).join(mo, key)
    r, f, m = F.col("r_score"), F.col("f_score"), F.col("m_score")
    return scored.withColumn(
        "segment",
        F.when((r >= 4) & (f >= 4) & (m >= 4), "champion")
        .when((r <= 2) & (f <= 2), "hibernating")
        .when(r <= 2, "at_risk")
        .when(m == k, "big_spender")
        .when(f >= 4, "loyal")
        .otherwise("regular"),
    )


def basket_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    top_k: int = 50,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Market-basket pair affinity — support / confidence / lift for
    items co-occurring in a basket (order, session, cart), the classic
    association-rule screen (Agrawal & Srikant 1994's frequent-pair
    stage):

        support(a,b)    = baskets(a,b) / n_baskets
        confidence(a→b) = baskets(a,b) / baskets(a)
        lift(a,b)       = support(a,b) / (support(a)·support(b))

    Output: top-``top_k`` pairs by (lift desc, item_a, item_b) among
    pairs in ≥ ``min_pair_count`` baskets — (item_a, item_b, n_pair,
    n_a, n_b, support, confidence, lift), item_a < item_b.

    Scale shape: baskets are deduped to distinct (basket, item) first
    (16-byte-ish keys, map-side combined); the pair stage is a self-join
    ON THE BASKET KEY, so fan-out is items-per-basket², bounded by real
    basket sizes (~tens) — never an item×item cross.
    ``max_basket_items`` is the skew guard: baskets above it (a crawler
    cart, a batch-import order) are dropped before pairing, exactly like
    ``ngram_jaccard_pairs``'s hot-shingle cap. Item supports join back
    from the vocabulary-sized per-item count table. The final top-k is a
    TakeOrdered. All ratios are fixed-order IEEE then portable round-6,
    so lift ties at the boundary resolve identically on any engine.
    """
    from data_warehouse_punta_fina_spark.functions.money import pround

    b = df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")).distinct()
    if max_basket_items is not None:
        big = (
            b.groupBy("_b")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") > max_basket_items)
            .select("_b")
        )
        b = b.join(F.broadcast(big), "_b", "left_anti")
    b = b.localCheckpoint(eager=False)  # consumed by totals, supports, both pair sides
    n_baskets = b.agg(F.countDistinct("_b").alias("_n"))
    item_n = b.groupBy("_i").agg(F.count("*").alias("_c"))
    pairs = (
        b.alias("x")
        .join(b.alias("y"), (F.col("x._b") == F.col("y._b")) & (F.col("x._i") < F.col("y._i")))
        .groupBy(F.col("x._i").alias("item_a"), F.col("y._i").alias("item_b"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    n = F.col("_n").cast("double")
    na, nb, nab = (
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
        F.col("n_pair").cast("double"),
    )
    return (
        pairs.join(item_n.select(F.col("_i").alias("item_a"), F.col("_c").alias("n_a")), "item_a")
        .join(item_n.select(F.col("_i").alias("item_b"), F.col("_c").alias("n_b")), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            pround(nab / n, 6, 12).alias("support"),
            pround(nab / na, 6, 12).alias("confidence"),
            pround((nab / n) / ((na / n) * (nb / n)), 6, 12).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(top_k)
    )
