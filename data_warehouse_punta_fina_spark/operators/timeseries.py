"""Classical time-series decomposition over aggregated series.

The anomaly screen (`quality.robust_outliers` over a seasonal-naive
residual) flags points; decomposition EXPLAINS them — the classic
additive split ``value = trend + seasonal + residual`` (the moving-
average core of X-11 / STL, minus the iterative LOESS refinements).

Scale note on windows: decomposition runs over an AGGREGATED series
(one row per period bucket — weeks, days), so its ordering window is
aggregate-sized, not data-sized; the repo's global-window ban applies
to per-row windows over raw facts, not to a 200-row weekly series. For
thousands of independent series, pass ``series_cols`` and every window
partitions by series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.functions.money import pround


def seasonal_decompose(
    series: DataFrame,
    time_col: str,
    value_col: str,
    period: int,
    series_cols: list[str] | None = None,
    value_scale: int = 2,
) -> DataFrame:
    """Additive decomposition of a regular series with seasonality
    ``period``:

    - ``trend``: centered moving average of width ``period`` (even
      periods use the standard 2×MA — half weight on the two edge
      points); NULL where the window is incomplete (the first/last
      period/2 points, as in statsmodels);
    - ``seasonal``: per-phase mean of the detrended values, re-centered
      to sum ~0 over one period (grand-mean subtraction);
    - ``residual``: value − trend − seasonal (NULL where trend is).

    Determinism: input values quantize to int64 at ``value_scale``;
    every mean is an exact integer (or round-6 decimal) sum divided
    once, round-6 — the same discipline as the stats module, so the
    decomposition reproduces bit-exactly cross-engine. Output keeps
    every input row: (series…, time, value, trend, seasonal, residual).

    Rows are assumed UNIQUE per (series, time) and the series regular
    (consecutive buckets) — compose with ``behavior.gap_fill`` first if
    the series has holes (a missing bucket would silently misalign the
    centered window, which indexes by ROW, not by time).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    sc = series_cols or []
    q = F.floor(F.col(value_col).cast("double") * F.lit(float(10**value_scale)) + F.lit(0.5)).cast(
        "long"
    )
    df = series.select(*sc, F.col(time_col).alias("_t"), F.col(value_col).alias("_v"), q.alias("_q"))
    # single-series mode: the window is aggregate-sized by construction,
    # but keep the partition spec non-empty (constant key — the
    # ranked_sequential_id idiom) so the 'No Partition Defined' warning
    # gate stays meaningful for real global windows
    part = sc if sc else [F.pmod(F.xxhash64("_t"), F.lit(1))]
    w = Window.partitionBy(*part).orderBy("_t")
    half = period // 2
    r6 = lambda c: pround(c, 6, 18).cast("double")  # noqa: E731
    if period % 2 == 0:
        # 2xMA: edges at ±half get weight 1, interior 2 — total 2·period
        frame = w.rowsBetween(-half, half)
        cnt = F.count("_q").over(frame)
        total2 = (
            F.sum(F.col("_q") * F.lit(2)).over(frame)
            - F.first("_q").over(frame)
            - F.last("_q").over(frame)
        )
        trend_i = F.when(cnt == period + 1, total2.cast("double") / F.lit(float(2 * period)))
    else:
        frame = w.rowsBetween(-half, half)
        cnt = F.count("_q").over(frame)
        trend_i = F.when(
            cnt == period, F.sum("_q").over(frame).cast("double") / F.lit(float(period))
        )
    with_trend = df.withColumn("_trend_i", trend_i)
    # phase id from the per-series row index (regular series assumed)
    with_phase = with_trend.withColumn(
        "_phase", ((F.row_number().over(w) - 1) % period).cast("int")
    )
    det = with_phase.withColumn(
        "_det", F.when(F.col("_trend_i").isNotNull(), F.col("_q").cast("double") - F.col("_trend_i"))
    )
    # per-phase mean of detrended (round-6 decimal sums -> exact), then
    # re-center by the grand mean of the phase means
    ph = det.filter(F.col("_det").isNotNull()).groupBy(*sc, "_phase").agg(
        F.sum(pround(F.col("_det"), 6, 18)).alias("_s"), F.count("*").alias("_n")
    )
    ph = ph.withColumn("_m", F.col("_s").cast("double") / F.col("_n").cast("double"))
    grand = ph.groupBy(*sc).agg(
        (F.sum(pround(F.col("_m"), 6, 18)).cast("double") / F.count("*").cast("double")).alias("_g")
    )
    seas = ph.join(grand, sc) if sc else ph.crossJoin(F.broadcast(grand))
    seas = seas.select(*sc, "_phase", r6(F.col("_m") - F.col("_g")).alias("_seasonal"))
    keys = sc + ["_phase"]
    out = det.join(seas, keys, "left")
    scale = F.lit(float(10**value_scale))
    return out.select(
        *sc,
        F.col("_t").alias(time_col),
        F.col("_v").alias(value_col),
        r6(F.col("_trend_i") / scale).alias("trend"),
        r6(F.col("_seasonal") / scale).alias("seasonal"),
        r6((F.col("_det") - F.col("_seasonal")) / scale).alias("residual"),
    )


def ewma(
    series: DataFrame,
    time_col: str,
    value_col: str,
    span: int = 10,
    series_cols: list[str] | None = None,
    value_scale: int = 2,
) -> DataFrame:
    """Exponentially-weighted moving average with α = 1/2, truncated at
    ``span`` lags — the half-life smoother for aggregated daily series.

    Exactness: weight (1/2)^j is implemented as the INTEGER weight
    2^(span−1−j) on int64-quantized values, so numerator and
    denominator are exact int64 sums over at most ``span`` ``lag``
    terms; the single double division at the end is portable round-6.
    (The untruncated tail the span cut drops carries weight < 2^−span —
    under one round-6 ulp of the result for span ≥ 10 at daily scales.)
    A missing lag (series head) simply drops out of BOTH sums — the
    pandas ``adjust=True`` normalization.

    Windows are per-series lags over the AGGREGATED series (one row per
    bucket), never over raw facts — same scale posture as
    :func:`seasonal_decompose`.
    """
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    # int64 headroom: the largest integer weight is 2^(span-1) and the
    # numerator is a sum of span weight·|q| terms bounded by
    # 2^span·max|q|, so span 40 leaves max|q| ≈ 8.4e6 (84k.00 at
    # value_scale=2) before overflow — beyond that the tail weight
    # (< 2^-40) is sub-ulp anyway, so larger spans buy nothing
    if span > 40:
        raise ValueError(
            f"span must be <= 40 (int64 weight headroom: 2^span·max|q| "
            f"must stay under 2^63), got {span}"
        )
    sc = series_cols or []
    q = F.floor(
        F.col(value_col).cast("double") * F.lit(float(10**value_scale)) + F.lit(0.5)
    ).cast("long")
    df = series.select(
        *sc, F.col(time_col).alias("_t"), F.col(value_col).alias("_v"), q.alias("_q")
    )
    part = sc if sc else [F.pmod(F.xxhash64("_t"), F.lit(1))]
    w = Window.partitionBy(*part).orderBy("_t")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(span):
        lagv = F.col("_q") if j == 0 else F.lag("_q", j).over(w)
        weight = F.lit(1 << (span - 1 - j)).cast("long")
        num = num + F.coalesce(lagv * weight, F.lit(0))
        den = den + F.when(lagv.isNotNull(), weight).otherwise(F.lit(0))
    scale = F.lit(float(10**value_scale))
    return df.select(
        *sc,
        F.col("_t").alias(time_col),
        F.col("_v").alias(value_col),
        pround(num.cast("double") / den.cast("double") / scale, 6, 18)
        .cast("double")
        .alias("ewma"),
    )


def cusum_changepoint(
    series: DataFrame,
    time_col: str,
    value_col: str,
    series_cols: list[str] | None = None,
    value_scale: int = 2,
) -> DataFrame:
    """Offline CUSUM changepoint screen: the cumulative sum of
    deviations from the series mean peaks (in absolute value) at the
    most likely single change point — the classic Page/Taylor offline
    estimator.

    Exactness end-to-end in int64: values quantize at ``value_scale``;
    the centered deviation uses ``n·x − Σx`` (deviations scaled by n,
    avoiding a fractional mean entirely), so the running sum, the
    per-series max |cusum|, and the ``is_changepoint`` comparison are
    all exact integer arithmetic. ``cusum`` is reported unscaled back
    to value units: (Σ n·dev)/(n·10^scale) — one double division,
    round-6.

    Output: (series…, time, value, cusum, is_changepoint). Multiple
    rows can tie at the max — all are flagged (deterministic; callers
    wanting one take the earliest time).
    """
    sc = series_cols or []
    q = F.floor(
        F.col(value_col).cast("double") * F.lit(float(10**value_scale)) + F.lit(0.5)
    ).cast("long")
    df = series.select(
        *sc, F.col(time_col).alias("_t"), F.col(value_col).alias("_v"), q.alias("_q")
    )
    stats = df.groupBy(*sc).agg(F.sum("_q").alias("_sum"), F.count("*").alias("_n"))
    joined = df.join(stats, sc) if sc else df.crossJoin(F.broadcast(stats))
    part = sc if sc else [F.pmod(F.xxhash64("_t"), F.lit(1))]
    w = Window.partitionBy(*part).orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(*part)
    # dev scaled by n: n*x - sum  (exact); running sum stays int64 —
    # |values| ≤ n * max|x|·10^scale ≈ 1e3 · 1e13 — within int64
    dev_n = F.col("_n") * F.col("_q") - F.col("_sum")
    cum = joined.withColumn("_cusum_n", F.sum(dev_n).over(w))
    cum = cum.withColumn("_max_abs", F.max(F.abs(F.col("_cusum_n"))).over(wall))
    scale = F.lit(float(10**value_scale))
    return cum.select(
        *sc,
        F.col("_t").alias(time_col),
        F.col("_v").alias(value_col),
        pround(F.col("_cusum_n").cast("double") / F.col("_n").cast("double") / scale, 6, 18)
        .cast("double")
        .alias("cusum"),
        (
            (F.abs(F.col("_cusum_n")) == F.col("_max_abs")) & (F.col("_max_abs") > 0)
        ).alias("is_changepoint"),
    )


def interpolate_linear(
    series: DataFrame,
    time_col: str,
    value_col: str,
    series_cols: list[str] | None = None,
    value_scale: int = 2,
) -> DataFrame:
    """Linear interpolation of NULL gaps in a (possibly gap-filled)
    daily series — the refinement of
    :func:`~data_warehouse_punta_fina_spark.operators.asof.gap_fill_locf`:
    instead of carrying the last observation flat, a missing day gets

        prev + floor((next − prev) · days_since_prev / gap_days)

    in int64-quantized units (floor division DOCUMENTED as the exact
    cross-engine semantics; the error vs true linear is < one quantum).
    Leading NULLs backfill from the first observation; trailing NULLs
    carry the last (both edges have only one anchor). ``interpolated``
    marks rows whose value was filled.

    Two per-series ordered windows (last/first ignoreNulls) over the
    AGGREGATED daily grid — no joins, no shuffle beyond the series
    partition.
    """
    sc = series_cols or []
    q = F.floor(
        F.col(value_col).cast("double") * F.lit(float(10**value_scale)) + F.lit(0.5)
    ).cast("long")
    df = series.select(
        *sc,
        F.col(time_col).alias("_t"),
        F.when(F.col(value_col).isNotNull(), q).alias("_q"),
    )
    part = sc if sc else [F.pmod(F.xxhash64("_t"), F.lit(1))]
    wb = (
        Window.partitionBy(*part)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*part)
        .orderBy("_t")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    tq = F.when(F.col("_q").isNotNull(), F.col("_t"))
    filled = (
        df.withColumn("_pv", F.last("_q", ignorenulls=True).over(wb))
        .withColumn("_pt", F.last(tq, ignorenulls=True).over(wb))
        .withColumn("_nv", F.first("_q", ignorenulls=True).over(wf))
        .withColumn("_nt", F.first(tq, ignorenulls=True).over(wf))
    )
    gap = F.datediff(F.col("_nt"), F.col("_pt"))
    pos = F.datediff(F.col("_t"), F.col("_pt"))
    interp = F.col("_pv") + F.floor(
        ((F.col("_nv") - F.col("_pv")) * pos) / gap
    ).cast("long")
    qout = (
        F.when(F.col("_q").isNotNull(), F.col("_q"))
        .when(F.col("_pv").isNull(), F.col("_nv"))  # leading edge: backfill
        .when(F.col("_nv").isNull(), F.col("_pv"))  # trailing edge: LOCF
        .otherwise(interp)
    )
    scale = F.lit(float(10**value_scale))
    return filled.select(
        *sc,
        F.col("_t").alias(time_col),
        pround(qout.cast("double") / scale, 6, 18).cast("double").alias(value_col),
        F.col("_q").isNull().alias("interpolated"),
    )
