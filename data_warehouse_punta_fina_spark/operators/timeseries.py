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
