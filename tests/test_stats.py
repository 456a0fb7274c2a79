"""Closed-form grouped statistics (operators/stats.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_grouped_ols_recovers_exact_line_and_degenerate_groups(spark):
    from data_warehouse_punta_fina_spark.operators.stats import grouped_ols

    rows = (
        # group "lin": exact line y = 2x + 1 → slope 2, intercept 1, r² 1
        [("lin", float(x), 2.0 * x + 1.0) for x in range(1, 6)]
        # group "deg": constant x → NULL slope/intercept/r²
        + [("deg", 3.0, 1.0), ("deg", 3.0, 5.0)]
        # group "flat": constant y over varying x → slope 0, r² NULL
        + [("flat", 1.0, 7.0), ("flat", 2.0, 7.0), ("flat", 4.0, 7.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r["g"]: r
        for r in grouped_ols(df, ["g"], "x", "y", x_scale=3, y_scale=3).collect()
    }
    lin = out["lin"]
    assert lin["n"] == 5
    assert lin["slope"] == 2.0 and lin["intercept"] == 1.0 and lin["r2"] == 1.0
    deg = out["deg"]
    assert deg["slope"] is None and deg["intercept"] is None and deg["r2"] is None
    flat = out["flat"]
    assert flat["slope"] == 0.0 and flat["intercept"] == 7.0 and flat["r2"] is None


def test_grouped_ols_matches_numpy_polyfit(spark):
    from data_warehouse_punta_fina_spark.operators.stats import grouped_ols

    xs = [1.25, 2.5, 3.125, 4.75, 6.0, 7.375, 9.5]
    ys = [2.1, 3.9, 5.2, 8.8, 11.0, 13.9, 18.2]
    df = spark.createDataFrame(
        [("a", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    row = grouped_ols(df, ["g"], "x", "y", x_scale=4, y_scale=4).collect()[0]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
    assert math.isclose(row["slope"], slope, abs_tol=5e-6)
    assert math.isclose(row["intercept"], intercept, abs_tol=5e-6)
    assert 0.99 < row["r2"] <= 1.0


def test_chi2_independence_known_2x2(spark):
    from data_warehouse_punta_fina_spark.operators.stats import chi2_independence

    # classic 2×2: rows 30/70 × cols 50/50, observed skewed
    rows = (
        [("x", "u")] * 20 + [("x", "v")] * 10  # row x: 30
        + [("y", "u")] * 30 + [("y", "v")] * 40  # row y: 70
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = {(r["a"], r["b"]): r for r in chi2_independence(df, "a", "b").collect()}
    # expected: e(x,u)=30*50/100=15, e(x,v)=15, e(y,u)=35, e(y,v)=35
    assert got[("x", "u")]["expected"] == 15.0
    assert got[("y", "v")]["expected"] == 35.0
    # χ² = 25/15 + 25/15 + 25/35 + 25/35 = 100/21 ≈ 4.761905
    total = sum(r["chi2_term"] for r in got.values())
    assert math.isclose(total, 100.0 / 21.0, abs_tol=5e-6)


def test_chi2_independence_is_zero_for_independent_columns(spark):
    from data_warehouse_punta_fina_spark.operators.stats import chi2_independence

    # perfectly proportional table → every observed == expected → χ² = 0
    rows = [("x", "u")] * 10 + [("x", "v")] * 30 + [("y", "u")] * 20 + [("y", "v")] * 60
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi2_independence(df, "a", "b")
    assert out.agg(F.sum("chi2_term")).collect()[0][0] == 0.0
