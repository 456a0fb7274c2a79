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


def test_quantile_discretizer_fit_transform(spark):
    from data_warehouse_punta_fina_spark.operators.stats import (
        bucketize_with_cuts,
        quantile_cuts_fit,
    )

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    cuts = quantile_cuts_fit(df, "x", 4)
    row = cuts.collect()[0]
    # exact quartile cuts of 1..100 (percentile interpolates)
    assert (row["cut_1"], row["cut_2"], row["cut_3"]) == (25.75, 50.5, 75.25)

    out = bucketize_with_cuts(df, cuts, "x").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["x"])
    assert sorted(by_bucket) == [1, 2, 3, 4]
    assert all(len(v) == 25 for v in by_bucket.values())
    assert max(by_bucket[1]) == 25.0 and min(by_bucket[4]) == 76.0

    # fit/transform split: the SAME cuts applied to a later batch keep
    # semantics (values past the fitted range land in the edge buckets)
    later = spark.createDataFrame([(0.5,), (50.5,), (1e9,), (None,)], "x double")
    got = {r["x"]: r["bucket"] for r in bucketize_with_cuts(later, cuts, "x").collect()}
    assert got[0.5] == 1 and got[1e9] == 4 and got[None] is None
    # a value exactly on a cut goes to the LOWER bucket
    assert got[50.5] == 2


def test_mixture_allocation_water_filling(spark):
    from data_warehouse_punta_fina_spark.operators.mixture import mixture_allocation

    # budget 1000; 'small' wants 50% = 500 but has only 100 -> saturates;
    # deficit redistributes to a/b by weight (0.3:0.2 of remaining 900)
    src = spark.createDataFrame(
        [("small", 100, 0.5), ("a", 10_000, 0.3), ("b", 10_000, 0.2)],
        "source string, tokens long, weight double",
    )
    got = {r["source"]: r for r in mixture_allocation(src, 1000, max_iter=3).collect()}
    assert got["small"]["saturated"] and got["small"]["allocated"] == 100
    assert not got["a"]["saturated"] and not got["b"]["saturated"]
    # remaining 900 split 0.3/(0.3+0.2)=0.6 and 0.4
    assert got["a"]["allocated"] == 540 and got["b"]["allocated"] == 360
    assert got["small"]["sampling_rate"] == 1.0
    assert abs(got["a"]["sampling_rate"] - 0.054) < 1e-9

    # budget beyond total supply: everyone saturates, leftover unspent
    got2 = {
        r["source"]: r
        for r in mixture_allocation(src, 10**9, max_iter=3).collect()
    }
    assert all(r["saturated"] for r in got2.values())
    assert sum(r["allocated"] for r in got2.values()) == 20_100

    # cascading saturation: after 'small' saturates, 'mid' (cap 200)
    # saturates only in round 2 once redistribution pushes it over
    src3 = spark.createDataFrame(
        [("small", 10, 0.5), ("mid", 200, 0.25), ("big", 10_000, 0.25)],
        "source string, tokens long, weight double",
    )
    got3 = {r["source"]: r for r in mixture_allocation(src3, 1000, max_iter=3).collect()}
    # round 1: small 500>=10 sat; mid 250>=200 sat too (same round here);
    # remaining 790 all to big
    assert got3["small"]["allocated"] == 10 and got3["mid"]["allocated"] == 200
    assert got3["big"]["allocated"] == 790


def test_grouped_corr_matrix_known_values(spark):
    import math

    from data_warehouse_punta_fina_spark.operators.stats import grouped_corr_matrix

    rows = []
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    for x in xs:
        rows.append(("g", x, 2.0 * x + 1.0, -3.0 * x, 7.0))
    df = spark.createDataFrame(rows, "g string, a double, b double, c double, k double")
    out = {
        (r["m_a"], r["m_b"]): r["corr"]
        for r in grouped_corr_matrix(df, ["g"], ["a", "b", "c", "k"], scale=3).collect()
    }
    assert len(out) == 6  # 4 choose 2
    assert out[("a", "b")] == 1.0    # perfect positive
    assert out[("a", "c")] == -1.0   # perfect negative
    assert out[("b", "c")] == -1.0
    # constant measure -> NULL corr with everything
    assert out[("a", "k")] is None and out[("b", "k")] is None and out[("c", "k")] is None

    # noisy pair matches the numpy closed form
    ys = [2.1, 3.7, 6.2, 8.1, 11.0]
    df2 = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, a double, b double"
    )
    got = grouped_corr_matrix(df2, ["g"], ["a", "b"], scale=4).collect()[0]["corr"]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert math.isclose(got, want, abs_tol=5e-6)
