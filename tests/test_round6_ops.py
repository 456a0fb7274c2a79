"""Round-6 operator tests: EWMA / CUSUM / interpolation, FD audit,
Bloom semi-join, evaluation tier (AUC / lift / WOE), systematic
sampling, and the catalog conformance mapping (tested with Derby in
test_jdbc_roundtrip.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- timeseries -------------------------------------------------------------


def test_ewma_integer_weights_exact(spark):
    from data_warehouse_punta_fina_spark.operators.timeseries import ewma

    s = spark.createDataFrame(
        [("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 4.0)],
        "d string, v double",
    ).select(F.col("d").cast("date").alias("d"), "v")
    out = {r["d"].day: r["ewma"] for r in ewma(s, "d", "v", span=10, value_scale=0).collect()}
    # hand-rolled: num/den with weights 512,256,128…
    assert out[1] == 1.0
    assert out[2] == round((2 * 512 + 1 * 256) / 768, 6)  # 1.666667
    assert abs(out[2] - 1.666667) < 1e-9
    assert out[3] == 3.0  # (4*512 + 2*256 + 1*128)/896


def test_ewma_partitions_by_series(spark):
    from data_warehouse_punta_fina_spark.operators.timeseries import ewma

    s = spark.createDataFrame(
        [("a", "2024-01-01", 1.0), ("a", "2024-01-02", 3.0), ("b", "2024-01-02", 100.0)],
        "k string, d string, v double",
    ).select("k", F.col("d").cast("date").alias("d"), "v")
    out = {(r["k"], r["d"].day): r["ewma"] for r in ewma(s, "d", "v", series_cols=["k"], value_scale=0).collect()}
    assert out[("b", 2)] == 100.0  # b's head sees no bleed from a
    assert out[("a", 2)] == round((3 * 512 + 1 * 256) / 768, 6)


def test_cusum_peaks_at_level_shift(spark):
    from data_warehouse_punta_fina_spark.operators.timeseries import cusum_changepoint

    rows = [(f"2024-01-0{i+1}", v) for i, v in enumerate([0.0, 0.0, 0.0, 10.0, 10.0])]
    s = spark.createDataFrame(rows, "d string, v double").select(
        F.col("d").cast("date").alias("d"), "v"
    )
    out = sorted(
        cusum_changepoint(s, "d", "v", value_scale=0).collect(), key=lambda r: r["d"]
    )
    assert [r["cusum"] for r in out] == [-4.0, -8.0, -12.0, -6.0, 0.0]
    assert [r["is_changepoint"] for r in out] == [False, False, True, False, False]


def test_cusum_constant_series_flags_nothing(spark):
    from data_warehouse_punta_fina_spark.operators.timeseries import cusum_changepoint

    s = spark.createDataFrame(
        [("2024-01-01", 5.0), ("2024-01-02", 5.0)], "d string, v double"
    ).select(F.col("d").cast("date").alias("d"), "v")
    out = cusum_changepoint(s, "d", "v", value_scale=0).collect()
    assert all(not r["is_changepoint"] for r in out)
    assert all(r["cusum"] == 0.0 for r in out)


def test_interpolate_linear_floor_blend_and_edges(spark):
    from data_warehouse_punta_fina_spark.operators.timeseries import interpolate_linear

    rows = [
        ("2024-01-01", 10.0),
        ("2024-01-02", None),
        ("2024-01-03", None),
        ("2024-01-04", 16.0),
        ("2024-01-05", None),  # trailing -> LOCF
    ]
    s = spark.createDataFrame(rows, "d string, v double").select(
        F.col("d").cast("date").alias("d"), "v"
    )
    out = sorted(
        interpolate_linear(s, "d", "v", value_scale=0).collect(), key=lambda r: r["d"]
    )
    assert [r["v"] for r in out] == [10.0, 12.0, 14.0, 16.0, 16.0]
    assert [r["interpolated"] for r in out] == [False, True, True, False, True]


def test_interpolate_linear_leading_backfill(spark):
    from data_warehouse_punta_fina_spark.operators.timeseries import interpolate_linear

    s = spark.createDataFrame(
        [("2024-01-01", None), ("2024-01-02", 7.0)], "d string, v double"
    ).select(F.col("d").cast("date").alias("d"), "v")
    out = sorted(
        interpolate_linear(s, "d", "v", value_scale=0).collect(), key=lambda r: r["d"]
    )
    assert [r["v"] for r in out] == [7.0, 7.0]
    assert [r["interpolated"] for r in out] == [True, False]


# --- FD audit ---------------------------------------------------------------


def test_fd_violations_reports_only_violators(spark):
    from data_warehouse_punta_fina_spark.operators.quality import fd_violations

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (2, "c"), (3, None), (3, "d")],
        "k int, dep string",
    )
    out = {r["k"]: r for r in fd_violations(df, ["k"], ["dep"]).collect()}
    assert set(out) == {1, 3}  # key 2 repeats but does not violate
    assert out[1]["n_variants"] == 2 and out[1]["n_rows"] == 2
    assert out[1]["first_variant"] == "a" and out[1]["last_variant"] == "b"
    assert out[3]["first_variant"] == "<null>"  # NULL renders explicitly


def test_fd_violations_multi_column_rendering(spark):
    from data_warehouse_punta_fina_spark.operators.quality import fd_violations

    df = spark.createDataFrame(
        [(1, "x", 10), (1, "x", 11)], "k int, a string, b int"
    )
    row = fd_violations(df, ["k"], ["a", "b"]).collect()[0]
    assert row["first_variant"] == "x | 10"
    assert row["last_variant"] == "x | 11"


# --- Bloom semi-join --------------------------------------------------------


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from data_warehouse_punta_fina_spark.operators.bloomjoin import bloom_semi_join

    big = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") % 13).alias("x"))
    small = spark.range(300).select((F.col("id") * 7).alias("sk"))
    got = bloom_semi_join(big, small, "k", "sk", m_bits=1 << 12, hashes=2)
    want = big.join(small.select(F.col("sk").alias("k")).distinct(), "k", "left_semi")
    assert sorted(r["k"] for r in got.collect()) == sorted(r["k"] for r in want.collect())


def test_bloom_bitmap_is_compact(spark):
    from data_warehouse_punta_fina_spark.operators.bloomjoin import bloom_bitmap

    small = spark.range(1000).select(F.col("id").alias("k"))
    words = bloom_bitmap(small, "k", m_bits=1 << 12, hashes=2)
    # the broadcast payload is at most m/64 words regardless of key count
    assert words.count() <= (1 << 12) // 64


# --- evaluation tier --------------------------------------------------------


def test_binary_auc_with_ties_matches_hand_computation(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import binary_auc

    df = spark.createDataFrame(
        [(0.1, False), (0.2, False), (0.3, True), (0.3, False), (0.4, True)],
        "s double, y boolean",
    )
    row = binary_auc(df, "s", "y").collect()[0]
    # asc ranks: 1, 2, 3.5, 3.5, 5 -> pos ranks 3.5+5=8.5
    # AUC = (8.5 - 2*3/2) / (2*3) = 0.916667
    assert (row["n_pos"], row["n_neg"]) == (2, 3)
    assert abs(float(row["auc"]) - 0.916667) < 1e-9


def test_binary_auc_single_class_is_null_and_groups_split(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import binary_auc

    df = spark.createDataFrame(
        [("g1", 0.1, True), ("g1", 0.9, True), ("g2", 0.2, False), ("g2", 0.8, True)],
        "g string, s double, y boolean",
    )
    out = {r["g"]: r for r in binary_auc(df, "s", "y", group_cols=["g"]).collect()}
    assert out["g1"]["auc"] is None  # no negatives -> undefined
    assert float(out["g2"]["auc"]) == 1.0  # perfectly separated


def test_decile_lift_exact_buckets(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import decile_lift

    # scores 10..1, positives on the top five -> perfect ranking
    df = spark.createDataFrame(
        [(i, float(11 - i), i <= 5) for i in range(1, 11)], "id int, s double, y boolean"
    )
    out = {r["bucket"]: r for r in decile_lift(df, "s", "y", ["id"], n_buckets=5).collect()}
    assert [out[b]["n"] for b in range(1, 6)] == [2, 2, 2, 2, 2]
    assert [out[b]["n_pos"] for b in range(1, 6)] == [2, 2, 1, 0, 0]
    assert float(out[1]["lift"]) == 2.0  # 1.0 rate vs 0.5 base
    assert float(out[1]["cum_capture"]) == 0.4
    assert float(out[3]["cum_capture"]) == 1.0


def test_woe_encoding_hand_computed(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import woe_encoding

    df = spark.createDataFrame(
        [("A", True), ("A", True), ("A", False), ("B", False), ("B", False)],
        "c string, y boolean",
    )
    out = {r["category"]: r for r in woe_encoding(df, "c", "y").collect()}
    # pt=2, nt=3; A: ps=2.5/2, ns=1.5/3 -> ln(2.5); B: ps=0.5/2, ns=2.5/3 -> ln(0.3)
    assert abs(float(out["A"]["woe"]) - math.log(2.5)) < 1e-6
    assert abs(float(out["B"]["woe"]) - math.log(0.3)) < 1e-6
    assert abs(float(out["A"]["iv_term"]) - (1.25 - 0.5) * math.log(2.5)) < 1e-6


# --- systematic sampling ----------------------------------------------------


def test_systematic_sample_exact_positions(spark):
    from data_warehouse_punta_fina_spark.operators.sampling import systematic_sample

    df = spark.range(10).select(F.col("id"))
    got = sorted(r["id"] for r in systematic_sample(df, ["id"], 3).collect())
    assert got == [0, 3, 6, 9]
    got1 = sorted(r["id"] for r in systematic_sample(df, ["id"], 3, offset=1).collect())
    assert got1 == [1, 4, 7]


def test_systematic_sample_validates_params(spark):
    from data_warehouse_punta_fina_spark.operators.sampling import systematic_sample

    df = spark.range(5)
    with pytest.raises(ValueError):
        systematic_sample(df, ["id"], 0)
    with pytest.raises(ValueError):
        systematic_sample(df, ["id"], 3, offset=3)


# --- neyman decimal headroom (sf0.5 scaling-run regression) -----------------


def test_neyman_allocation_survives_large_n_times_std(spark):
    """n_h·S_h over ~1e12 overflowed DECIMAL(18,6) under ANSI mode at the
    sf0.5 scaling run; the weight now rounds into DECIMAL(28,6)."""
    from data_warehouse_punta_fina_spark.operators.sampling import neyman_allocation

    # two strata, values scaled so n*std(cents) > 1e12: std(cents) ~ 5e9
    # with n=300 -> w ~ 1.5e12
    rows = [("a", float(i % 2) * 1e8) for i in range(300)] + [
        ("b", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["k"]: r for r in neyman_allocation(df, ["k"], "v", 100).collect()}
    assert out["a"]["alloc"] + out["b"]["alloc"] == 100
    assert out["a"]["alloc"] > out["b"]["alloc"]  # variance-heavy stratum wins


# --- wave 2: AP / LOO / assortativity / trimmed mean / feature hashing ------


def test_average_precision_hand_computed_and_pessimistic_ties(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import average_precision

    df = spark.createDataFrame(
        [(0.9, True), (0.8, False), (0.7, True), (0.7, False)], "s double, y boolean"
    )
    row = average_precision(df, "s", "y").collect()[0]
    # blocks desc: 0.9 -> 1/1; 0.7 (tied, positive LAST) -> 2/4; AP = 0.75
    assert (row["n"], row["n_pos"]) == (4, 2)
    assert abs(float(row["avg_precision"]) - 0.75) < 1e-9

    tie = spark.createDataFrame([(0.5, True), (0.5, False)], "s double, y boolean")
    r2 = average_precision(tie, "s", "y").collect()[0]
    assert abs(float(r2["avg_precision"]) - 0.5) < 1e-9  # pessimistic, not 1.0


def test_average_precision_no_positives_is_null(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import average_precision

    df = spark.createDataFrame([(0.3, False), (0.8, False)], "s double, y boolean")
    row = average_precision(df, "s", "y").collect()[0]
    assert row["n_pos"] == 0 and row["avg_precision"] is None


def test_loo_target_encoding_excludes_own_row(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import loo_target_encoding

    df = spark.createDataFrame(
        [("A", 1, 10), ("A", 2, 20), ("A", 3, 30), ("B", 4, 99)],
        "c string, id int, t long",
    )
    out = {r["id"]: r["loo_mean"] for r in loo_target_encoding(df, "c", "t").collect()}
    assert float(out[1]) == 25.0  # (20+30)/2
    assert float(out[2]) == 20.0
    assert out[4] is None  # singleton category has no LOO evidence


def test_degree_assortativity_star_is_minus_one(spark):
    from data_warehouse_punta_fina_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "u int, v int")
    row = degree_assortativity(star).collect()[0]
    assert (row["n_nodes"], row["n_edges"]) == (4, 3)
    assert abs(row["assortativity"] - (-1.0)) < 1e-9


def test_degree_assortativity_constant_degrees_null(spark):
    from data_warehouse_punta_fina_spark.operators.graph import degree_assortativity

    cycle = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "u int, v int")
    row = degree_assortativity(cycle).collect()[0]
    assert row["assortativity"] is None  # zero degree variance


def test_trimmed_mean_drops_outliers(spark):
    from data_warehouse_punta_fina_spark.operators.stats import trimmed_mean

    vals = [0.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    row = trimmed_mean(df, ["k"], "v", trim=0.1, value_scale=0).collect()[0]
    assert row["n"] == 10 and row["n_trimmed_each_side"] == 1
    assert row["trimmed_mean"] == 5.5  # mean of 2..9, outliers gone
    with pytest.raises(ValueError):
        trimmed_mean(df, ["k"], "v", trim=0.5)


def test_feature_hashing_matches_reference_md5_formula(spark):
    import hashlib

    from data_warehouse_punta_fina_spark.operators.features import feature_hashing

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, ""), (3, "!!!")], "id int, text string"
    )
    out = {r["id"]: list(r["features"]) for r in feature_hashing(df, "id", "text").collect()}

    def expect(tokens, dims=16):
        vec = [0] * dims
        for t in tokens:
            h = hashlib.md5(t.encode()).hexdigest()
            ix = int(h[:13], 16) % dims
            sg = 1 - 2 * (int(h[13], 16) % 2)
            vec[ix] += sg
        return vec

    assert out[1] == expect(["alpha", "beta", "beta"])
    assert out[2] == [0] * 16  # empty text -> explicit zero vector
    assert out[3] == [0] * 16  # no alphanumeric tokens


# --- wave 3: prefix-filter set join, sequence pattern match -----------------


def test_prefix_jaccard_join_equals_brute_force(spark):
    """Prefix filtering is LOSSLESS: the exact same qualifying pair set
    as the brute all-pairs join, on the real corpus."""
    from data_warehouse_punta_fina_spark.functions.text import tokens
    from data_warehouse_punta_fina_spark.operators.setjoin import prefix_jaccard_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_jaccard_join(docs, "doc_id", "text", threshold=0.9).collect()
    }
    toks = docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    )
    ta = toks.select(F.col("doc_id").alias("a"), "t")
    tb = toks.select(F.col("doc_id").alias("b"), "t")
    inter = (
        ta.join(tb, "t")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    brute = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .filter(
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")) >= 0.9
        )
    )
    want = {(r["a"], r["b"]) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_prefix_jaccard_join_validates_threshold(spark):
    from data_warehouse_punta_fina_spark.operators.setjoin import prefix_jaccard_join

    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        prefix_jaccard_join(docs, "doc_id", "text", threshold=0.0)


def test_session_pattern_match_counts_and_sessions(spark):
    from data_warehouse_punta_fina_spark.operators.patterns import session_pattern_match

    rows = [
        # user 1, session 1: c v p  -> one match
        (1, 1, "2024-01-01 10:00:00", "click"),
        (1, 2, "2024-01-01 10:05:00", "view"),
        (1, 3, "2024-01-01 10:10:00", "purchase"),
        # user 1, session 2 (7h later): c e c p -> ONE non-overlapping match
        (1, 4, "2024-01-01 18:00:00", "click"),
        (1, 5, "2024-01-01 18:01:00", "error"),
        (1, 6, "2024-01-01 18:02:00", "click"),
        (1, 7, "2024-01-01 18:03:00", "purchase"),
        # user 2: p c -> purchase BEFORE click, no match (session filtered out)
        (2, 8, "2024-01-01 09:00:00", "purchase"),
        (2, 9, "2024-01-01 09:01:00", "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_id int, ts string, event_type string").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    out = {
        (r["user_id"], r["session_seq"]): r["n_matches"]
        for r in session_pattern_match(
            ev,
            "user_id",
            "ts",
            "event_type",
            {"click": "c", "view": "v", "purchase": "p", "error": "e"},
            "c[ve]*p",
            gap_seconds=6 * 3600,
            tiebreak=["event_id"],
        ).collect()
    }
    assert out == {(1, 1): 1, (1, 2): 1}  # user 2 absent: no match


# --- wave 4: robust trend, rolling distinct -----------------------------


def test_theil_sen_exact_line_and_outlier_robustness(spark):
    from data_warehouse_punta_fina_spark.operators.stats import theil_sen_trend

    # y = 3 + 2x on x=1..9, with ONE wild outlier at x=5: the median
    # slope must stay 2 (OLS would not), intercept median-residual 3
    rows = []
    for i, d in enumerate(range(1, 10)):
        y = 3 + 2 * (i + 1)
        if d == 5:
            y = 1000.0
        rows.append((f"2024-01-0{d}", float(y)))
    s = spark.createDataFrame(rows, "d string, v double").select(
        F.col("d").cast("date").alias("d"), "v"
    )
    row = theil_sen_trend(s, "d", "v", value_scale=0).collect()[0]
    assert row["n"] == 9 and row["n_pairs"] == 36
    assert row["slope"] == 2.0
    assert row["intercept"] == 3.0
    assert row["mk_s"] > 0  # increasing trend


def test_theil_sen_flat_series(spark):
    from data_warehouse_punta_fina_spark.operators.stats import theil_sen_trend

    s = spark.createDataFrame(
        [(f"2024-01-0{d}", 7.0) for d in range(1, 6)], "d string, v double"
    ).select(F.col("d").cast("date").alias("d"), "v")
    row = theil_sen_trend(s, "d", "v", value_scale=0).collect()[0]
    assert row["slope"] == 0.0 and row["intercept"] == 7.0 and row["mk_s"] == 0


def test_trailing_dau_window_membership(spark):
    # user A active day 1; user B active days 1 and 8: day 7 window sees
    # only A+B(from day1); day 8 sees only B's day-8 activity
    import __spark_entry__ as entrymod  # noqa: F401 — query-level check lives in the oracle gate

    from pyspark.sql import functions as F2

    ev = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-01"), (2, "2024-01-08")],
        "user_id int, d string",
    ).select("user_id", F2.col("d").cast("date").alias("day"))
    expanded = ev.distinct().select(
        "user_id",
        F2.explode(F2.sequence(F2.col("day"), F2.date_add(F2.col("day"), 6))).alias("wday"),
    )
    got = {
        str(r["wday"]): r["n"]
        for r in expanded.groupBy("wday").agg(F2.count_distinct("user_id").alias("n")).collect()
    }
    assert got["2024-01-07"] == 2  # both users' day-1 activity still in window
    assert got["2024-01-08"] == 1  # only B, via its day-8 activity


# --- wave 5: calibration / Brier / k-fold -----------------------------------


def test_calibration_bins_and_ece(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import calibration_bins

    # two bins: scores 0.1/0.15 (bin 1, 0/2 pos), 0.95/0.95 (bin 9, 2/2)
    df = spark.createDataFrame(
        [(0.1, False), (0.15, False), (0.95, True), (0.95, True)],
        "s double, y boolean",
    )
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y").collect()}
    assert set(out) == {1, 9}
    assert float(out[1]["pos_rate"]) == 0.0 and float(out[9]["pos_rate"]) == 1.0
    assert abs(float(out[1]["mean_score"]) - 0.125) < 1e-9
    # ece terms: (2/4)*|0.125-0| + (2/4)*|0.95-1| = 0.0625 + 0.025
    assert abs(float(out[1]["ece_term"]) - 0.0625) < 1e-6
    assert abs(float(out[9]["ece_term"]) - 0.025) < 1e-6
    # score exactly 1.0 clamps into the last bin
    top = calibration_bins(
        spark.createDataFrame([(1.0, True)], "s double, y boolean"), "s", "y"
    ).collect()[0]
    assert top["bin"] == 9


def test_brier_score_hand_computed(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import brier_score

    df = spark.createDataFrame(
        [("a", 1.0, True), ("a", 0.0, True), ("b", 0.5, False)],
        "g string, s double, y boolean",
    )
    out = {r["g"]: float(r["brier"]) for r in brier_score(df, "s", "y", ["g"]).collect()}
    assert abs(out["a"] - 0.5) < 1e-9  # (0 + 1)/2
    assert abs(out["b"] - 0.25) < 1e-9


def test_stratified_kfold_balances_within_strata(spark):
    from data_warehouse_punta_fina_spark.operators.evaluation import stratified_kfold

    rows = [(i, "x" if i < 10 else "y") for i in range(17)]  # 10 x, 7 y
    df = spark.createDataFrame(rows, "id int, s string")
    out = stratified_kfold(df, ["s"], ["id"], k=5)
    counts = {
        (r["s"], r["fold"]): r["n"]
        for r in out.groupBy("s", "fold").agg(F.count("*").alias("n")).collect()
    }
    assert all(counts[("x", f)] == 2 for f in range(5))  # 10/5 exactly
    assert sorted(counts[("y", f)] for f in range(5)) == [1, 1, 1, 2, 2]  # 7 = 2+2+1+1+1
    # deterministic: same input -> identical folds
    again = {
        r["id"]: r["fold"] for r in stratified_kfold(df, ["s"], ["id"], k=5).collect()
    }
    first = {r["id"]: r["fold"] for r in out.collect()}
    assert first == again
    with pytest.raises(ValueError):
        stratified_kfold(df, ["s"], ["id"], k=1)


# --- wave 6: Pareto, ties-aware top-k, multiplicative means -----------------


def test_pareto_crossing_flag(spark):
    import __spark_entry__ as entrymod

    # synthetic check of the integer crossing rule via the real query is
    # oracle-covered; here pin the flag semantics on a crafted frame
    per = spark.createDataFrame(
        [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)], "k int, rev double"
    )
    from pyspark.sql import Window

    cents = F.floor(F.col("rev") * 100 + F.lit(0.5)).cast("long")
    d = per.select("k", cents.alias("c"))
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.desc("c"), F.asc("k"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = d.agg(F.sum("c").alias("t"))
    ranked = d.crossJoin(F.broadcast(tot)).withColumn("cum", F.sum("c").over(w))
    flags = {
        r["k"]: r["f"]
        for r in ranked.select(
            "k", ((5 * (F.col("cum") - F.col("c"))) < 4 * F.col("t")).alias("f")
        ).collect()
    }
    # 50 -> in (prev 0); 30 -> in (prev 50); 15 -> OUT: the prefix
    # {50, 30} already reaches exactly 80%, so the minimal-prefix rule
    # (5*prev < 4*total, strict) excludes it; 5 -> out
    assert flags == {1: True, 2: True, 3: False, 4: False}


def test_rank_with_ties_includes_all_tied_lines(spark):
    from pyspark.sql import Window

    li = spark.createDataFrame(
        [(1, 1, 0.10), (1, 2, 0.10), (1, 3, 0.05), (1, 4, 0.01)],
        "o int, ln int, d double",
    )
    w = Window.partitionBy("o").orderBy(
        F.desc(F.floor(F.col("d") * 10000 + F.lit(0.5)).cast("long"))
    )
    out = li.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 2)
    got = {(r["ln"], r["rnk"]) for r in out.collect()}
    # both 0.10 lines tie at rank 1; 0.05 is rank 3 (rank, not dense) -> excluded
    assert got == {(1, 1), (2, 1)}


def test_multiplicative_means_hand_computed(spark):
    import math

    import __spark_entry__ as entrymod  # noqa: F401

    from data_warehouse_punta_fina_spark.functions.money import pround, pround6

    ev = spark.createDataFrame(
        [("t", 2.0), ("t", 8.0)], "event_type string, value double"
    )
    lnterm = pround6(F.log(F.col("value").cast("double")), 18)
    invterm = pround(F.lit(1.0) / F.col("value").cast("double"), 9, 18)
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(lnterm).alias("s"), F.sum(invterm).alias("i")
    )
    row = per.select(
        pround6(F.exp(F.col("s").cast("double") / F.col("n").cast("double")))
        .cast("double")
        .alias("g"),
        pround6(F.col("n").cast("double") / F.col("i").cast("double"))
        .cast("double")
        .alias("h"),
    ).collect()[0]
    assert abs(row["g"] - 4.0) < 1e-5          # sqrt(2*8)
    assert abs(row["h"] - 3.2) < 1e-6          # 2/(1/2+1/8)


# --- wave 7: delta k-core peel ---------------------------------------------


def test_kcore_delta_equals_reaggregating_peel(spark):
    from data_warehouse_punta_fina_spark.operators.graph import kcore, kcore_delta

    # crafted cascade: a 4-clique (3-core) with a pendant chain that
    # peels over several rounds
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src int, dst int")
    a = sorted((r["node"], r["core_degree"]) for r in kcore(edges, k=3).collect())
    b = sorted((r["node"], r["core_degree"]) for r in kcore_delta(edges, k=3).collect())
    assert a == b == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_kcore_delta_equals_peel_on_real_bipartite_graph(spark):
    from pyspark.sql import functions as F2

    from data_warehouse_punta_fina_spark.operators.graph import kcore, kcore_delta
    from data_warehouse_punta_fina_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F2.col("o_custkey").alias("src"),
            (F2.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    a = sorted((r["node"], r["core_degree"]) for r in kcore(edges, k=4).collect())
    b = sorted((r["node"], r["core_degree"]) for r in kcore_delta(edges, k=4).collect())
    assert a == b and len(a) > 0
