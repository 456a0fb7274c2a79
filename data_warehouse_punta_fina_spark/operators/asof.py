"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Composition of built-ins (preference (a) from the build rules): tag and
union both sides, then one window per key carries the most recent right-
side time forward onto left rows. One shuffle on the join key, no UDF,
no driver loop — the classic scalable formulation (an `applyInPandas`
`pd.merge_asof` per key group would be the (b) fallback; this stays fully
JVM-side).

At 100 TB: the shuffle key is the equi-key (e.g. user id); skew on a hot
key is handled by AQE skew-join on the underlying exchange. The window is
a linear scan per key — no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    out: str = "asof_time",
) -> DataFrame:
    """For each left row, attach the greatest ``right_time`` ≤ ``left_time``
    among right rows with the same key (inclusive, like DuckDB/pandas
    ``merge_asof`` backward mode). Right side is reduced to distinct
    (key, time) so the result is deterministic.

    Returns ``left`` + one extra column ``out`` (null when no prior right
    row exists).
    """
    r = (
        right.select(F.col(right_on).alias("_k"), F.col(right_time).alias("_t"))
        .distinct()
        .withColumn("_is_left", F.lit(0))
    )
    l_ = left.withColumn("_k", F.col(left_on)).withColumn("_t", F.col(left_time)).withColumn(
        "_is_left", F.lit(1)
    )
    # align schemas for the union: right contributes only key/time
    for c in l_.columns:
        if c not in ("_k", "_t", "_is_left"):
            r = r.withColumn(c, F.lit(None).cast(l_.schema[c].dataType))
    unioned = l_.unionByName(r.select(*l_.columns))
    # right rows sort before left rows at equal time → inclusive match
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        out,
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True).over(w),
    )
    return matched.filter(F.col("_is_left") == 1).drop("_k", "_t", "_is_left")


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap_seconds: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``.

    Pure window composition (lag → boundary flag → running sum), the
    standard batch formulation; Structured Streaming's ``session_window``
    is the incremental equivalent. Time arithmetic uses exact integer
    microseconds (``unix_micros``) so results are engine-portable. Adds
    ``session_seq`` (1-based per key) and ``session_start``.
    """
    tb = order_tiebreak or []
    # defensive cast: unix_micros rejects TIMESTAMP_NTZ; the cast is a no-op
    # for TIMESTAMP inputs and value-preserving for NTZ under the session's
    # pinned UTC timezone
    micros = F.unix_micros(F.col(time_col).cast("timestamp"))
    w = Window.partitionBy(key).orderBy(time_col, *tb)
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | (micros - prev > F.lit(gap_seconds * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    df2 = df.withColumn("_new", new_session)
    run = Window.partitionBy(key).orderBy(time_col, *tb).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df3 = df2.withColumn("session_seq", F.sum("_new").over(run).cast("int")).drop("_new")
    sw = Window.partitionBy(key, "session_seq")
    return df3.withColumn("session_start", F.min(time_col).over(sw))


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_cols: list[str],
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Calendar gap-filling with last-observation-carried-forward — the
    time-series companion to :func:`asof_join`: produce one row per (key,
    day) over [start, end], carrying each value column forward across
    missing days (null until a key's first observation). Daily balances,
    stock positions, and metric dashboards all need exactly this spine.

    ``start``/``end`` default to the frame's own min/max day, computed as
    an in-plan broadcast aggregate (no driver action). The spine is
    ``sequence(start, end)`` exploded per key — keys × days rows; the
    fill is one window per key ordered by day using
    ``last(value, ignorenulls)``, so partitioning is by KEY (never a
    global window) and at 100 TB each key's series fills independently.
    If one key's daily series itself outgrows a task, split the window by
    (key, year) and carry the year-boundary value with a second pass —
    not needed at any realistic key cardinality.

    Input must be at (key, day) grain — pre-aggregate first. This
    operator fills gaps, it does not resolve duplicates: a duplicated
    (key, day) joins every copy onto its spine row and the fill then
    propagates whichever sorts last, so the duplication is visible in the
    output (row count > keys × days) rather than silently resolved.
    """
    from pyspark.sql import Window

    if not value_cols:
        raise ValueError("gap_fill_locf needs at least one value column")
    d = df.select(
        F.col(key_col), F.col(date_col).cast("date").alias("_day"), *value_cols
    )
    if start is not None and end is not None:
        bounds = None
        lo, hi = F.lit(start).cast("date"), F.lit(end).cast("date")
    else:
        bounds = d.agg(
            F.min("_day").alias("_lo"), F.max("_day").alias("_hi")
        )
        lo, hi = F.col("_lo"), F.col("_hi")
    keys = d.select(key_col).distinct()
    if bounds is not None:
        keys = keys.crossJoin(F.broadcast(bounds))
    spine = keys.select(
        F.col(key_col),
        F.explode(F.sequence(lo, hi)).alias("_day"),
    )
    joined = spine.join(d, [key_col, "_day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        F.col(key_col),
        F.col("_day").alias(date_col),
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled


def asof_join_values(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Full ``merge_asof`` semantics: attach the matched right row's TIME
    and PAYLOAD columns to every left row, per key.

    - ``backward``: greatest right_time ≤ left_time (inclusive)
    - ``forward``:  smallest right_time ≥ left_time (inclusive)
    - ``nearest``:  whichever of the two is closer; ties prefer backward
    - ``tolerance_seconds``: matches farther than this become NULL
      (applied per direction BEFORE the nearest tie-break, like pandas)

    Shape: the union+window trick of :func:`asof_join` — ONE shuffle on
    the key, a per-key linear window, no range self-join (a naive
    time-range join fans out quadratically on hot keys). The right
    payload rides the window as a struct; duplicate right timestamps per
    key resolve deterministically (max struct = latest by time, then by
    payload values — pin distinct (key, time) upstream if the payload
    must be unique). Output: ``left`` + ``{right_time}{suffix}`` +
    ``{c}{suffix}`` per value column (NULL where unmatched / out of
    tolerance).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    payload = F.struct(
        F.col("_t").alias("_rt"), *[F.col(c) for c in value_cols]
    )
    r = (
        right.select(
            F.col(on).alias("_k"),
            F.col(right_time).alias("_t"),
            *[F.col(c) for c in value_cols],
        )
        # deterministic survivor for duplicate (key, time): max struct
        .groupBy("_k", "_t")
        .agg(F.max(payload).alias("_pay"))
        .withColumn("_is_left", F.lit(0))
    )
    l_ = left.withColumn("_k", F.col(on)).withColumn("_t", F.col(left_time)).withColumn(
        "_is_left", F.lit(1)
    )
    for c in l_.columns:
        if c not in ("_k", "_t", "_is_left"):
            r = r.withColumn(c, F.lit(None).cast(l_.schema[c].dataType))
    l2 = l_.withColumn("_pay", F.lit(None).cast(r.schema["_pay"].dataType))
    unioned = l2.unionByName(r.select(*l2.columns))

    def carried(ascending: bool):
        # right rows sort before left at equal time → inclusive in both
        # directions; backward scans time-asc, forward time-desc
        order = [F.col("_t").asc(), F.col("_is_left").asc()] if ascending else [
            F.col("_t").desc(),
            F.col("_is_left").asc(),
        ]
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(
            F.when(F.col("_is_left") == 0, F.col("_pay")), ignorenulls=True
        ).over(w)

    out = unioned
    want_b = direction in ("backward", "nearest")
    want_f = direction in ("forward", "nearest")
    if want_b:
        out = out.withColumn("_pb", carried(ascending=True))
    if want_f:
        out = out.withColumn("_pf", carried(ascending=False))
    out = out.filter(F.col("_is_left") == 1)

    def within(p):
        if tolerance_seconds is None:
            return p
        delta = F.abs(
            F.col("_t").cast("double") - p["_rt"].cast("double")
        )
        return F.when(delta <= F.lit(float(tolerance_seconds)), p)

    if direction == "backward":
        pick = within(F.col("_pb"))
    elif direction == "forward":
        pick = within(F.col("_pf"))
    else:
        pb, pf = within(F.col("_pb")), within(F.col("_pf"))
        db = F.col("_t").cast("double") - pb["_rt"].cast("double")
        df_ = pf["_rt"].cast("double") - F.col("_t").cast("double")
        pick = (
            F.when(pb.isNull(), pf)
            .when(pf.isNull(), pb)
            .when(db <= df_, pb)  # ties prefer backward
            .otherwise(pf)
        )
    matched = out.withColumn("_pick", pick)
    keep = [c for c in left.columns]
    return matched.select(
        *keep,
        F.col("_pick")["_rt"].alias(f"{right_time}{suffix}"),
        *[F.col("_pick")[c].alias(f"{c}{suffix}") for c in value_cols],
    )
