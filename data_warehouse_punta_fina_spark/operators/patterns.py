"""Event-sequence pattern matching over sessions (MATCH_RECOGNIZE-lite).

Spark has no MATCH_RECOGNIZE; the classic scalable workaround is to
reduce each session's ordered event stream to a symbol STRING and run a
regular expression over it — sequence detection becomes one aggregate
plus one regexp per session, no self-joins, no per-step window chains
(a k-step funnel via joins costs k−1 joins; the string form costs zero
and handles arbitrary regular patterns: negation classes, repetition,
alternation).

Determinism: events order by (time, tiebreak) into a sort_array'd
struct list — a total order, so the symbol string is unique; the symbol
alphabet comes from an explicit mapping (unknown types → '_'); matches
count non-overlapping leftmost occurrences (the shared Java/RE2
convention, mirrored in the DuckDB oracle via regexp_extract_all).

Scale: sessions are the unit of work — the collect_list is
session-sized (bounded by the session gap), never user- or
corpus-sized; pathological sessions cap via ``max_events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_punta_fina_spark.operators.asof import sessionize


def session_pattern_match(
    events: DataFrame,
    key: str,
    time_col: str,
    type_col: str,
    symbols: dict[str, str],
    pattern: str,
    gap_seconds: int = 6 * 3600,
    tiebreak: list[str] | None = None,
    max_events: int | None = 10_000,
) -> DataFrame:
    """Per session: the ordered symbol sequence and how many
    non-overlapping matches of ``pattern`` it contains. Only matching
    sessions return. Output: (key, session_seq, session_start,
    n_events, n_matches)."""
    tb = tiebreak or []
    ses = sessionize(events, key, time_col, gap_seconds, order_tiebreak=tb)
    sym = F.lit("_")
    for etype, s in sorted(symbols.items()):
        sym = F.when(F.col(type_col) == etype, F.lit(s)).otherwise(sym)
    rows = ses.select(
        key,
        "session_seq",
        "session_start",
        F.struct(F.col(time_col).alias("_t"), *[F.col(c) for c in tb], sym.alias("_s")).alias(
            "_e"
        ),
    )
    agg = rows.groupBy(key, "session_seq", "session_start").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list("_e")), lambda e: e["_s"]), ""
        ).alias("_seq"),
    )
    if max_events is not None:
        agg = agg.filter(F.col("n_events") <= max_events)
    return agg.select(
        key,
        "session_seq",
        "session_start",
        "n_events",
        F.regexp_count(F.col("_seq"), F.lit(pattern)).cast("long").alias("n_matches"),
    ).filter(F.col("n_matches") > 0)
