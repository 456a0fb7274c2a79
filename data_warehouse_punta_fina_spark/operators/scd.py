"""Slowly-changing-dimension type 2 merge.

The reference declares ``incremental`` / ``upsert`` load strategies but
stubs both to truncate-and-load (`loaders/database_loader.py:204-212`,
SURVEY.md §2.1 S12) — this operator completes them the warehouse way.
Without a transactional table format (Delta/Iceberg MERGE INTO is not in
this image), SCD2 is the classic emulation: split current rows into
unchanged / closed, append new versions, union (the CDC/SCD2 pattern from
the public Spark playbook).

Shuffle shape: two broadcast-or-hash joins on the business key + a union —
at 100 TB the updates batch is normally the small side and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: Column,
    end_of_time: str = "9999-12-31",
) -> DataFrame:
    """Merge an updates batch into an SCD2 dimension.

    ``current`` must carry (key, tracked..., valid_from, valid_to,
    is_current); ``updates`` carries (key, tracked...). Semantics:

    - key in both, any tracked column differs → close the current row
      (valid_to = effective_date, is_current = false) and append a new
      version (valid_from = effective_date);
    - key only in updates → brand-new member row;
    - key only in current, or values unchanged → row passes through.
    """
    cur = current.alias("c")
    upd = updates.alias("u")
    changed_cond = None
    for col in tracked:
        piece = ~F.col(f"c.{col}").eqNullSafe(F.col(f"u.{col}"))
        changed_cond = piece if changed_cond is None else (changed_cond | piece)

    joined = cur.filter(F.col("c.is_current")).join(upd, F.col(f"c.{key}") == F.col(f"u.{key}"), "left")
    untouched_current = joined.filter(F.col(f"u.{key}").isNull() | ~changed_cond).select("c.*")
    closed = (
        joined.filter(F.col(f"u.{key}").isNotNull() & changed_cond)
        .select("c.*")
        .withColumn("valid_to", effective_date)
        .withColumn("is_current", F.lit(False))
    )
    new_versions = (
        joined.filter(F.col(f"u.{key}").isNotNull() & changed_cond)
        .select(F.col(f"c.{key}").alias(key), *[F.col(f"u.{col}").alias(col) for col in tracked])
        .withColumn("valid_from", effective_date)
        .withColumn("valid_to", F.to_date(F.lit(end_of_time)))
        .withColumn("is_current", F.lit(True))
    )
    brand_new = (
        upd.join(cur.filter(F.col("c.is_current")), F.col(f"u.{key}") == F.col(f"c.{key}"), "left_anti")
        .select(F.col(key), *[F.col(col) for col in tracked])
        .withColumn("valid_from", effective_date)
        .withColumn("valid_to", F.to_date(F.lit(end_of_time)))
        .withColumn("is_current", F.lit(True))
    )
    history = current.filter(~F.col("is_current"))
    cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    return (
        history.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(new_versions.select(*cols))
        .unionByName(brand_new.select(*cols))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    hash_compare: bool = True,
) -> DataFrame:
    """CDC-style diff of two table snapshots: per key, 'inserted' /
    'deleted' / 'updated' / 'unchanged'.

    The reference reloads every table in full each run
    (`loaders/database_loader.py:204-212` stubs incremental to
    truncate-and-load); this is the incremental upgrade's first half —
    detect what changed — feeding :func:`scd2_merge` or an upsert writer
    with only the delta. One full-outer join on the key.

    ``hash_compare=True`` (the wide-row scale path) reduces each side to a
    64-bit row hash before the join, so wide rows cost one comparison;
    ``False`` compares the columns null-safely after the join — exact (no
    collision risk) and what the external oracle mirrors with
    ``IS NOT DISTINCT FROM``.
    """
    cols = compare or [c for c in new.columns if c not in keys]
    if hash_compare:
        o = old.select(*keys, F.lit(True).alias("_in_old"), F.xxhash64(*[F.col(c) for c in cols]).alias("_h_old"))
        n = new.select(*keys, F.lit(True).alias("_in_new"), F.xxhash64(*[F.col(c) for c in cols]).alias("_h_new"))
        changed = F.col("_h_old") != F.col("_h_new")
    else:
        o = old.select(*keys, F.lit(True).alias("_in_old"), *[F.col(c).alias(f"_o_{c}") for c in cols])
        n = new.select(*keys, F.lit(True).alias("_in_new"), *[F.col(c).alias(f"_n_{c}") for c in cols])
        changed = None
        for c in cols:
            neq = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
            changed = neq if changed is None else (changed | neq)
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_in_old").isNull(), "inserted")
        .when(F.col("_in_new").isNull(), "deleted")
        .when(changed, "updated")
        .otherwise("unchanged")
        .alias("change_type"),
    )


def type1_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Type-1 (overwrite-in-place) upsert: updates win on key collision,
    unmatched target rows pass through — the reference's declared
    ``upsert`` load strategy (`loaders/database_loader.py:204-212`,
    stubbed there to truncate-and-load). One anti-join on the key; the
    updates batch is normally the small side and broadcasts."""
    survivors = target.join(updates.select(*keys), keys, "left_anti")
    return survivors.unionByName(updates)


def pit_lookup(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    as_of_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
    broadcast: bool | None = None,
) -> DataFrame:
    """Point-in-time lookup: join each fact row to the SCD2 dimension
    version valid at the fact's timestamp — the Kimball temporal join
    that makes a versioned dimension queryable
    (``as_of >= valid_from AND as_of < valid_to``, half-open to match
    :func:`scd2_merge`'s close/open convention: on the change date the
    NEW version is in effect).

    Scale shape: the equi-part of the predicate drives the join with the
    interval bounds as residual filter. By default (``broadcast=None``)
    Spark's own ``autoBroadcastJoinThreshold`` picks the strategy — a
    BroadcastHashJoin (no fact shuffle) while the dimension fits, falling
    back to a shuffle equi-join past the threshold. An SCD2 dimension
    derived from a scale-proportional entity (customers: ~15M rows at
    sf100) outgrows any safe broadcast, so an unconditional hint here
    would bypass that safeguard and ship multi-GB broadcasts; pass
    ``broadcast=True`` only for dimensions KNOWN small (catalogs), or
    ``False`` to force the shuffle path. Either way the shuffle variant
    stays linear: each fact row fans out across its key's few versions
    and the interval residual keeps exactly one — SCD2 version counts per
    key are small by construction.
    """
    f, d = facts.alias("f"), dim.alias("d")
    cond = (
        (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}"))
        & (F.col(f"f.{as_of_col}") >= F.col(f"d.{valid_from}"))
        & (F.col(f"f.{as_of_col}") < F.col(f"d.{valid_to}"))
    )
    if broadcast is True:
        right: DataFrame = F.broadcast(d)
    elif broadcast is False:
        right = d.hint("shuffle_hash")
    else:
        right = d
    return f.join(right, cond, how)


def type3_update(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: str,
    prev_col: str | None = None,
) -> DataFrame:
    """Type-3 (previous-value column) dimension update — the third
    Kimball SCD flavor next to :func:`type1_upsert` (overwrite) and
    :func:`scd2_merge` (versioned rows): the row is overwritten like
    Type 1, but the OLD value of the one tracked attribute survives in
    a ``prev_<attr>`` column, giving exactly one generation of "before"
    for soft-transition reporting (both the old and new rollup stay
    queryable without version rows).

    Semantics (standard): on key match with a CHANGED tracked value,
    ``tracked`` takes the update's value and ``prev_col`` the target's
    old one; a match with an unchanged value keeps the existing
    ``prev_col`` (re-asserting a value is not a change); unmatched
    target rows pass through; brand-new keys insert with NULL
    ``prev_col``. Non-tracked attributes always take the update's
    values (Type-1 behavior).

    NULL tracked values in an update are taken LITERALLY (null-safe
    compare): an explicit NULL differing from the current value IS a
    change — ``tracked`` becomes NULL and ``prev_col`` captures the old
    value. This deliberately diverges from the COALESCE-keeps-old
    convention: updates here are whole-row assertions (matching
    :func:`type1_upsert`), so "I don't know anymore" must be
    representable. Callers wanting keep-old-on-NULL should pre-filter
    ``updates.filter(col(tracked).isNotNull())``. Pinned by
    ``test_type3_null_tracked_update_overwrites``.

    One left join keyed on the natural key (the updates batch is
    normally the small side and broadcasts) — the target is read once
    and never shuffled on anything but the key.
    """
    prev_col = prev_col or f"prev_{tracked}"
    if prev_col not in target.columns:
        target = target.withColumn(prev_col, F.lit(None).cast(target.schema[tracked].dataType))
    upd_cols = [c for c in updates.columns if c not in keys]
    # explicit match marker — an update may legitimately carry NULLs, so
    # "some update column is not null" is NOT a valid match test
    u = updates.select(
        *keys,
        F.lit(True).alias("_u_matched"),
        *[F.col(c).alias(f"_u_{c}") for c in upd_cols],
    )
    joined = target.join(u, keys, "left")
    matched = F.col("_u_matched").eqNullSafe(F.lit(True))
    changed = matched & (
        ~F.col(f"_u_{tracked}").eqNullSafe(F.col(tracked))
    )
    out_cols = list(keys)
    for c in target.columns:
        if c in keys:
            continue
        if c == tracked:
            expr = F.when(matched, F.col(f"_u_{tracked}")).otherwise(F.col(tracked))
        elif c == prev_col:
            expr = F.when(changed, F.col(tracked)).otherwise(F.col(prev_col))
        elif c in upd_cols:
            expr = F.when(matched, F.col(f"_u_{c}")).otherwise(F.col(c))
        else:
            expr = F.col(c)
        out_cols.append(expr.alias(c))
    existing = joined.select(*out_cols)
    new_rows = updates.join(target.select(*keys), keys, "left_anti")
    for c in target.columns:
        if c not in new_rows.columns:
            new_rows = new_rows.withColumn(
                c, F.lit(None).cast(target.schema[c].dataType)
            )
    return existing.unionByName(new_rows.select(*[c for c in target.columns]))
