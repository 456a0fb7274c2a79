"""Surrogate-key lookup join with default-member fallback — the reference's
signature operator (SURVEY.md §2.3 J3; `complete_fact_builder.py:75-196`).

Physical posture: dimensions are small (thousands to low millions of rows)
while facts are the 100 TB side, so the dim side is always broadcast —
no shuffle of the fact table, the join runs map-side inside whole-stage
codegen. For a dimension too big to broadcast the same function degrades
gracefully to a shuffled hash join; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sk_lookup(
    fact: DataFrame,
    dim: DataFrame,
    natural_key: str | list[str],
    fact_key: str | list[str] | None = None,
    sk: str = "sk",
    out: str | None = None,
    default: int | None = 1,
    broadcast: bool = True,
    carry: list[str] | None = None,
) -> DataFrame:
    """Resolve a fact natural key to a dimension surrogate key.

    Left-join ``fact`` to ``dim(sk, natural_key)``; unmatched rows fall back
    to the default member (SK=1 'Sin …' row in the reference,
    `main.py:419-437`). Row count of ``fact`` is preserved (1:1 join —
    callers must pass a deduped dimension).

    ``carry`` attaches extra dimension attributes in the SAME broadcast
    join — one dim build + one broadcast instead of a second enrichment
    join against the same dimension (e.g. fact_ventas pulls
    ``costo_estandar`` alongside ``producto_id``).
    """
    nk = [natural_key] if isinstance(natural_key, str) else list(natural_key)
    fk = [fact_key] if isinstance(fact_key, str) else list(fact_key or nk)
    out = out or sk
    extra = [F.col(c) for c in (carry or [])]
    lookup = dim.select(F.col(sk).alias(out), *[F.col(k) for k in nk], *extra).dropDuplicates(nk)
    if broadcast:
        lookup = F.broadcast(lookup)
    cond = None
    for f, n in zip(fk, nk):
        c = fact[f] == lookup[n]
        cond = c if cond is None else (cond & c)
    joined = fact.join(lookup, cond, "left").drop(*[lookup[n] for n in nk])
    if default is not None:
        joined = joined.withColumn(out, F.coalesce(F.col(out), F.lit(default)))
    return joined


def scalar_lookup(fact: DataFrame, one_row: DataFrame) -> DataFrame:
    """Broadcast-style scalar lookup (J8): attach a single-row dimension as
    constant columns (reference `complete_fact_builder.py:421-433`).
    Implemented as a broadcast cross join — no driver collect."""
    return fact.crossJoin(F.broadcast(one_row.limit(1)))
