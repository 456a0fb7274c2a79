"""Skew-aware aggregation (scale posture, SURVEY.md §4).

Spark's hash aggregate already does map-side partial aggregation, and AQE
splits skewed JOIN partitions — but a skewed GROUP BY key whose partials
are large (e.g. count-distinct states, big collect-style aggs) still
funnels one reducer. The classic fix is explicit two-phase aggregation
over a salt: shuffle (key, salt) first (buckets × smaller groups), then
re-aggregate by key. For algebraic aggs (sum/count/min/max) the result is
identical to the direct aggregation — asserted by the oracle-backed
``salted_revenue_by_flag`` driver query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    buckets: int = 16,
    salt_from: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output name → (fn, input column) with fn in
    sum/count/min/max (the re-aggregatable algebraic aggregates the
    reference's config declares, `etl_config.yaml:147-200`). ``salt_from``
    defaults to a deterministic hash of the input row's partition — any
    salt yields the same final result; determinism only matters for
    reproducing intermediate partial sizes.
    """
    salt = (salt_from if salt_from is not None else F.spark_partition_id()) % F.lit(buckets)
    partial_exprs = []
    final_exprs = []
    for name, (fn, col) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{name}"))
            final_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{name}"))
            final_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{name}"))
            final_exprs.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{name}"))
            final_exprs.append(F.max(f"_p_{name}").alias(name))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
