"""Materialization of multiply-consumed intermediates.

A DataFrame self-join (LSH band tables, shingle tables, k-means
centroids) re-executes its whole subplan per branch unless the
intermediate is materialized. Two tiers:

- **ephemeral** (default): ``localCheckpoint(eager=False)`` — blocks live
  on executors, zero I/O, ideal for a single interactive action. The
  caveat at cluster scale: checkpointed blocks have NO lineage, so a lost
  executor forces recompute of the whole plan from the source.
- **durable**: write the intermediate to parquet and read it back. Any
  executor loss replays from the files; the table is also reusable across
  jobs (this is how a persisted LSH band index is born — see
  ``incremental_lsh_dedup``'s ``corpus_bands``).

Operators that materialize an intermediate take an optional ``*_path``
parameter and route it here, so the sandbox default stays cheap while a
production deployment can flip every self-join input to durable storage
with one argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, path: str | None = None) -> DataFrame:
    """Materialize ``df`` once for multi-branch consumption.

    ``path=None`` → lazy local checkpoint (ephemeral, executor-resident).
    ``path=...``  → write-then-read parquet (durable, lineage-replayable,
    survives executor loss; column metadata — e.g. the LSH parameter
    fingerprint on band tables — survives the round-trip in the parquet
    footer).

    NOTE the durable path is EAGER by design: the write job runs at CALL
    time (not first action) and overwrites whatever parquet exists at
    ``path`` — durable materialization cannot be expressed lazily inside
    one Spark plan. Pass a path only when you will execute the returned
    plan; plan-inspection-only callers should use the default."""
    if path is None:
        return df.localCheckpoint(eager=False)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
