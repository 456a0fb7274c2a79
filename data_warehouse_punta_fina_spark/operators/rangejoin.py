"""Range/theta-join rewrites (beyond the reference's surface).

A ``value BETWEEN lo AND hi`` join against a band table has two physical
tiers:

- tiny band table → broadcast nested-loop (Spark's default; fine at any
  fact size because the band side is constant) — used directly by the
  ``events_value_band_rangejoin`` query;
- LARGE band table → the standard bucketized rewrite below: a nested-loop
  over B bands costs rows×B comparisons, while gridding both sides turns
  it into an equi-join (shuffle or broadcast on the cell key) plus a
  cheap residual predicate. This is how interval joins scale on any
  MPP/stream engine (e.g. Flink's interval join binning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OVERFLOW = -1  # cell id for the value axis beyond hi_cap


def bucketed_range_join(
    facts: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 100.0,
    hi_cap: float | None = None,
    broadcast_bands: bool = True,
) -> DataFrame:
    """Equi-join rewrite of ``facts.value ∈ [band.lo, band.hi)``.

    Each band explodes to the grid cells it overlaps
    (``floor(lo/step) .. ceil(hi/step)-1``); each fact row maps to its one
    cell ``floor(value/step)``. Joining on the cell key touches only the
    bands overlapping the row's cell — O(rows × bands_per_cell) instead of
    O(rows × bands) — and the exact semi-open predicate re-verifies each
    candidate, so the result is identical to the nested-loop join for ANY
    step/cap (they only tune fan-out).

    ``hi_cap`` bounds the grid for open-ended/huge bands (e.g. a
    ``[250, +inf)`` catch-all would otherwise explode to hi/step cells):
    values ≥ hi_cap fall into one overflow cell, and every band reaching
    past the cap registers there too. The value axis is partitioned
    exactly — rows below the cap never meet a band through the overflow
    cell unless they genuinely overlap its gridded part.
    """
    lo, hi, v = F.col(lo_col), F.col(hi_col), F.col(value_col)
    cap = F.lit(hi_cap) if hi_cap is not None else None

    lo_cell = F.floor(lo / F.lit(step)).cast("long")
    hi_eff = hi if cap is None else F.least(hi, cap)
    hi_cell = F.greatest(lo_cell, F.ceil(hi_eff / F.lit(step)).cast("long") - F.lit(1))
    grid_cells = F.sequence(lo_cell, hi_cell)
    if cap is not None:
        # bands fully above the cap contribute no grid cells
        grid_cells = F.when(lo < cap, grid_cells).otherwise(F.array().cast("array<long>"))
        grid_cells = F.when(
            hi > cap, F.concat(grid_cells, F.array(F.lit(_OVERFLOW).cast("long")))
        ).otherwise(grid_cells)
    cells = bands.withColumn("_cell", F.explode(grid_cells))
    if broadcast_bands:
        cells = F.broadcast(cells)

    fact_cell = F.floor(v / F.lit(step)).cast("long")
    if cap is not None:
        fact_cell = F.when(v >= cap, F.lit(_OVERFLOW).cast("long")).otherwise(fact_cell)
    gridded = facts.withColumn("_cell", fact_cell)
    return (
        gridded.join(cells, "_cell")
        .filter((v >= lo) & (v < hi))
        .drop("_cell", lo_col, hi_col)
    )
