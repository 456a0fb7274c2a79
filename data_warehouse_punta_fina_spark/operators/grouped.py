"""Grouped-map pandas operators (`applyInPandas`) — the sanctioned
slow path, used ONLY where the computation is genuinely non-relational.

ROADMAP discipline: every previously-considered grouped computation
(trend slopes, z-scores, resampling) decomposed into native aggregates
or windows and was built that way. Isotonic regression does not: the
pool-adjacent-violators algorithm (PAVA) merges neighboring pools until
global monotonicity holds — a data-dependent sequential recursion with
no bounded-depth SQL/window form. It is also genuinely useful in a
warehouse: monotone calibration curves (score → conversion rate,
price → demand) per segment.

Scale shape: one shuffle on the group key, then each group fits
in-memory in ONE Arrow batch on its executor (PAVA is O(n) after the
sort). Groups must individually fit in memory — the standard
grouped-map contract; a 100 TB table with bounded per-group cardinality
(segments, SKUs) is exactly the safe case, one giant group is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pava(y: list[float], w: list[float]) -> list[float]:
    """Pool-adjacent-violators: weighted least-squares monotone
    (non-decreasing) fit. Pure-Python reference implementation — also
    used by the test as the ground truth for the distributed path."""
    # each pool: [value, weight]; merge while out of order
    pools: list[list[float]] = []
    counts: list[int] = []
    for yi, wi in zip(y, w):
        pools.append([yi, wi])
        counts.append(1)
        while len(pools) > 1 and pools[-2][0] > pools[-1][0]:
            v2, w2 = pools.pop()
            c2 = counts.pop()
            v1, w1 = pools[-1]
            tot = w1 + w2
            pools[-1] = [(v1 * w1 + v2 * w2) / tot, tot]
            counts[-1] += c2
    out: list[float] = []
    for (v, _), c in zip(pools, counts):
        out.extend([v] * c)
    return out


def isotonic_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group isotonic (non-decreasing in ``x_col``) regression of
    ``y_col`` via PAVA inside ``applyInPandas``. Returns the input keys +
    (x, y, y_fit); ties on x are ordered deterministically (x, then y) so
    the fit is reproducible. The fitted column is the weighted
    least-squares monotone sequence — the calibration-curve primitive.
    """
    import pandas as pd  # noqa: F401 — grouped-map contract

    out_schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in group_cols]
        + [
            f"{x_col} {dict(df.dtypes)[x_col]}",
            f"{y_col} {dict(df.dtypes)[y_col]}",
            "y_fit double",
        ]
    )

    def _fit(pdf):
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort").reset_index(drop=True)
        w = (
            pdf[weight_col].astype(float).tolist()
            if weight_col
            else [1.0] * len(pdf)
        )
        pdf["y_fit"] = _pava(pdf[y_col].astype(float).tolist(), w)
        return pdf[[*group_cols, x_col, y_col, "y_fit"]]

    return df.groupBy(*group_cols).applyInPandas(_fit, out_schema)
