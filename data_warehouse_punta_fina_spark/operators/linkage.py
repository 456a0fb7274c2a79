"""Record linkage / entity resolution (Fellegi & Sunter 1969).

The probabilistic-linkage counterpart to the text-dedup tier: match
records ACROSS two tables that lack a shared key (customers vs a
purchased marketing list, suppliers vs a registry) by comparing fields
and summing per-field log-likelihood-ratio weights. The reference
warehouse joins only on exact keys (`complete_fact_builder.py` SK
lookups); production master-data management needs the fuzzy tier.

Scale design — the textbook decomposition:

- **Blocking**: candidate pairs come ONLY from an equi-join on blocking
  keys (e.g. nation × balance band). The all-pairs comparison never
  happens; cost is Σ_block |A_b|·|B_b|, bounded by the block key's
  granularity. Skewed blocks are ordinary join skew (AQE splits them).
- **Comparison vector**: per-field agreement is computed per candidate
  pair with JVM builtins (equality, absolute difference, Levenshtein —
  all codegen). No UDFs.
- **Scoring**: Fellegi-Sunter weights ``ln(m/u)`` (agree) and
  ``ln((1−m)/(1−u))`` (disagree) from caller-supplied m/u
  probabilities. Weights are plain literals rounded to 6 places at plan
  build — every engine sums the identical doubles in the identical
  order, so scores are bit-exact cross-engine (the repo-wide
  determinism discipline).

``m`` = P(field agrees | pair is a true match), ``u`` = P(field agrees
| pair is a non-match) — in production estimated by EM; here supplied,
which keeps the operator deterministic and oracle-checkable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldCompare:
    """One linkage comparator: agreement on (col_a vs col_b).

    kind: 'exact' | 'abs_diff' (|a−b| ≤ tol) | 'levenshtein'
    (distance ≤ tol). m/u are the Fellegi-Sunter conditional agreement
    probabilities; NULL on either side counts as disagreement (the
    conservative convention)."""

    name: str
    col_a: str
    col_b: str
    m: float
    u: float
    kind: str = "exact"
    tol: float = 0.0

    def weights(self) -> tuple[float, float]:
        """(agreement, disagreement) weights, rounded half-up to 6
        places — the exact literals both engines embed."""
        wa = math.floor(math.log(self.m / self.u) * 1e6 + 0.5) / 1e6
        wd = math.floor(math.log((1 - self.m) / (1 - self.u)) * 1e6 + 0.5) / 1e6
        return wa, wd

    def agree_col(self) -> Column:
        a, b = F.col(f"a.{self.col_a}"), F.col(f"b.{self.col_b}")
        if self.kind == "exact":
            c = a == b
        elif self.kind == "abs_diff":
            c = F.abs(a - b) <= F.lit(self.tol)
        elif self.kind == "levenshtein":
            c = F.levenshtein(a, b) <= F.lit(int(self.tol))
        else:
            raise ValueError(f"unknown comparator kind {self.kind!r}")
        return F.coalesce(c, F.lit(False))

    def agree_sql(self) -> str:
        if self.kind == "exact":
            c = f"a.{self.col_a} = b.{self.col_b}"
        elif self.kind == "abs_diff":
            c = f"abs(a.{self.col_a} - b.{self.col_b}) <= {self.tol!r}"
        elif self.kind == "levenshtein":
            c = f"levenshtein(a.{self.col_a}, b.{self.col_b}) <= {int(self.tol)}"
        else:
            raise ValueError(f"unknown comparator kind {self.kind!r}")
        return f"COALESCE({c}, FALSE)"


def fellegi_sunter_link(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    block_a: list[str],
    block_b: list[str],
    fields: list[FieldCompare],
    match_threshold: float,
    review_threshold: float | None = None,
) -> DataFrame:
    """Blocked probabilistic linkage. Output one row per candidate pair:
    (id_a, id_b, agree_<field>…, score, verdict) with verdict ∈
    {'match', 'review', 'non_match'} by the two thresholds
    (``review_threshold`` defaults to ``match_threshold`` — no review
    band). Pairs outside any shared block are never materialized."""
    if review_threshold is None:
        review_threshold = match_threshold
    da, db = a.alias("a"), b.alias("b")
    cond = None
    for ka, kb in zip(block_a, block_b):
        c = F.col(f"a.{ka}") == F.col(f"b.{kb}")
        cond = c if cond is None else (cond & c)
    pairs = da.join(db, cond)
    score: Column = F.lit(0.0)
    agree_cols = []
    for f in fields:
        wa, wd = f.weights()
        ag = f.agree_col().alias(f"agree_{f.name}")
        agree_cols.append(ag)
        score = score + F.when(f.agree_col(), F.lit(wa)).otherwise(F.lit(wd))
    return pairs.select(
        F.col(f"a.{id_a}").alias("id_a"),
        F.col(f"b.{id_b}").alias("id_b"),
        *agree_cols,
        score.alias("score"),
        F.when(score >= F.lit(match_threshold), F.lit("match"))
        .when(score >= F.lit(review_threshold), F.lit("review"))
        .otherwise(F.lit("non_match"))
        .alias("verdict"),
    )


def fellegi_sunter_oracle_sql(
    a_sql: str,
    b_sql: str,
    id_a: str,
    id_b: str,
    block_a: list[str],
    block_b: list[str],
    fields: list[FieldCompare],
    match_threshold: float,
    review_threshold: float | None = None,
) -> str:
    """DuckDB twin generated from the SAME FieldCompare list — weights,
    comparator predicates, and summation order cannot drift from the
    Spark side."""
    if review_threshold is None:
        review_threshold = match_threshold
    on = " AND ".join(f"a.{ka} = b.{kb}" for ka, kb in zip(block_a, block_b))
    agrees = ", ".join(f"{f.agree_sql()} AS agree_{f.name}" for f in fields)
    # every literal is CAST AS DOUBLE: DuckDB otherwise parses bare
    # decimals as DECIMAL and sums exactly, which can differ in the last
    # ulp from Spark's IEEE double fold (and trips the no-decimal-outputs
    # gate). With double literals both engines run the identical IEEE
    # additions in the identical order.
    score_terms = " + ".join(
        f"CASE WHEN {f.agree_sql()} THEN CAST({f.weights()[0]!r} AS DOUBLE) "
        f"ELSE CAST({f.weights()[1]!r} AS DOUBLE) END"
        for f in fields
    )
    score = f"CAST(0.0 AS DOUBLE) + {score_terms}"
    return f"""
SELECT a.{id_a} AS id_a, b.{id_b} AS id_b,
       {agrees},
       {score} AS score,
       CASE WHEN ({score}) >= {match_threshold!r} THEN 'match'
            WHEN ({score}) >= {review_threshold!r} THEN 'review'
            ELSE 'non_match' END AS verdict
FROM ({a_sql}) a JOIN ({b_sql}) b ON {on}
"""
