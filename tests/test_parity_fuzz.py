"""Property-based cross-engine parity for the portable rounding primitive.

The whole oracle strategy rests on floor(x·10^s + 0.5)/10^s being
bit-identical across engines. Fuzz it: Spark vs DuckDB vs plain-Python
IEEE arithmetic must agree on arbitrary finite doubles.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_round2(x: float) -> Decimal:
    return Decimal(str(math.floor(x * 100 + 0.5) / 100)).quantize(Decimal("0.01"))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=200,
    )
)
def test_pround2_matches_duckdb_and_python(spark, values):
    from data_warehouse_punta_fina_spark.functions.money import pround2

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, x double")
    got = {
        r["i"]: r["r"]
        for r in df.select("i", pround2("x").alias("r")).collect()
    }
    duck = duckdb.connect()
    for i, v in enumerate(values):
        d = duck.execute(
            "SELECT CAST(FLOOR(CAST(? AS DOUBLE) * 100 + 0.5) / 100 AS DECIMAL(15,2))", [v]
        ).fetchone()[0]
        assert got[i] == d, f"spark={got[i]} duck={d} x={v!r}"
        assert got[i] == _py_round2(v), f"spark={got[i]} py={_py_round2(v)} x={v!r}"
