"""Registry-wide oracle output-type gate (round-6, VERDICT r5 #2).

Round 5 shipped 5 driver hash-fails whose only defect was an uncast
``SUM(integer)`` in the DuckDB oracle SQL: DuckDB widens to HUGEINT,
which crosses Arrow as decimal128(38,0) while Spark emits int64, so the
driver's typed hasher mismatches even though every value is identical.

This test makes that class impossible to land: it binds (DESCRIBE, no
execution) EVERY oracle in ``oracle_sql()`` against the sf0.001 views
and fails on any output column whose DuckDB type is outside the
canonical set {INTEGER, BIGINT, DOUBLE, VARCHAR, BOOLEAN, DATE,
TIMESTAMP[_*], and lists/structs thereof}.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: DuckDB type names that the driver's typed hasher cannot reconcile
#: with a Spark output column. \bTIME\b intentionally does not match
#: TIMESTAMP (no word boundary mid-token).
BANNED = re.compile(
    r"\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|SMALLINT|TINYINT"
    r"|DECIMAL|FLOAT|REAL|BLOB|INTERVAL|UUID|BIT|TIME)\b"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_every_oracle_output_type_is_canonical(duck):
    import __spark_entry__ as entrymod

    bad: dict[str, list[str]] = {}
    oracles = entrymod.oracle_sql()
    assert oracles, "oracle registry is empty"
    for name, sql in oracles.items():
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        offenders = [
            f"{col}:{dtype}" for col, dtype, *_ in rows if BANNED.search(dtype.upper())
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracle SQL emits non-canonical column types (cast them in the SQL, "
        "e.g. CAST(SUM(x) AS BIGINT)): " + repr(bad)
    )


def test_schema_of_variant_rendering_pinned(spark):
    """events_variant_stats no longer hash-compares the runtime
    ``schema_of_variant`` rendering (Spark-version-dependent literal,
    VERDICT r5 #3); the expected rendering is pinned here instead so a
    Spark upgrade that changes it is still caught — by pytest, not by a
    silent driver hash mismatch."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(F.schema_of_variant(F.parse_json(F.lit('{"k": 1}'))).alias("s"))
        .head()
    )
    assert row["s"] == "OBJECT<k: BIGINT>"


#: Driver-window outputs must be scalar-typed: the driver's pandas
#: canonicalizer sorts every column, and list/struct/map values raise
#: ``TypeError: unhashable type`` inside ``sort_values`` (round-7 red
#: row doc_feature_hashing, the only complex-typed output in the
#: registry at the time). Flatten vectors to CSV / exploded rows in the
#: driver-window projection; keep the array-returning operator for
#: composition and extras.
COMPLEX_ORACLE = re.compile(r"(\[\]|\bSTRUCT\b|\bMAP\b|\bUNION\b|\bLIST\b)")


def test_driver_window_oracle_outputs_are_scalar(duck):
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    bad: dict[str, list[str]] = {}
    for name in entrymod.queries():
        sql = oracles.get(name)
        if sql is None:  # rows-only checked by the driver, no oracle twin
            continue
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        offenders = [
            f"{col}:{dtype}"
            for col, dtype, *_ in rows
            if COMPLEX_ORACLE.search(dtype.upper())
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "driver-window oracle emits complex-typed columns the driver "
        "canonicalizer cannot sort (flatten them): " + repr(bad)
    )


def test_driver_window_spark_schemas_are_scalar(spark):
    """The Spark side of the same gate: analysis-only (``.schema`` builds
    the plan, nothing executes), so the sweep stays cheap. This is the
    authoritative check — the driver canonicalizes the SPARK result."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entrymod

    bad: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF_DIR).schema
        offenders = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "driver-window Spark outputs carry complex-typed columns the "
        "driver canonicalizer cannot sort (flatten them): " + repr(bad)
    )
