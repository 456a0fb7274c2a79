"""Target-catalog-driven column conformance (reference §1.4 mechanism 3).

The reference's loaders introspect ``information_schema.columns`` for the
target table and map DataFrame columns onto it before every load:

- `loaders/database_loader.py:94-134` — exact name match ALWAYS wins;
  otherwise a target ``*_id`` column falls back to the most specific
  (longest) DataFrame column that contains its base name and also ends
  in ``_id`` (e.g. target ``cuenta_id`` accepts ``cuenta_contable_id``);
  audit columns (``created_at``/``updated_at``) are never mapped.
- `loaders/simple_loader.py:44-72` — keeps only common columns and
  coerces them to the catalog types (timestamps/dates with
  invalid→NULL, booleans with NULL→false).

Spark-first re-expression: the target schema comes from the JDBC
catalog via Spark's own schema resolution (a metadata-only ``WHERE 1=0``
probe — no rows are read), the mapping is pure driver-side logic over
column-name lists, and the conformance itself is a single ``select`` of
``try_cast``s, so it stays inside whole-stage codegen and adds no
shuffle. Matching is case-insensitive because catalogs fold unquoted
identifiers (Derby/Oracle upper-case, Postgres lower-case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Audit columns the reference refuses to map (database_loader.py:110).
DEFAULT_EXCLUDE = ("created_at", "updated_at")


def conform_column_mapping(
    df_columns: list[str],
    target_columns: list[str],
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE,
) -> dict[str, str]:
    """target column -> source DataFrame column, reference rules:

    1. exact (case-insensitive) name match always wins;
    2. else a ``*_id`` target matches the LONGEST df column that
       contains its base name, ends in ``_id``, and is strictly longer
       (more specific) than the target name;
    3. excluded (audit) targets and unmatched targets are dropped.
    """
    by_lower = {}
    for c in df_columns:  # first occurrence wins on case-duplicate names
        by_lower.setdefault(c.lower(), c)
    excl = {e.lower() for e in exclude}
    mapping: dict[str, str] = {}
    for tcol in target_columns:
        tl = tcol.lower()
        if tl in excl:
            continue
        if tl in by_lower:
            mapping[tcol] = by_lower[tl]
        elif tl.endswith("_id"):
            base = tl[:-3]
            cands = [
                c
                for c in df_columns
                if c.lower() != tl
                and base in c.lower()
                and c.lower().endswith("_id")
                and len(c) > len(tcol)
            ]
            if cands:
                # most specific first; name as tiebreak for determinism
                mapping[tcol] = max(cands, key=lambda c: (len(c), c))
    return mapping


def jdbc_table_schema(
    spark: SparkSession, url: str, table: str, **options: str
) -> T.StructType:
    """The target table's schema straight from the JDBC catalog — Spark
    resolves it with a metadata probe (``SELECT * FROM t WHERE 1=0``);
    no table rows are transferred."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load().schema


def conform_to_table(
    df: DataFrame,
    spark: SparkSession,
    url: str,
    table: str,
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE,
    strict_types: bool = False,
    **options: str,
) -> DataFrame:
    """Rename/cast ``df`` so it loads into JDBC table ``table`` even when
    its column names only fuzzily match the target DDL (the reference's
    day-one migration behavior, `database_loader.py:94-134`).

    Casts mirror `simple_loader.py:66-72`: ``try_cast`` (invalid → NULL,
    the pandas ``errors='coerce'``) with NULL booleans coerced to false.
    ``strict_types=True`` uses plain ``cast`` so bad values raise under
    ANSI mode instead of nulling.

    Raises ``ValueError`` when no target column can be mapped — the
    reference logs-and-skips, but silently loading zero columns is a
    data-loss trap at scale.
    """
    schema = jdbc_table_schema(spark, url, table, **options)
    mapping = conform_column_mapping(df.columns, [f.name for f in schema.fields], exclude)
    if not mapping:
        raise ValueError(
            f"no columns of {df.columns} map onto target table {table} "
            f"({[f.name for f in schema.fields]})"
        )
    types = {f.name: f.dataType for f in schema.fields}
    cols = []
    for tgt, src in mapping.items():
        c = F.col(src)
        c = c.cast(types[tgt]) if strict_types else c.try_cast(types[tgt])
        if isinstance(types[tgt], T.BooleanType):
            c = F.coalesce(c, F.lit(False))
        cols.append(c.alias(tgt))
    return df.select(*cols)


def load_conformed_jdbc(
    df: DataFrame,
    spark: SparkSession,
    url: str,
    table: str,
    mode: str = "append",
    **options: str,
) -> DataFrame:
    """Conform-then-load convenience (the reference's full loader path:
    introspect → map → rename → insert). Returns the conformed frame so
    callers can audit what was actually written."""
    from data_warehouse_punta_fina_spark.sources.writers import write_jdbc

    conformed = conform_to_table(df, spark, url, table, **options)
    write_jdbc(conformed, url, table, mode=mode, **options)
    return conformed
