"""Schema-enforced readers (reference SURVEY.md §2.1 S1-S6).

The reference reads PostgreSQL with psycopg2 (`extractors/database_extractor.py:23-110`)
and CSV with pandas (`extractors/csv_extractor.py:22-68`). Here every source
is declarative: Catalyst pushes filters/projections into the scan (JDBC
pushdown, Parquet predicate pushdown + column pruning), which covers the
reference's hand-written WHERE/column-list SQL (S2/S3) for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_punta_fina_spark.schemas import SOURCE_SCHEMAS, TABLE_NAMES


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Parquet scan (S6). Schema optional — parquet is self-describing."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S4/S5). Prefer an explicit schema; inference is a 2nd full scan.

    Large files are split across partitions natively
    (``spark.sql.files.maxPartitionBytes``), which replaces the reference's
    chunked ``pd.read_csv(chunksize=...)`` loop (`core/batch_processor.py:345-354`).
    """
    reader = spark.read.option("header", str(header).lower()).option("encoding", "UTF-8")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — self-describing columnar like parquet; predicate
    pushdown and column pruning work identically (`PushedFilters` in the
    plan), so the engine's scan posture is format-agnostic."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """JSON-lines scan — the interchange format crawled/labeled corpora
    actually arrive in (one JSON object per line; beyond the reference's
    CSV/parquet surface). Prefer an explicit schema: inference is a
    second full scan AND silently unions divergent shapes, where a
    declared StructType makes shape drift a loud null. Lines that do not
    parse land in ``_corrupt_record`` (PERMISSIVE default) rather than
    killing a 100 TB job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_tolerant(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Quarantining JSONL ingestion: (good, bad). A 100 TB crawl WILL
    contain malformed lines; PERMISSIVE mode only captures them when the
    schema declares the corrupt-record column, so this appends it, splits
    on it, and returns clean rows (column dropped) plus a quarantine
    frame of the raw offending lines — the reference's row-level
    validation quarantine (`core/data_validator.py`) at the INGESTION
    boundary instead of post-load. Spark requires caching or a
    materialization barrier before filtering on the corrupt column
    (SPARK-21610: the scan otherwise prunes the data columns the parse
    needs); the split here goes through one cached pass."""
    full = T.StructType(
        [*schema.fields, T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl_tolerant`: (good, bad) with
    malformed lines quarantined instead of killing the job — the
    reference ingests ~12 hand-maintained CSVs (`extractors/
    csv_extractor.py`), exactly the files that arrive with broken rows.
    A row is corrupt when it cannot be parsed INTO THE SCHEMA (wrong
    column count, unparseable type); the raw line lands in the
    quarantine frame."""
    full = T.StructType(
        [*schema.fields, T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
        .cache()
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan (S1-S3). Filters/projections push down to the database.

    ``partition_column`` + bounds gives a parallel read (the reference reads
    single-threaded; on a cluster a single-connection JDBC read is the
    bottleneck, so bound-partitioned reads are the default posture).
    """
    reader = spark.read.format("jdbc").option("url", url)
    if query is not None:
        reader = reader.option("query", query)
    elif table is not None:
        reader = reader.option("dbtable", table)
    else:
        raise ValueError("either table or query is required")
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table with its declared schema.

    The testdata parquet has stored timestamps under two encodings across
    rounds; columns declared TimestampType in SOURCE_SCHEMAS are normalized
    here so downstream operators always see TIMESTAMP regardless of how the
    files were written:

    - ``TIMESTAMP(NANOS)``: Spark reads raw int64 nanos under
      ``spark.sql.legacy.parquet.nanosAsLong`` → converted via
      micros = nanos div 1000 (integer division, NOT ``/1000``:
      long→double loses precision above 2^53, corrupting micros by ±1).
    - ``timestamp[us]`` without timezone: Spark reads TIMESTAMP_NTZ →
      cast to TIMESTAMP (value-preserving under the session's pinned
      UTC timezone; both are micros-since-epoch wall-clock UTC).

    Both coercions are cheap projections that stay in codegen.
    """
    if name not in SOURCE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # runtime-settable SQL conf: required for TIMESTAMP(NANOS) parquet even
    # when the caller supplies its own SparkSession (e.g. the driver)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    declared = {f.name: f.dataType for f in SOURCE_SCHEMAS[name].fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    for c, want in declared.items():
        got = actual.get(c)
        if not isinstance(want, T.TimestampType):
            continue
        if isinstance(got, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(got, T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def load_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name, df in load_all_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
