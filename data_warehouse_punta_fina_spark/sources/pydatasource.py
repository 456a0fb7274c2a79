"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference's generated sources (calendar ranges, period tables —
`sources/generators.py`) are built from `spark.range`; this module shows
the engine's source surface is EXTENSIBLE the modern way: a first-class
Python data source with schema, options, and partition-parallel reads,
registered once per session and then read like any built-in format:

    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs").option("n", 1000).load()

The example source emits a deterministic synthetic document corpus
(seeded per doc id, no RNG state shared across partitions) — useful as a
load generator for dedup/quality operators without touching testdata.
Each partition materializes independently on its executor, so the source
scales out like a real one; nothing is generated on the driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
).split()

_SOURCES = ["web", "books", "code", "forums"]


def _doc_text(doc_id: int, n_tokens: int = 24) -> str:
    # per-id deterministic token stream: a multiplicative-hash walk, no
    # Python RNG object (stateless => identical on any executor)
    h = (doc_id * 2654435761) & 0xFFFFFFFF
    toks = []
    for _ in range(n_tokens):
        h = (h * 1103515245 + 12345) & 0x7FFFFFFF
        toks.append(_WORDS[h % len(_WORDS)])
    return " ".join(toks)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.num_partitions = int(options.get("numpartitions", 4))
        self.dup_every = int(options.get("dup_every", 0))  # 0 = no dups

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            # optional exact duplicates every k docs (dedup-operator fuel)
            base = i - (i % self.dup_every) if self.dup_every and i % self.dup_every == 1 else i
            yield (i, _doc_text(base), _SOURCES[i % len(_SOURCES)])


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming variant: each micro-batch emits the next
    ``batch_size`` doc ids. Offsets are plain dicts persisted in the
    checkpoint, so a restarted query resumes exactly where it stopped —
    the same deterministic generator, now with source-managed progress.
    ``max_id`` bounds the stream (availableNow drains to it)."""

    def __init__(self, options):
        self.batch_size = int(options.get("batch_size", 50))
        self.max_id = int(options.get("n", 200))
        self.dup_every = int(options.get("dup_every", 0))

    def initialOffset(self):
        return {"next": 0}

    def _row(self, i: int):
        base = (
            i - (i % self.dup_every)
            if self.dup_every and i % self.dup_every == 1
            else i
        )
        return (i, _doc_text(base), _SOURCES[i % len(_SOURCES)])

    def read(self, start):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.max_id)
        return iter([self._row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        # MUST honor an arbitrary span: availableNow / replay can coalesce
        # several prefetched ranges into one batch (a batch_size-bounded
        # re-read here silently truncates the batch)
        lo, hi = int(start["next"]), int(end["next"])
        return iter([self._row(i) for i in range(lo, min(hi, self.max_id))])


class SyntheticDocsDataSource(DataSource):
    """format name: ``synthetic_docs``; options: n, numPartitions,
    dup_every (make doc k·m+1 an exact copy of doc k·m), batch_size
    (streaming micro-batch rows). Batch AND streaming capable."""

    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id bigint, text string, source string"

    def reader(self, schema):
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticDocsStreamReader(self.options)


class _SyntheticDocsFullStreamReader(DataSourceStreamReader):
    """Plan-level streaming reader (the full ``DataSourceStreamReader``
    API, vs the prefetch-based Simple variant above): offsets are planned
    on the driver and each micro-batch's id range is split into
    ``numPartitions`` :class:`InputPartition` splits that read IN
    PARALLEL on executors — the Simple reader's whole batch funnels
    through one prefetch call instead. This is the shape a real
    partitioned source (Kafka topic-partitions, Kinesis shards) takes.

    ``latestOffset`` self-limits to ``batch_size`` ids per micro-batch
    (the Python API has no ReadLimit parameter — rate limiting lives in
    the source, like Kafka's maxOffsetsPerTrigger). Measured limitation
    (Spark 4.1): PythonMicroBatchStream does not implement
    SupportsTriggerAvailableNow, so ``availableNow`` falls back to ONE
    rate-limited batch — drive this source with a live processing-time
    trigger and stop at the bound (tests do exactly that); the
    checkpointed offsets make stop/restart exactly-once either way."""

    def __init__(self, options):
        self.batch_size = int(options.get("batch_size", 50))
        self.max_id = int(options.get("n", 200))
        self.num_partitions = int(options.get("numpartitions", 4))
        self.dup_every = int(options.get("dup_every", 0))
        # REQUIRED for restart correctness: the rate-limit cursor must be
        # anchored to externally-durable progress (a real source anchors
        # to broker/shard offsets). An in-memory cursor resets to 0 on
        # restart while the CHECKPOINT is further ahead — latestOffset
        # would then return an offset BELOW the committed start, the
        # empty (start > end) batch would commit the lower offset, and
        # the next batch would re-emit already-committed rows (observed
        # before this field existed: exactly one duplicated batch per
        # restart). ``partitions()`` persists planning progress here.
        self.progress_path = options.get("progress_path")
        if not self.progress_path:
            raise ValueError(
                "synthetic_docs_full requires a progress_path option: the "
                "source persists its committed offset there so a restarted "
                "query's rate limiter resumes from durable progress instead "
                "of regressing below the checkpoint"
            )

    def _planned(self) -> int:
        import os

        if not os.path.exists(self.progress_path):
            return 0
        with open(self.progress_path) as fh:
            return int(fh.read().strip() or 0)

    def _persist_planned(self, v: int) -> None:
        import os

        if v <= self._planned():
            return
        tmp = f"{self.progress_path}.tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self.progress_path)

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        # one batch_size slice past the last PLANNED offset. The anchor is
        # persisted at PLANNING time (partitions()), not at commit():
        # MicroBatchExecution only invokes source.commit() while
        # constructing the NEXT batch, so a rate limiter anchored to
        # commits deadlocks — latestOffset never advances, no new batch
        # ever constructs, commit never fires (measured before this
        # design). partitions() runs for every batch, including WAL
        # replays after a restart, so the planned anchor is always >= the
        # checkpoint and the offset sequence stays monotone.
        return {"next": min(self._planned() + self.batch_size, self.max_id)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["next"]), int(end["next"])
        self._persist_planned(hi)
        if hi <= lo:
            return []
        step = max(1, -(-(hi - lo) // self.num_partitions))
        return [_RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            base = (
                i - (i % self.dup_every)
                if self.dup_every and i % self.dup_every == 1
                else i
            )
            yield (i, _doc_text(base), _SOURCES[i % len(_SOURCES)])

    def commit(self, end: dict) -> None:
        # nothing to clean up: rows are deterministic from the id range
        # and the rate-limit anchor is persisted at planning time (see
        # latestOffset for why anchoring HERE would deadlock)
        pass


class SyntheticDocsFullDataSource(DataSource):
    """format name: ``synthetic_docs_full`` — same synthetic corpus as
    ``synthetic_docs`` but streamed through the full plan-level reader
    (driver-planned offsets + partition-parallel batch reads)."""

    @classmethod
    def name(cls):
        return "synthetic_docs_full"

    def schema(self):
        return "doc_id bigint, text string, source string"

    def reader(self, schema):
        return _SyntheticDocsReader(self.options)

    def streamReader(self, schema):
        return _SyntheticDocsFullStreamReader(self.options)


# ---------------------------------------------------------------------------
# Transaction-log change feed as a STREAMING source (spark.readStream
# .format("txlog_changes")) — the Delta change-data-feed consumption
# pattern on the native log (sources/txlog.py). Offsets are log VERSIONS,
# so micro-batches align exactly with commits and a restarted query
# resumes from its checkpointed version: exactly-once by construction.
# ---------------------------------------------------------------------------


def _txlog_versions(log_dir: str) -> list[int]:
    import os

    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(f.split(".")[0]) for f in os.listdir(log_dir) if f.endswith(".json")
    )


def _txlog_entry(log_dir: str, v: int) -> dict:
    import json
    import os

    with open(os.path.join(log_dir, f"{v:08d}.json")) as fh:
        return json.load(fh)


def _txlog_replay(log_dir: str, upto: int) -> tuple[list[str], str | None, int]:
    """Pure-Python mirror of TxTable._snapshot_files (no SparkSession —
    this runs inside the data source, driver- or executor-side)."""
    files: list[str] = []
    schema_json = None
    horizon = 0
    for v in _txlog_versions(log_dir):
        if v > upto:
            break
        e = _txlog_entry(log_dir, v)
        if e["action"] == "vacuum":
            horizon = e["horizon"]
            continue
        if e["action"] == "overwrite":
            files = list(e["files"])
        else:
            files.extend(e["files"])
        schema_json = e["schema"]
    return files, schema_json, horizon


class _TxChangesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch = the change rows of up to ``batch_versions`` commits.

    Per commit the reader diffs the snapshot FILE sets (log metadata),
    reads only the added/removed files with pyarrow, and takes the
    row-level multiset difference (collections.Counter over row tuples) —
    the same derivation as ``TxTable.read_changes``, executable without a
    SparkSession. Copy-on-write UPDATE emits delete+insert images; pure
    rewrites (OPTIMIZE/ZORDER) emit nothing. Column types must be
    hashable (no arrays/maps) — true of every warehouse table here;
    production CDC would write per-commit change files instead."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txlog_changes requires a path option (the TxTable root)")
        import os

        self.log_dir = os.path.join(self.path, "_txlog")
        self.data_dir = os.path.join(self.path, "data")
        # None = uncapped: one read() span covers every available commit.
        # availableNow with a Simple reader consumes ONE prefetched span
        # (the prefetch-snapshot behavior documented on the synthetic
        # source), so the cap is a LIVE-trigger rate limit only — capped
        # availableNow drains would stop after batch_versions commits.
        bv = options.get("batch_versions")
        self.batch_versions = int(bv) if bv is not None else None
        self.starting_version = int(options.get("starting_version", 0))
        # pin the column list to the query-start schema: every commit's
        # rows project to THESE columns (older commits null-fill ones
        # added later), keeping tuple arity equal to the declared schema
        vs = _txlog_versions(self.log_dir)
        if not vs:
            raise ValueError(f"no transaction log at {self.path}")
        _, schema_json, _ = _txlog_replay(self.log_dir, vs[-1])
        self.base_cols = self._cols(schema_json)

    def initialOffset(self):
        return {"next_version": self.starting_version}

    def _cols(self, schema_json: str) -> list[str]:
        import json

        return [f["name"] for f in json.loads(schema_json)["fields"]]

    def _rows_of(self, rel_files: list[str], cols: list[str]):
        import os
        from collections import Counter

        import pyarrow.parquet as pq

        counter: Counter = Counter()
        for rel in rel_files:
            tbl = pq.read_table(os.path.join(self.data_dir, rel))
            d = tbl.to_pydict()
            n = tbl.num_rows
            series = [d.get(c, [None] * n) for c in cols]
            for i in range(n):
                counter[tuple(s[i] for s in series)] += 1
        return counter

    def _changes_for(self, v: int):
        e = _txlog_entry(self.log_dir, v)
        if e["action"] == "vacuum":
            return []
        prev, _, _ = _txlog_replay(self.log_dir, v - 1)
        cur, _, _ = _txlog_replay(self.log_dir, v)
        added = [f for f in cur if f not in set(prev)]
        removed = [f for f in prev if f not in set(cur)]
        if not added and not removed:
            return []
        ca = self._rows_of(added, self.base_cols)
        cr = self._rows_of(removed, self.base_cols)
        out = []
        for row, n in sorted((ca - cr).items(), key=lambda kv: str(kv[0])):
            out.extend([row + ("insert", v)] * n)
        for row, n in sorted((cr - ca).items(), key=lambda kv: str(kv[0])):
            out.extend([row + ("delete", v)] * n)
        return out

    def _span_rows(self, lo: int, hi: int):
        _, _, horizon = _txlog_replay(self.log_dir, max(_txlog_versions(self.log_dir), default=0))
        if horizon > 0 and lo <= horizon:
            raise ValueError(
                f"txlog_changes from version {lo}: time-travel horizon is {horizon} "
                "(pre-images were vacuumed)"
            )
        rows = []
        for v in _txlog_versions(self.log_dir):
            if lo <= v < hi:
                rows.extend(self._changes_for(v))
        return rows

    def read(self, start):
        lo = int(start["next_version"])
        vs = _txlog_versions(self.log_dir)
        latest_next = (vs[-1] + 1) if vs else lo
        hi = latest_next if self.batch_versions is None else min(
            lo + self.batch_versions, latest_next
        )
        if hi <= lo:
            return iter([]), {"next_version": lo}
        return iter(self._span_rows(lo, hi)), {"next_version": hi}

    def readBetweenOffsets(self, start, end):
        # arbitrary spans: availableNow/replay may coalesce prefetches
        return iter(self._span_rows(int(start["next_version"]), int(end["next_version"])))


class TxChangesDataSource(DataSource):
    """format name: ``txlog_changes`` — stream a TxTable's change data
    feed (insert/delete row images per commit). Options: ``path`` (table
    root, required), ``starting_version`` (inclusive, default 0),
    ``batch_versions`` (commits per micro-batch — a LIVE-trigger rate
    limit; default uncapped so availableNow drains fully). The schema
    is the table's CURRENT schema + ``_change_type``/``_commit_version``
    (older commits' rows null-fill columns added later)."""

    @classmethod
    def name(cls):
        return "txlog_changes"

    def schema(self):
        import json
        import os

        from pyspark.sql import types as T

        path = self.options.get("path")
        if not path:
            raise ValueError("txlog_changes requires a path option")
        log_dir = os.path.join(path, "_txlog")
        vs = _txlog_versions(log_dir)
        if not vs:
            raise ValueError(f"no transaction log at {path}")
        _, schema_json, _ = _txlog_replay(log_dir, vs[-1])
        base = T.StructType.fromJson(json.loads(schema_json))
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.IntegerType()),
            ]
        )

    def simpleStreamReader(self, schema):
        return _TxChangesStreamReader(self.options)
