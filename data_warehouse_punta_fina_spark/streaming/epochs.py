"""Epoched global state for streaming ARTIFACT MAINTENANCE (round-12).

Persisted artifacts with per-row/per-doc state only (positions, band
index) take idempotent maintenance for free: each micro-batch overwrites
its own ``ingest_batch=<id>`` partition, and batches never interact.
Artifacts with GLOBAL state (BM25's df/N/total_dl, an NB model's class/
term counts, any content fingerprint) need more: a replayed batch must
not double-merge the statistics. The discipline, shared by every
maintenance stream here:

1. per-batch rows land under ``ingest_batch=<id>`` with dynamic
   partition overwrite (idempotent by construction);
2. each global-state table is written as EPOCHS — ``<name>_epochs/
   epoch=<batch_id>`` — derived from the newest epoch STRICTLY BELOW
   the batch id (:func:`max_epoch_below`), so a replay re-derives
   bit-identical state from the identical pre-batch source, and a
   half-written epoch from a failed attempt is overwritten, never read;
3. the flat read layout the batch searches/scorers expect is PUBLISHED
   from the new epoch's committed copy LAST — a crash anywhere replays
   the batch, which re-merges and re-publishes;
4. epoch history is pruned to the ``keep`` newest (:func:`prune_epochs`,
   clamped ≥ 2: the only batch that can replay is the one whose
   checkpoint has not committed — i.e. the current one — and its
   re-derivation needs its merge source alive. Deleting anything older
   is safe at any crash point; pruning to 1 would let a replay merge
   from empty and silently halve the statistics).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


class RetiredArtifactError(ValueError):
    """The artifact directory was RETIRED (round-14): compaction wrote a
    superseding batch-shaped copy and :func:`~..operators.index_admin.
    retire_index_dir` deleted the fragmented layout, leaving a
    ``_RETIRED.json`` tombstone. Without the tombstone a replayed
    maintenance stream (or a resumed checkpoint) pointed at the retired
    path would see an ABSENT directory — the legitimate first-batch
    state — and silently re-bootstrap a new index from one batch while
    readers keep using the compacted copy. The tombstone turns that
    silent fork into this loud error carrying the superseding path."""


class BatchRegressionError(ValueError):
    """A maintenance batch id is BELOW state already in the artifact —
    the fresh/reset-checkpoint failure mode (ADVICE r12): a checkpoint
    reset restarts batch ids at 0 against an index whose epochs/batch
    partitions are numbered higher, so ``max_epoch_below(…, 0)`` is
    None and the global stats silently re-bootstrap from empty while
    older per-batch partitions remain — published stats no longer
    describe the stored rows, and every score skews silently. Caught
    loudly instead, with the remedy in the message."""


def _list_partition_ids(spark: SparkSession, path: str, prefix: str) -> list[int]:
    """Integer partition values under ``path`` whose directories are
    named ``{prefix}=<int>`` — resolved from directory names via the
    Hadoop FS API (scheme-agnostic, no data scan). Empty when the path
    is absent."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out: list[int] = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith(f"{prefix}="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return out


def guard_batch_regression(
    spark: SparkSession,
    artifact_dir: str,
    batch_id: int,
    epoch_subdirs: tuple[str, ...] = (),
    batch_subdirs: tuple[str, ...] = (),
    batch_col: str = "ingest_batch",
) -> None:
    """Fail loudly when ``batch_id`` regresses below existing state
    (ADVICE r12 medium): raises :class:`BatchRegressionError` if any
    epoch directory or per-batch partition carries an id STRICTLY
    GREATER than the running batch's. Equality is deliberately allowed
    — it is the sanctioned replay path (a crash between write and
    checkpoint commit re-runs the SAME batch id, whose dynamic
    partition overwrite and strictly-below epoch derivation are exactly
    the idempotence the replay tests pin); only a LOWER fresh id means
    the caller pointed a new/reset checkpoint at an existing artifact.
    Directory-name listing only — no data scan."""
    offenders: list[str] = []
    for sub in epoch_subdirs:
        ids = _list_partition_ids(spark, f"{artifact_dir}/{sub}", "epoch")
        bad = [i for i in ids if i > batch_id]
        if bad:
            offenders.append(f"{sub}/epoch={max(bad)}")
    for sub in batch_subdirs:
        ids = _list_partition_ids(spark, f"{artifact_dir}/{sub}", batch_col)
        bad = [i for i in ids if i > batch_id]
        if bad:
            offenders.append(f"{sub}/{batch_col}={max(bad)}")
    if offenders:
        raise BatchRegressionError(
            f"maintenance batch id {batch_id} is below existing state in "
            f"{artifact_dir!r} ({', '.join(offenders)}) — this happens when a "
            "NEW or RESET streaming checkpoint is pointed at an existing "
            "maintained artifact: batch ids restart at 0, global stats "
            "re-bootstrap from empty while older partitions remain, and "
            "published statistics silently stop describing the stored rows. "
            "Remedy: resume with the ORIGINAL checkpoint directory, or "
            "rebuild the artifact from scratch (empty directory) under the "
            "new checkpoint."
        )


def guard_stream_ownership(
    spark: SparkSession,
    table_path: str,
    batch_col: str = "ingest_batch",
) -> None:
    """Refuse to maintain a table the stream does not OWN (round-13,
    the inverse of the batch-side guards): a maintenance batch writes
    ``{batch_col}=<id>/...`` partitions, so pointing it at a
    BATCH-built table (root-level ``bucket=*`` / ``cid=*`` partitions,
    or unpartitioned files) would create a mixed partition layout Spark
    cannot read back — the exact corruption ``bm25_append_index`` /
    ``ivfpq_append_index`` refuse in the other direction. An absent
    path is fine (first batch); a path whose first-level directories
    are all ``{batch_col}=`` is fine (ours); anything else raises with
    the remedy."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = p.getFileSystem(conf)
    # retirement tombstone (round-14): the maintained tables live one
    # level under the artifact root (codes/, postings/, positions/), so
    # check the root as well — retirement deletes the data directories
    # but leaves _RETIRED.json, and an absent table path must NOT fall
    # through to the "first batch" return below (that is exactly the
    # silent re-bootstrap the tombstone exists to prevent).
    for cand in (p, p.getParent()):
        if cand is None:
            continue
        t = jvm.org.apache.hadoop.fs.Path(cand, "_RETIRED.json")
        if fs.exists(t):
            superseded = "<unreadable tombstone>"
            try:
                stream = fs.open(t)
                raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
                stream.close()
                import json as _json

                superseded = _json.loads(raw).get("superseded_by", superseded)
            except Exception:  # noqa: BLE001 — the refusal must not depend on parse
                pass
            raise RetiredArtifactError(
                f"artifact at {cand.toString()!r} was retired — superseded by "
                f"{superseded!r}. A maintenance batch landing here would "
                "re-bootstrap a fork of an index whose readers moved to the "
                "compacted copy. Point the stream's sink (and a FRESH "
                "checkpoint) at a new directory, or continue maintenance on "
                "the superseding index through its own ingestion path."
            )
    if not fs.exists(p):
        return
    foreign: list[str] = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith(f"{batch_col}=") or name.startswith(("_", ".")):
            continue
        foreign.append(name)
    if foreign:
        raise ValueError(
            f"table at {table_path!r} is not stream-maintained (found "
            f"{sorted(foreign)[:3]} instead of {batch_col}= partitions) — "
            "writing micro-batch partitions next to a batch-built layout "
            "would corrupt it into an unreadable mix. Either keep using the "
            "batch append path on this artifact, or rebuild it THROUGH the "
            "maintenance stream from an empty directory (compaction "
            "graduates stream → batch; there is deliberately no in-place "
            "adoption in the other direction)."
        )


def max_epoch_below(spark: SparkSession, path: str, below: int) -> int | None:
    """Newest committed epoch strictly below ``below`` (None if the tree
    is empty/absent). Partition-column-only aggregate — resolved from
    directory names, no data scan."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return None
    top = (
        df.filter(F.col("epoch") < below).agg(F.max("epoch").alias("e")).collect()[0]["e"]
    )
    return None if top is None else int(top)


def read_epoch(spark: SparkSession, path: str, epoch: int) -> DataFrame:
    """One epoch's committed copy of a global-state table."""
    return spark.read.parquet(f"{path}/epoch={int(epoch)}")


def write_epoch(df: DataFrame, path: str, epoch: int, partition_by: list[str] | None = None) -> None:
    """Write one epoch by FULL OVERWRITE of its own directory — a replay
    of the same batch id lands on the same directory, so a half-written
    prior attempt can never be read (merges only ever read epochs
    strictly below the running batch)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{path}/epoch={int(epoch)}")


def prune_epochs(
    spark: SparkSession, index_dir: str, subdirs: tuple[str, ...], keep: int = 2
) -> None:
    """Best-effort deletion of all but the ``keep`` newest epoch
    directories under each of ``subdirs`` (Hadoop FS API — scheme-
    agnostic). ``keep`` is clamped to ≥ 2 (module docstring invariant).
    Failures are swallowed — pruning is hygiene, not correctness (a
    later batch re-prunes)."""
    keep = max(int(keep), 2)
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for sub in subdirs:
            path = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/{sub}")
            fs = path.getFileSystem(conf)
            if not fs.exists(path):
                continue
            epochs = []
            for st in fs.listStatus(path):
                name = st.getPath().getName()
                if name.startswith("epoch="):
                    try:
                        epochs.append((int(name.split("=", 1)[1]), st.getPath()))
                    except ValueError:
                        continue
            for _e, p in sorted(epochs)[:-keep]:
                fs.delete(p, True)
    except Exception as exc:  # noqa: BLE001 — hygiene must never fail the batch
        # correctness never reads pruned epochs and a later batch
        # re-prunes, but an FS permission problem should at least be
        # visible when someone turns debug logging on (VERDICT r12 #8)
        _log.debug("prune_epochs: best-effort prune under %s failed: %s", index_dir, exc)
