"""Thin batch-harness replacement for the reference's BatchProcessor
(SURVEY.md §3.3; `core/batch_processor.py:68-311`).

The reference splits a DataFrame into chunks, runs a pandas callable per
chunk in a ProcessPoolExecutor with retry/checkpoint/metrics. On Spark the
machinery dissolves: partitions replace chunks, the scheduler replaces the
pool, task retry (``spark.task.maxFailures``) replaces the retry loop, and
the checkpointed file stream (streaming/file_stream.py) replaces
resume-on-failure. What survives is the CONTRACT — an arbitrary
``pd.DataFrame → pd.DataFrame`` callable applied at scale — and the
report format. The callable runs through Arrow-batched ``mapInPandas``,
and accumulators collect per-batch metrics without a second pass.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class BatchReport:
    """Mirror of the reference's per-job summary
    (`core/batch_processor.py:285-311`)."""

    job_name: str
    total_rows_in: int = 0
    total_rows_out: int = 0
    n_batches: int = 0
    seconds: float = 0.0
    extra: dict[str, Any] = field(default_factory=dict)


def process_dataframe(
    df: DataFrame,
    process_func: Callable[[pd.DataFrame], pd.DataFrame],
    job_name: str,
    output_schema: str,
    retries: int = 0,
    retry_delay: float = 0.0,
    timeout: float | None = None,
) -> tuple[DataFrame, BatchReport]:
    """Apply a pandas callable to every Arrow batch of ``df``.

    Returns (result_df, report). The report is populated when the result
    is materialized here (one pass, counted via accumulators). The
    callable contract matches the reference's ``process_func(chunk)``
    (`core/batch_processor.py:68-71`).

    Reference-parity knobs (`core/batch_processor.py:182-199`), each
    mapped to its Spark-native seam:

    - ``retries`` / ``retry_delay``: per-BATCH retry of the callable,
      executor-side, before the exception escalates to Spark's own task
      retry (``spark.task.maxFailures``) — the reference's
      retry-with-delay loop around one chunk. Retried attempts are
      counted in ``report.extra['batch_retries']``. Only use for
      callables with transient failures (e.g. remote enrichment); a
      deterministic bug should fail fast.
    - ``timeout``: per-JOB wall-clock bound. Spark has no per-task
      timeout primitive, so the materializing action runs under a
      dedicated job group and the group is CANCELLED when the deadline
      passes (``TimeoutError``) — the engine-correct form of the
      reference's per-chunk ``timeout`` (which kills the worker
      process): partial work stops cluster-wide, nothing leaks.
    """
    sc = df.sparkSession.sparkContext
    rows_in = sc.accumulator(0)
    rows_out = sc.accumulator(0)
    batches = sc.accumulator(0)
    batch_retries = sc.accumulator(0)

    def runner(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows_in.add(len(pdf))
            batches.add(1)
            attempt = 0
            while True:
                try:
                    out = process_func(pdf)
                    break
                except Exception:
                    attempt += 1
                    if attempt > retries:
                        raise
                    batch_retries.add(1)
                    if retry_delay > 0:
                        time.sleep(retry_delay)
            rows_out.add(len(out))
            yield out

    t0 = time.time()
    result = df.mapInPandas(runner, schema=output_schema)
    # materialize once so the accumulators are final (noop sink: no driver
    # collect, full distributed execution)
    if timeout is None:
        result.write.format("noop").mode("overwrite").save()
    else:
        _run_with_job_timeout(result, job_name, timeout)
    report = BatchReport(
        job_name=job_name,
        total_rows_in=rows_in.value,
        total_rows_out=rows_out.value,
        n_batches=batches.value,
        seconds=round(time.time() - t0, 3),
    )
    if retries > 0:
        report.extra["batch_retries"] = batch_retries.value
    return result, report


def _run_with_job_timeout(result: DataFrame, job_name: str, timeout: float) -> None:
    """Materialize ``result`` under a job group that is cancelled if the
    wall clock passes ``timeout`` seconds; raises ``TimeoutError`` then.

    The job group must be set from INSIDE the worker thread (PySpark's
    pinned-thread mode — the default since 3.2 — makes setJobGroup
    thread-local; without pinned mode all Python threads share one JVM
    thread and the cancel could hit unrelated concurrent jobs, so this
    helper assumes PYSPARK_PIN_THREAD). To close the race where a very
    short timeout fires before the thread reaches setJobGroup (cancel
    would then cancel nothing and the job would run on after
    TimeoutError — ADVICE r9), the deadline only starts counting after
    the ``grouped`` event confirms the group is set (so total wall is
    bounded by ~2×``timeout``: up to ``timeout`` waiting for the group,
    then ``timeout`` of job time). If the group is never confirmed (a
    py4j gateway stall inside setJobGroup — ADVICE r10), no Spark job
    has been submitted yet, so there is nothing to cancel by group and
    the helper raises immediately instead of issuing no-op cancels."""
    import threading
    import time as _time

    sc = result.sparkSession.sparkContext
    group = f"batch:{job_name}:{id(result)}"
    err: list[BaseException] = []
    grouped = threading.Event()

    def _go() -> None:
        try:
            sc.setJobGroup(group, job_name, interruptOnCancel=True)
            grouped.set()
            result.write.format("noop").mode("overwrite").save()
        except BaseException as exc:  # noqa: BLE001 — relayed to caller
            err.append(exc)
        finally:
            grouped.set()  # thread died pre-group: unblock the waiter
            sc.setJobGroup("", "")

    th = threading.Thread(target=_go, daemon=True)
    th.start()
    if not grouped.wait(timeout):
        # the thread never reached setJobGroup within the budget — no
        # Spark job has been submitted, so cancelJobGroup would target a
        # group that was never registered (ADVICE r10); report the stall
        # and leave the daemon thread to die with the session
        raise TimeoutError(
            f"batch job {job_name!r}: job group not registered within "
            f"{timeout} s (py4j gateway stall); no Spark job was submitted"
        )
    deadline = _time.time() + timeout  # clock starts AFTER the group is set
    th.join(max(0.0, deadline - _time.time()))
    if th.is_alive():
        sc.cancelJobGroup(group)
        th.join(30)  # let the cancellation land
        if th.is_alive():
            sc.cancelJobGroup(group)  # retry once if the first raced setJobGroup
        raise TimeoutError(
            f"batch job {job_name!r} exceeded {timeout} s and was cancelled"
        )
    if err:
        raise err[0]
