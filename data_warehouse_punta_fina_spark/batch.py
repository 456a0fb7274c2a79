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
) -> tuple[DataFrame, BatchReport]:
    """Apply a pandas callable to every Arrow batch of ``df``.

    Returns (result_df, report). The report is populated when the result
    is materialized here (one pass, counted via accumulators). The
    callable contract matches the reference's ``process_func(chunk)``
    (`core/batch_processor.py:68-71`).
    """
    sc = df.sparkSession.sparkContext
    rows_in = sc.accumulator(0)
    rows_out = sc.accumulator(0)
    batches = sc.accumulator(0)

    def runner(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows_in.add(len(pdf))
            batches.add(1)
            out = process_func(pdf)
            rows_out.add(len(out))
            yield out

    t0 = time.time()
    result = df.mapInPandas(runner, schema=output_schema)
    # materialize once so the accumulators are final (noop sink: no driver
    # collect, full distributed execution)
    result.write.format("noop").mode("overwrite").save()
    report = BatchReport(
        job_name=job_name,
        total_rows_in=rows_in.value,
        total_rows_out=rows_out.value,
        n_batches=batches.value,
        seconds=round(time.time() - t0, 3),
    )
    return result, report
