"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no true streaming state (SURVEY.md §2.11) — this is the
north-star extension: a per-key running aggregate whose state survives
across micro-batches (the streaming analogue of the batch running_total
operator). Used for e.g. live stock levels or per-user counters over an
unbounded event stream.

State is one row per key (count, total) — O(keys) memory per executor,
partitioned by the grouping key, exactly the shape that scales to a large
key space on a cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, batch_rows long, running_rows long, running_total double"
STATE_SCHEMA = "rows long, total double"


def running_user_totals(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-user running row count and value total, maintained in state.

    Each micro-batch emits one row per active user with the batch delta
    and the cumulative totals so far.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            rows, total = state.get
        else:
            rows, total = 0, 0.0
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            total += float(pdf[value_col].sum())
        rows += batch_rows
        state.update((rows, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_rows": [batch_rows],
                "running_rows": [rows],
                "running_total": [total],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
