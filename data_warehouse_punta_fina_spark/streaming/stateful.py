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


TWS_OUTPUT_SCHEMA = (
    "user_id long, batch_rows long, running_rows long, running_total double, "
    "n_types_seen long"
)


def user_activity_profile(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-user activity profile on the Spark 4 ``transformWithStateInPandas``
    API — the successor to :func:`running_user_totals`'s
    ``applyInPandasWithState``, showcasing what the new operator adds:
    MULTIPLE named state variables per key, each with its own schema
    (here a ValueState for the running totals and a MapState keyed by
    event type for the per-type counts), managed through a
    ``StatefulProcessor`` lifecycle instead of one monolithic state tuple.

    Emits one row per active user per micro-batch: the batch delta, the
    cumulative row/value totals, and how many DISTINCT event types the
    user has ever produced (the MapState's key count — the state shape a
    single flat tuple cannot express without serializing a map by hand).

    State is O(keys × event-type-cardinality), hash-partitioned by user —
    the same scale posture as every stateful operator here. ``timeMode``
    is "none": no timers, so results are deterministic under replay
    (timer-driven emission is wall-clock-dependent by nature).

    ENV GATE: the transformWithState runtime requires google.protobuf
    (the JVM↔Python state-server wire format); absent in this container,
    so the live test skips (tests/test_stateful_streaming.py) — the code
    is plain public-API usage and unlocks by installing protobuf.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserActivityProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState("totals", "rows long, total double")
            self.per_type = handle.getMapState("per_type", "t string", "n long")

        def handleInputRows(self, key, rows, timerValues):  # noqa: N803 (API name)
            (user_id,) = key
            prev = self.totals.get() if self.totals.exists() else (0, 0.0)
            running_rows, running_total = int(prev[0]), float(prev[1])
            batch_rows = 0
            for pdf in rows:
                batch_rows += len(pdf)
                running_total += float(pdf[value_col].sum())
                for t, n in pdf["event_type"].value_counts().items():
                    seen = (
                        self.per_type.getValue((t,))[0]
                        if self.per_type.containsKey((t,))
                        else 0
                    )
                    self.per_type.updateValue((t,), (int(seen) + int(n),))
            running_rows += batch_rows
            self.totals.update((running_rows, running_total))
            n_types = sum(1 for _ in self.per_type.keys())
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "batch_rows": [batch_rows],
                    "running_rows": [running_rows],
                    "running_total": [running_total],
                    "n_types_seen": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
