"""Streaming observability (StreamingQueryListener).

The reference's chunk loop records per-chunk metrics — rows processed,
duration, retries (`core/batch_processor.py:250-283` progress ledger).
Structured Streaming already EMITS all of that per micro-batch; this
module is the thin listener that captures it into an in-memory ledger
(and optionally a JSONL file) so tests and operators can assert on
throughput instead of guessing.

Scale note: listener callbacks run on the driver and receive only
metadata (no data rows); the ledger is micro-batch-sized. For a
production metrics pipe, point ``jsonl_path`` at the monitoring
volume — each progress event is one JSON line, the format every
log shipper ingests.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLedger(StreamingQueryListener):
    """Collects per-micro-batch progress: (query id, batch id, input
    rows, processed rows/sec, batch duration ms). Attach with
    ``spark.streams.addListener(ledger)``; detach with
    ``removeListener`` when done (listeners outlive queries)."""

    def __init__(self, jsonl_path: str | None = None):
        self.events: list[dict] = []
        self._jsonl_path = jsonl_path

    # -- StreamingQueryListener contract ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
        }
        self.events.append(row)
        if self._jsonl_path:
            with open(self._jsonl_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- convenience ------------------------------------------------------
    def total_input_rows(self, query_id: str | None = None) -> int:
        return sum(
            e["num_input_rows"]
            for e in self.events
            if query_id is None or e["query_id"] == query_id
        )
