"""Structured metrics (north rule: per-partition throughput, applied-event
counts, watermark lag). One JSON object per micro-batch, appended to
<table>/metadata/metrics.jsonl and kept in memory."""

from __future__ import annotations

import json
import os
import time


class MetricsLog:
    def __init__(self, table_path: str | None = None, on_emit=None):
        self.records: list[dict] = []
        # optional print-through callback: called with each record as it is
        # emitted (live progress for CLI/operator tails of long replays)
        self.on_emit = on_emit
        self._path = (
            os.path.join(table_path, "metadata", "metrics.jsonl") if table_path else None
        )

    def emit(self, record: dict) -> dict:
        record = {"emitted_at": time.time(), **record}
        self.records.append(record)
        if self._path:
            with open(self._path, "a") as fh:
                fh.write(json.dumps(record) + "\n")
        if self.on_emit is not None:
            self.on_emit(record)
        return record

    def totals(self) -> dict:
        # ONLY replay batches count toward the headline: maintenance
        # records (index-refresh, vecindex-refresh, packed-refresh,
        # compact) carry their own applied_events/durations and summing
        # them here double-counted the events a batch applied whenever
        # continuous index maintenance was on
        batch_recs = [
            r for r in self.records
            if r.get("kind", "batch") in ("batch", "stream-batch")
        ]
        applied = sum(r.get("applied_events", 0) for r in batch_recs)
        range_w = sum(r.get("range_width", 0) for r in batch_recs)
        dur = sum(r.get("duration_sec", 0.0) for r in batch_recs)
        n_batches = len(batch_recs)
        return {
            "batches": n_batches,
            "applied_events": applied,
            "range_width": range_w,
            "duration_sec": dur,
            # headline: change-events processed end-to-end per second —
            # denominator is actual pre-dedup batch rows, not LSN range width
            "events_per_sec": (applied / dur) if dur else 0.0,
            "range_per_sec": (range_w / dur) if dur else 0.0,
        }
