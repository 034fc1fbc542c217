"""Structured metrics logging (JSON lines).

The reference has no structured logging (SURVEY §5: pull-based cost/matches
plus stdout prints).  Here every long-running entry point can emit
machine-readable metric records to a JSONL sink — the observability layer
for fleet runs.
"""

from __future__ import annotations

import json
import time
from typing import Any, IO


class MetricsLogger:
    """Append-only JSONL metrics writer with wall-clock stamping."""

    def __init__(self, sink: str | IO | None):
        self._own = isinstance(sink, str)
        self._fh: IO | None = open(sink, "a") if isinstance(sink, str) else sink
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> None:
        if self._fh is None:
            return
        record = {"event": event, "t": round(time.time() - self._t0, 6), **fields}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._own and self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def null_logger() -> MetricsLogger:
    return MetricsLogger(None)
