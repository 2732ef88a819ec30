"""Logging, phase timing and JSONL metrics.

The reference logs with bare prints tagged [I]/[W]/[E] and stores one
wall-clock number per complex (SURVEY 5); here every pipeline phase
(featurize / compile / denoise / score / io) is timed explicitly and metrics
can be streamed to JSONL for observability.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
import time
from collections import defaultdict
from typing import Dict, Optional


def log_info(msg: str) -> None:
    print(f"[I] {msg}", flush=True)


def log_warn(msg: str) -> None:
    print(f"[W] {msg}", flush=True)


def log_error(msg: str) -> None:
    print(f"[E] {msg}", file=sys.stderr, flush=True)


class PhaseTimers:
    """Accumulating named wall-clock timers."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        # featurization prefetch runs phases from worker threads; += on a
        # shared float is not atomic under the GIL (read-add-store)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        parts = [f"{k}={v:.2f}s" for k, v in sorted(self.totals.items())]
        return " ".join(parts)


class MetricsWriter:
    """Append-only JSONL metrics sink (optional)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def write(self, record: dict) -> None:
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
