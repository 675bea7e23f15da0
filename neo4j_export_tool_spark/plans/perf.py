"""Batch-timing performance tracker with trend classification.

Mirrors the reference ``BatchPerformanceTracker`` (``Export/Types.fs:140-216``):
record per-batch durations, sample every Nth batch, and classify the timing
trend from the first/middle/last samples —

- ``constant``: both first→middle and middle→last ratios within ±0.2 of 1
  (the keyset-pagination signature, O(log n) per batch)
- ``exponential``: both ratios > 1.3 (the skip/limit O(n²) signature)
- ``linear``: anything in between
- ``insufficient_data``: fewer than 3 samples

In this engine the "batches" are whatever unit iterates: pipeline stages,
connected-components rounds, or streaming micro-batches.  ``sample_every``
defaults to the reference's 10; stage-level callers with few long batches
use 1 (same classifier, denser sampling).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class BatchPerformanceTracker:
    strategy: str = "partition_parallel"
    sample_every: int = 10

    batch_count: int = 0
    total_time_ms: float = 0.0
    first_batch_time_ms: float = 0.0
    last_batch_time_ms: float = 0.0
    samples: list[dict[str, Any]] = field(default_factory=list)

    def record_batch(self, duration_ms: float) -> None:
        self.batch_count += 1
        self.total_time_ms += duration_ms
        self.last_batch_time_ms = duration_ms
        if self.batch_count == 1:
            self.first_batch_time_ms = duration_ms
        if self.batch_count % self.sample_every == 0:
            self.samples.append(
                {"batch_number": self.batch_count, "time_ms": duration_ms}
            )

    def performance_trend(self) -> str:
        """First/middle/last ratio classifier (``Export/Types.fs:179-208``)."""
        if len(self.samples) < 3:
            return "insufficient_data"
        first = self.samples[0]["time_ms"]
        middle = self.samples[len(self.samples) // 2]["time_ms"]
        last = self.samples[-1]["time_ms"]
        if first == 0.0 or middle == 0.0:
            return "linear"
        fm = middle / first
        ml = last / middle
        if abs(fm - 1.0) < 0.2 and abs(ml - 1.0) < 0.2:
            return "constant"
        if fm > 1.3 and ml > 1.3:
            return "exponential"
        return "linear"

    def metrics(self) -> dict[str, Any]:
        """The ``pagination_performance`` metadata block shape
        (``PerformanceBaselineTests.fs:96-213`` asserts these fields)."""
        avg = self.total_time_ms / self.batch_count if self.batch_count else 0.0
        return {
            "strategy": self.strategy,
            "total_batches": self.batch_count,
            "average_batch_time_ms": round(avg, 3),
            "first_batch_time_ms": round(self.first_batch_time_ms, 3),
            "last_batch_time_ms": round(self.last_batch_time_ms, 3),
            "performance_trend": self.performance_trend(),
            "sample_timings": list(self.samples),
        }
