"""Structured Streaming validation (engine extension).

The reference is strictly batch (SURVEY.md §2.9) and the north rule's
"resumable" means manifest-driven batch resume — but a continuously
ingested image corpus wants incremental validation too. This package
validates micro-batches of newly landed files with the same rule
objects as the batch engine, exactly once, resumable from Spark's
streaming checkpoint.
"""

from .validate import (
    stream_dedup_exact,
    stream_drift_monitor,
    stream_sessionize,
    stream_validate,
    windowed_event_counts,
)

__all__ = [
    "stream_dedup_exact",
    "stream_drift_monitor",
    "stream_sessionize",
    "stream_validate",
    "windowed_event_counts",
]
