"""Streaming layer.

The reference has NO streaming operators (SURVEY §2.9) — its streaming
story is chains + urd timestamps = incremental batches (examples/
build_tutorial05.py). We provide both:

- ``incremental``: the reference-parity path — process only new chain
  links, memoized per batch (chain semantics, exactly-once by job
  identity);
- ``structured``: the Spark-native upgrade — Structured Streaming with
  Trigger.AvailableNow, checkpoints, watermarked windowed aggregation;
  same logical plans as the batch queries.
"""

from .incremental import ChainRunner
from .structured import (
    run_available_now, stream_dedup, stream_from_directory, windowed_counts,
    sessionize_stateful,
)

__all__ = [
    "ChainRunner", "stream_from_directory", "windowed_counts",
    "run_available_now", "sessionize_stateful", "stream_dedup",
]
