from .stream import (
    foreach_batch_sketch_sink,
    foreach_batch_summary_sink,
    read_sketch_table,
    stateful_sessions,
    stateful_sketch_counts,
    streaming_dedup_exact,
    windowed_sketch_sink,
)

__all__ = [
    "foreach_batch_sketch_sink",
    "foreach_batch_summary_sink",
    "read_sketch_table",
    "stateful_sessions",
    "stateful_sketch_counts",
    "streaming_dedup_exact",
    "windowed_sketch_sink",
]
