"""Structured Streaming operators.

The reference's streaming layer is chunk-pipelining + partial aggregation
(cpp/libcudf_streaming/ table_chunk channels; streaming groupby
accumulate/merge/finalize at cpp/src/groupby/streaming_groupby.cpp:21-33;
Kafka micro-batch source python/custreamz/custreamz/kafka.py:83). Spark's
micro-batch engine implements the same accumulate/merge/finalize split
natively; on top of it we expose the watermark/event-time semantics cudf
lacks (SURVEY §2.12 — a capability win, tested against batch equivalents).
"""

from cudf_spark.streaming.ops import (  # noqa: F401
    enrich_with_static,
    events_stream,
    kafka_micro_batch_reader,
    sessionized,
    sliding_counts,
    stateful_running_totals,
    stateful_topk,
    stream_dedup,
    stream_interval_join,
    tumbling_counts,
    user_tier_dim,
    write_ordered_batch,
)
