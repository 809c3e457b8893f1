"""Structured Streaming support (capability extension — SURVEY §2.3 notes
the reference's "streaming" is chunked batch; real streams map to
readStream + watermark + windows).

The `events` test table (event_id, ts, user_id, event_type, value, props)
stands in for a stream. Helpers here cover the canonical stateful shapes:

- tumbling / sliding window aggregation with watermarked late-data handling
- session windows (``F.session_window``) — streaming-native sessionization
- batch sessionization (lag + gap cumsum) — same semantics on bounded data,
  SQL-expressible, used as the oracle for the streaming path
- a file→memory test harness that drives a stream to completion
  synchronously (availableNow), so tests are deterministic

Scale notes: watermarks bound state size (state store keeps only windows
newer than watermark); key skew in groupBy(user) is the same shuffle-skew
problem as batch and AQE does not apply to streaming — pick key salting at
the source if a user is pathologically hot.
"""

from mini_etl_spark.streaming.events import (
    batch_sessionize,
    read_events_stream,
    read_latest_snapshot,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_static_join,
    stream_stream_join,
    stream_classify_gate,
    stream_drift_gate,
    stream_dedup_against_index,
    stream_lm_gate,
    stream_cm_update,
    stream_lm_update,
    stream_upsert_to_parquet,
    streaming_dedup,
    tumbling_window_agg,
)
from mini_etl_spark.streaming.corpus import (
    read_token_shards,
    stream_temperature_mix,
    stream_token_shards,
)
from mini_etl_spark.streaming.stateful import running_totals

__all__ = [
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "batch_sessionize",
    "streaming_dedup",
    "stream_static_join",
    "stream_stream_join",
    "stream_classify_gate",
    "stream_drift_gate",
    "stream_dedup_against_index",
    "stream_lm_gate",
    "stream_cm_update",
    "stream_lm_update",
    "stream_upsert_to_parquet",
    "stream_token_shards",
    "read_token_shards",
    "stream_temperature_mix",
    "read_latest_snapshot",
    "run_stream_to_memory",
    "running_totals",
]
