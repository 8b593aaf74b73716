"""Streaming contract keys (SURVEY.md §2B `stream_*`): real Structured
Streaming jobs (readStream → window agg → memory sink, Trigger.AvailableNow)
whose drained output is batch-equivalent, so DuckDB can check tumbling /
sliding / session results; late-data is rows-only (watermark drops depend
on batch boundaries, which we pin but DuckDB can't model)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..streaming.windows import (
    late_data_counts,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    stage_events_dir,
    tumbling_counts,
)
from . import Query

SCRATCH = "/root/repo/.scratch"


def _stream(spark: SparkSession, sf_dir: str, sub: str, n_files: int = 1):
    from ..streaming.windows import _events_stream

    scratch = os.path.join(SCRATCH, sub)
    src = stage_events_dir(spark, sf_dir, scratch, n_files=n_files)
    return _events_stream(spark, src)


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(
        tumbling_counts(_stream(spark, sf_dir, "stream_tumbling"))
    )


STREAM_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS event_count
FROM events
GROUP BY 1, 2
"""


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(
        sliding_counts(_stream(spark, sf_dir, "stream_sliding"))
    )


# Spark's sliding windows start at every 15-min boundary s with
# s <= ts < s+1h, i.e. s = time_bucket_15m(ts) - {0,15,30,45} minutes.
STREAM_SLIDING_SQL = """
SELECT strftime(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                - (j * INTERVAL '15 minutes'), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       event_type,
       COUNT(*) AS event_count
FROM events
CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
GROUP BY 1, 2
"""


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_memory(
        session_counts(_stream(spark, sf_dir, "stream_session"))
    )


# Gaps-and-islands: a new session starts when the gap from the previous
# event of the same user exceeds 30 min; session end = last ts + gap
# (Spark session_window semantics).
STREAM_SESSION_SQL = """
WITH marked AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - lag(CAST(ts AS TIMESTAMP)) OVER (
                           PARTITION BY user_id ORDER BY ts)
                     > INTERVAL '30 minutes'
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), islands AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marked
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL '30 minutes',
                '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       user_id,
       COUNT(*) AS event_count
FROM islands
GROUP BY user_id, sid
"""


def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two mtime-ordered batches (events split by median event_id — later
    half of ids carries a mix of times), 1-hour watermark, append mode:
    batch 2 rows behind the batch-1 watermark are dropped; only closed
    windows emit. Deterministic because file order and watermark are pinned."""
    return run_stream_to_memory(
        late_data_counts(
            _stream(spark, sf_dir, "stream_late_data", n_files=2)
        ),
        output_mode="append",
    )


def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    profile across two pinned micro-batches. Deterministic rows (batch
    split by event_id parity, mtime-ordered) — rows-only check since
    cross-batch state is not SQL-expressible."""
    from ..streaming.stateful import running_user_profile

    out = run_stream_to_memory(
        running_user_profile(
            _stream(spark, sf_dir, "stream_stateful", n_files=2)
        ),
        output_mode="append",
    )
    return out.orderBy("user_id", "total_events")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: ``dropDuplicates`` over the stream,
    emitting each (user_id, event_type) pair exactly once (append mode).
    Only the dedup keys are projected — which *row* of a dup group survives
    is batch-order-dependent, but the key set is deterministic, so the
    result is batch-equivalent to ``SELECT DISTINCT``.

    Scale notes: state is O(distinct keys) in the state store, partitioned
    by key hash; in production pair it with ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` to bound state for unbounded key
    domains."""
    stream = _stream(spark, sf_dir, "stream_dedup")
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return run_stream_to_memory(deduped, output_mode="append")


STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


QUERIES: dict[str, Query] = {
    "stream_tumbling": Query(stream_tumbling, STREAM_TUMBLING_SQL,
                             "1h tumbling counts (streaming)"),
    "stream_sliding": Query(stream_sliding, STREAM_SLIDING_SQL,
                            "1h/15min sliding counts (streaming)"),
    "stream_session": Query(stream_session, STREAM_SESSION_SQL,
                            "30min-gap session windows (streaming)"),
    "stream_late_data": Query(stream_late_data, None,
                              "watermark late-data drop (rows-only)"),
    "stream_stateful": Query(stream_stateful, None,
                             "applyInPandasWithState profile (rows-only)"),
    "stream_dedup": Query(stream_dedup, STREAM_DEDUP_SQL,
                          "streaming exact dedup (append mode)"),
}
