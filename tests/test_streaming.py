"""Streaming tests: batch-equivalence of drained windows, late-data drops,
determinism across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_aws_spark.catalog import load_table
from serverless_etl_aws_spark.queries.streaming_ops import (
    stream_late_data,
    stream_tumbling,
)


def test_tumbling_equals_batch(spark, sf_dir):
    streamed = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in stream_tumbling(spark, sf_dir).collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .collect()
    }
    assert streamed == batch


def test_late_data_drops_and_is_deterministic(spark, sf_dir):
    total = load_table(spark, sf_dir, "events").count()
    out1 = stream_late_data(spark, sf_dir).collect()
    emitted1 = sum(r["event_count"] for r in out1)
    # append mode emits only closed windows; late rows beyond the watermark
    # are dropped — strictly fewer events than the full table
    assert 0 < emitted1 < total
    out2 = stream_late_data(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_stateful_accumulates_across_batches(spark, sf_dir):
    from serverless_etl_aws_spark.queries.streaming_ops import stream_stateful

    rows = stream_stateful(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    total = sum(r["batch_events"] for r in rows)
    from serverless_etl_aws_spark.catalog import load_table

    assert total == load_table(spark, sf_dir, "events").count()
    # each user appears once per batch containing their events; running
    # total in the last emission equals the sum of batch counts
    for user, emissions in by_user.items():
        emissions.sort(key=lambda r: r["total_events"])
        assert emissions[-1]["total_events"] == sum(
            r["batch_events"] for r in emissions
        )
        assert emissions[-1]["types_seen"] >= 1
