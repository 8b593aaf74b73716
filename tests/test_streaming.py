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


def test_watermark_actually_drops_late_rows(spark, tmp_path):
    """True late-row dropping, exercised with a time-ordered 4-batch
    source. Spark only drops an input row if its window was EVICTED in an
    earlier batch (a straggler into still-live state merges and emits —
    measured: a 3-batch variant emits count 11 with zero drops). So:
    batch 0 fills an early window, batch 1 advances max event time,
    batch 2 lets the watermark catch up and evict+emit the early window,
    batch 3 delivers the straggler for the closed window — it must be
    DROPPED (numRowsDroppedByWatermark == 1) and the emitted count must
    exclude it. This is the semantics the fixture-backed stream_late_data
    key cannot show (its parity split never puts a row behind the
    watermark)."""
    import os
    import time

    from pyspark.sql import functions as F

    from serverless_etl_aws_spark.streaming.windows import (
        _events_stream,
        late_data_counts,
        run_stream_to_memory,
    )

    def ns(hour, minute):
        # 2024-01-01 HH:MM UTC in integer nanoseconds
        base = 1704067200  # 2024-01-01T00:00:00Z
        return (base + hour * 3600 + minute * 60) * 1_000_000_000

    def write_batch(idx, rows, age):
        df = spark.createDataFrame(
            [(i, t, 1, "click", 1.0, "{}") for i, t in rows],
            "event_id long, ts long, user_id long, event_type string,"
            " value double, props string",
        )
        tmp = str(tmp_path / f"_tmp{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dest = str(tmp_path / "src" / f"events_{idx}.parquet")
        os.makedirs(str(tmp_path / "src"), exist_ok=True)
        os.rename(os.path.join(tmp, part), dest)
        mtime = time.time() - age
        os.utime(dest, (mtime, mtime))

    # batch 0: ten rows in [01:00, 02:00)
    write_batch(0, [(i, ns(1, i)) for i in range(10)], age=40)
    # batch 1: one row at 10:00 -> max event time jumps to 10:00
    write_batch(1, [(100, ns(10, 0))], age=30)
    # batch 2: filler at 10:05; the watermark is now 09:00, so the
    # [01:00, 02:00) window is evicted and emitted at this batch's end
    write_batch(2, [(150, ns(10, 5))], age=20)
    # batch 3: straggler at 01:30 for the already-closed window -> dropped
    write_batch(3, [(200, ns(1, 30))], age=10)

    agg = late_data_counts(_events_stream(spark, str(tmp_path / "src")))
    name = f"late_drop_{os.getpid()}"
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    out = {
        (r["window_start"], r["event_count"])
        for r in spark.table(name).collect()
    }
    assert dropped == 1
    assert out == {("2024-01-01 01:00:00", 10)}  # straggler excluded


def test_streaming_state_is_rocksdb_off_heap(spark, sf_dir):
    """The engine's streaming state lives off-heap in RocksDB (r13
    adjudication: on-heap HDFS-backed state maps made stream wall time
    a GC barometer — 4.9→16→21 s escalation under accumulated heap
    pressure). Pin the session conf AND that a drained stateful query
    actually ran its state operator on the RocksDB provider."""
    from serverless_etl_aws_spark.session import tune_for_session

    tune_for_session(spark)
    assert spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    ).endswith("RocksDBStateStoreProvider")
    assert spark.conf.get("spark.sql.streaming.minBatchesToRetain") == "2"

    import os
    from serverless_etl_aws_spark.queries._util import scratch_root
    from serverless_etl_aws_spark.streaming.windows import (
        _events_stream, session_counts, stage_events_dir,
        STREAM_STATE_PARTITIONS,
    )

    scratch = os.path.join(scratch_root(), "rocksdb_pin")
    src = stage_events_dir(spark, sf_dir, scratch, n_files=1)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        q = (
            session_counts(_events_stream(spark, src))
            .writeStream.format("noop")
            .option(
                "checkpointLocation", os.path.join(scratch, "_ckpt")
            )
            .trigger(availableNow=True)
            .outputMode("complete")
            .start()
        )
        q.awaitTermination()
        progress = q.recentProgress
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    providers = {
        op.get("customMetrics", {}) and "rocksdbGetCount" in op.get(
            "customMetrics", {}
        )
        for p in progress
        for op in p.get("stateOperators", [])
    }
    # RocksDB's state operator reports rocksdb* custom metrics; the
    # HDFS-backed provider reports loadedMapCache* instead.
    assert providers == {True}
