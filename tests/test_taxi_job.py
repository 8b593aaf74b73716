"""End-to-end test of the reference-parity NYC-taxi bronze→silver job:
synthetic taxi files through the full pipeline (FIXTURES.md §B)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from serverless_etl_aws_spark.pipeline.taxi_job import TaxiBronzeToSilver, TaxiJobConfig


def make_taxi_rows(n: int, start_id: int = 0):
    base = dt.datetime(2024, 3, 1, 8, 0, 0)
    rows = []
    for i in range(start_id, start_id + n):
        pickup = base + dt.timedelta(minutes=7 * i)
        rows.append(
            (
                1 + i % 2, pickup, pickup + dt.timedelta(minutes=12 + i % 9),
                float(1 + i % 3), 1.0 + (i % 50) / 10.0, 1.0, "N",
                100 + i % 20, 200 + i % 30, (i % 6) + 1,
                10.0 + i % 25, 0.5, 0.5, 2.0, 0.0, 0.3,
                13.3 + i % 25, 2.5, 0.0,
            )
        )
    return rows


@pytest.fixture()
def bronze(tmp_path, spark):
    from serverless_etl_aws_spark import schemas

    bronze_dir = tmp_path / "bronze" / "nyc_taxi"
    bronze_dir.mkdir(parents=True)
    df = spark.createDataFrame(make_taxi_rows(200), schema=schemas.NYC_TAXI)
    # one bad row batch: negative distance + dropoff before pickup
    bad = spark.createDataFrame(
        [
            (
                1, dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 1),
                1.0, -2.0, 1.0, "N", 1, 2, 1,
                5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 0.0, 0.0,
            )
        ],
        schema=schemas.NYC_TAXI,
    )
    df.unionByName(bad).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "_stage")
    )
    import os
    import shutil

    part = next(
        p for p in os.listdir(tmp_path / "_stage") if p.endswith(".parquet")
    )
    shutil.move(
        str(tmp_path / "_stage" / part),
        str(bronze_dir / "yellow_taxi_2024-03_20240601_110000.parquet"),
    )
    return tmp_path


def job(spark, tmp_path) -> TaxiBronzeToSilver:
    return TaxiBronzeToSilver(
        spark,
        TaxiJobConfig(
            bronze_dir=str(tmp_path / "bronze" / "nyc_taxi"),
            silver_dir=str(tmp_path / "silver"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            watermark_path=str(tmp_path / "wm.json"),
        ),
    )


def test_bronze_to_silver_end_to_end(spark, bronze):
    j = job(spark, bronze)
    result = j.run_month("2024-03")
    assert result is not None and result.rows_ingested == 200  # bad row dropped

    silver = spark.read.parquet(str(bronze / "silver"))
    assert silver.count() == 200
    assert "trip_minutes" in silver.columns and "pickup_date" in silver.columns
    # Hive partitioning by payment_type on disk (reference layout,
    # bronze_to_silver.py:85), nested under the idempotency batch key
    import glob

    parts = {
        p.rsplit("/", 1)[-1]
        for p in glob.glob(str(bronze / "silver" / "*" / "payment_type=*"))
    }
    assert len(parts) == 6
    assert (silver.filter(F.col("trip_distance") < 0).count()) == 0


def test_month_gate_skips_second_run(spark, bronze):
    j = job(spark, bronze)
    assert j.run_month("2024-03") is not None
    assert j.run_month("2024-03") is None          # watermark skip
    assert j.run_month("2024-02") is None          # earlier month also skips
    # a NEW month runs (and, with no new files, ingests nothing)
    result = j.run_month("2024-04")
    assert result is not None and result.rows_ingested == 0
    assert spark.read.parquet(str(bronze / "silver")).count() == 200
