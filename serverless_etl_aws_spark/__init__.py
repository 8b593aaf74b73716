"""serverless_etl_aws_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query + data-processing capabilities of the
reference pipeline bekiekB1/serverless-etl-aws (an event-driven serverless
medallion-lake ETL: S3 bronze/silver zones, incremental exactly-once file
ingestion, partitioned parquet writes, and Spark-delegated query processing
— see SURVEY.md), re-expressed Spark-first:

- relational core: DataFrame/SQL over explicit-schema parquet tables,
  optimized by Catalyst/Tungsten (no custom rules needed);
- pipeline algebra: watermark gate, incremental exactly-once ingest
  (Structured Streaming file source + ``Trigger.AvailableNow``), partitioned
  sinks, archive util — replacing the reference's DynamoDB/S3-tag/Lambda
  control plane (reference: src/lambda_functions/*.py,
  src/glue_scripts/bronze_to_silver.py);
- streaming windows (tumbling/sliding/session + watermark late-data drop);
- LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash/n-gram
  Jaccard/embedding-cosine), similarity search (brute-force + IVF),
  text analysis (lang-id, quality, tokens, fingerprint), multimodal
  binary-column plumbing.

Everything here is built only on public Apache Spark / PySpark APIs.
"""

__version__ = "0.1.0"
