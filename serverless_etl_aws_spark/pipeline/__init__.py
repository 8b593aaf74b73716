"""Pipeline algebra — the reference's control plane, rebuilt Spark-native.

Reference mechanism → engine replacement (SURVEY.md §1.1, §2A):

- DynamoDB watermark item (fetch_raw_data.py:56-94) → file-based
  :mod:`watermark` state (tiny JSON next to the zone).
- S3 object-tag processing state + Lambda RPC (s3_operations.py:13-56,
  bronze_to_silver.py:15-27) → Structured Streaming file-source
  checkpoint in :mod:`ingest` (exactly-once at file granularity, commit
  only after a successful write — fixing the reference's
  commit-in-``finally`` bug at bronze_to_silver.py:100-104).
- Archive copy+delete (s3_operations.py:58-72) → :mod:`archive`
  date-partitioned move.
- SNS notify (fetch_raw_data.py:97-111) → :mod:`report` run-report hook.
- HTTP→S3 streaming download (data_downloader.py:13-42) → :mod:`fetch`
  landing-dir download with injectable transport.
"""
