"""Structured Streaming surface: windowed aggregations over event streams.

The reference's "streaming" is file-arrival-driven batch (S3 event →
EventBridge → Glue, terraform/main.tf:524-568); it has no record-level
stream processing. The engine adds the full Structured Streaming window
family over the `events` table shape: tumbling, sliding, session windows,
and watermark-based late-data handling.
"""
