"""Structured Streaming layer: the reference's architecture in one process.

pipeline.py — CdcPipeline: changelog stream → per-micro-batch compaction →
              idempotent upsert/delete sink (+ optional mirrored changelog
              output), checkpointed.
state.py    — ParquetStateStore: the ksqlDB-TABLE equivalent — a
              materialized latest-state-per-key table, rebuilt by replay.
windows.py  — event-time extensions: watermarked windowed counts,
              sessionization (applyInPandasWithState), streaming dedup.
curation.py — incremental corpus curation: streaming ingest →
              cross-batch dedup state → idempotent partitioned append.
"""
