"""Structured Streaming front-end: file-source change-stream tailing,
watermarked event-time aggregation, and the foreachBatch bridge into
the exactly-once lake merge."""
