"""Structured Streaming ingest (S1-S3, ST1-ST3, ST7)."""
