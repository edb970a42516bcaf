"""Structured Streaming variants of the batch ingest paths (SURVEY.md §2.9)."""
