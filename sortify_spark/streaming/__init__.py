"""Structured Streaming variants of the batch pipelines (SURVEY.md §2.11)."""
