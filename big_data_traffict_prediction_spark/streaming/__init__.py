"""Structured Streaming slice: the reference's thread-per-camera ingest
loop re-expressed as one streaming query (SURVEY.md §2.9, §3.3)."""
