"""Relational operators re-expressed Spark-first (SURVEY.md §2)."""
