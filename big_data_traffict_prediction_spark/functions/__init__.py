"""Scalar/text/dedup/similarity function surface + LLM-data-pipeline
operators (SURVEY.md §2.8, §2.10 and the BASELINE.json north star)."""
