"""PySpark-native analytics engine with the query and data-processing
capabilities of ``desavitho/big-data-traffict-prediction``.

The reference (see SURVEY.md) is a Flask traffic-monitoring app whose
"analytics engine" is SQLite SQL strings plus imperative Python loops.
This package re-expresses every operator in its query surface
(SURVEY.md §2) as idiomatic Spark DataFrame/SQL programs, designed for
a 1000-executor cluster over ~100 TB even though it is tested on
``local[32]``:

- declarative plans so Catalyst handles pushdown/pruning/join selection,
- broadcast joins for the (tiny) dimension tables,
- exact-integer aggregation patterns so results are reproducible across
  engines and partitionings,
- Structured Streaming for the reference's thread-based ingest loop,
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) per the north star in BASELINE.json.
"""

__version__ = "0.1.0"
