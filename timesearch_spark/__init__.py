"""timesearch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of voussoir/timesearch.

The reference (/root/reference) is a single-process Python + SQLite Reddit
archiver.  This package re-expresses its data model and operator surface
(SURVEY.md §2) as idiomatic Spark DataFrame / SQL / Structured Streaming
programs, designed for 100 TB-scale clusters:

- ``session``     — SparkSession factory with scale-aware defaults (AQE,
                    Arrow, tuned shuffle partitions).
- ``schemas``     — canonical Reddit-shaped StructTypes (tsdb.py:42-101).
- ``tables``      — parquet loaders for the driver's synthetic tables.
- ``sources``     — NDJSON archive reader, keyset-paginated batch source,
                    polling stream source.
- ``operators``   — the operator library: breakdown, merge, upsert/CDC,
                    listings, tree assembly, dedup, similarity, text stats.
- ``functions``   — scalar helpers (base36, prefixes, escapes, formats).
- ``streaming``   — Structured Streaming queries (livestream, windows).
"""

__version__ = "0.1.0"
