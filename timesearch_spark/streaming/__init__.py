"""Streaming ingestion: livestream queries, the MERGE/CDC sink, and
resume semantics (SURVEY §2 I1-I7, §3.4)."""
