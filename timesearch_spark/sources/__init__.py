"""Ingest sources: NDJSON archives, keyset-paginated HTTP, polling live
sources (SURVEY §2 A3-A7)."""
