"""Anti-join merge: insert-only database merge (SURVEY §2 C1/G2).

Reference (merge_db.py:7-12): ``INSERT INTO t SELECT o.* FROM other.t o
LEFT JOIN t m ON m.idint == o.idint WHERE m.idint IS NULL`` — copy rows
from the incoming archive that are absent from the target; existing rows
are never updated ("Existing posts will be ignored", timesearch.py:350-354).

Spark shape: ``incoming LEFT ANTI existing`` on the key, then
``unionByName`` append.  At scale the anti-join is the only shuffle; when
the existing side's key set is small enough we let AQE/broadcast handle it,
and for merge-heavy tables the 100 TB layout buckets both sides by the key
so the anti-join is co-located (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def new_rows_only(incoming: DataFrame, existing: DataFrame, key: str = "idint") -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing`` (C1)."""
    return incoming.join(existing.select(key), on=key, how="left_anti")


def anti_join_merge(existing: DataFrame, incoming: DataFrame, key: str = "idint") -> DataFrame:
    """Insert-only merge: existing ∪ (incoming anti existing).

    Invariant (SURVEY §5): count(result) == count(existing) +
    count(incoming anti existing).
    """
    return existing.unionByName(new_rows_only(incoming, existing, key))
