"""Breakdown: zero-filled dual group-count (SURVEY §2 D1, the flagship).

Reference semantics (breakdown.py:8-42 in /root/reference/timesearch_modules):
for every grouping key that appears in *either* fact table, emit the count
of rows in each table, with missing counters zero-filled
(``setdefault(..., 0)``, breakdown.py:38-41).  The reference streams both
tables through a Python dict; here it is two hash aggregates + one
full-outer join + coalesce — Catalyst does partial (map-side) aggregation
automatically, so the shuffle carries one row per distinct key per side,
not one row per input row.

Scale notes (100 TB): the pre-join aggregates shrink each side to
|distinct keys| rows, so the outer join's shuffle is tiny relative to the
scan.  Author keys are Zipf-skewed in the wild but the skew is consumed by
the *aggregate* (map-side partials), not the join; AQE skew-join handles
any residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def breakdown(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_name: str = "submissions",
    right_name: str = "comments",
    key_name: str | None = None,
) -> DataFrame:
    """Per-key counts of two fact tables, full-outer zero-filled.

    Returns columns: ``key_name, <left_name>, <right_name>, total_posts``
    (total is D4, breakdown.py:63-66).
    """
    key_name = key_name or key
    lc = left.groupBy(F.col(key).alias(key_name)).agg(F.count("*").alias(left_name))
    rc = right.groupBy(F.col(key).alias(key_name)).agg(
        F.count("*").alias(f"__r_{right_name}")
    )
    # null-SAFE join key: a NULL grouping key (deleted authors) groups on
    # each side but a plain USING join can't equate NULL=NULL — the group
    # would split into two half-counted rows and the JSON export's dict
    # would keep only one (the reference's dict setdefault merges them)
    out = (
        lc.join(
            rc,
            lc[key_name].eqNullSafe(rc[key_name]),
            "full_outer",
        )
        .select(
            F.coalesce(lc[key_name], rc[key_name]).alias(key_name),
            F.col(left_name),
            F.col(f"__r_{right_name}").alias(right_name),
        )
        .select(
            F.col(key_name),
            F.coalesce(F.col(left_name), F.lit(0)).alias(left_name),
            F.coalesce(F.col(right_name), F.lit(0)).alias(right_name),
        )
        .withColumn("total_posts", (F.col(left_name) + F.col(right_name)).cast("long"))
    )
    return out


def breakdown_sorted(
    bd: DataFrame,
    sort: str,
    key_name: str,
    left_name: str = "submissions",
    right_name: str = "comments",
) -> DataFrame:
    """Reference's comparator sorts (breakdown.py:55-82): by name (lower),
    or by -submissions / -comments / -total with lower(name) tiebreak."""
    # exact-key final tiebreak: the reference's comparator ends at
    # lower(name) and leans on Python's stable sort for case-colliding
    # names; Spark's orderBy is nondeterministic on full ties, so the
    # tie is refined deterministically — this also keeps the collect
    # and sharded export forms byte-identical on such names
    exact_key = F.col(key_name).cast("string")
    lower_key = F.lower(exact_key)
    if sort == "name":
        return bd.orderBy(lower_key.asc(), exact_key.asc())
    cols = {"submissions": left_name, "comments": right_name,
            "total_posts": "total_posts"}
    if sort not in cols:
        raise ValueError(
            f"unknown sort {sort!r}: use name|{'|'.join(cols)}"
        )
    return bd.orderBy(F.col(cols[sort]).desc(), lower_key.asc(), exact_key.asc())
