"""Slowly-changing-dimension (Type 2) materialization over a change
stream, and the point-in-time lookup against it.

The reference captures edits as (id, previous_body, replaced_at) CDC
rows (tsdb.py-style edit capture — operators/upsert.py implements that
surface); what it never builds is the HISTORY TABLE those rows imply.
``scd2_build`` closes that gap: every change becomes a versioned row
with a [valid_from, valid_to) interval, so "what did this row look like
at time T" is a first-class query instead of a log replay.

Plan shapes (both linear, both single-key-shuffle):

- :func:`scd2_build` — one shuffle on the key; ``lead(ts)`` over the
  per-key ordered scan closes each version's interval, an optional
  ``lag``-comparison drops no-op versions first (consecutive duplicate
  attribute vectors collapse into one interval, the standard SCD2
  dedup).  Append-friendly: versions for a key depend only on that
  key's rows.
- :func:`scd2_lookup` — point-in-time correctness for fact enrichment
  ("the customer's priority AS OF the order date", the
  training-data-leakage guard): because SCD2 intervals tile each key's
  timeline, the containment join degenerates to an as-of join on
  ``valid_from`` — asof.asof_join's union-trick linear plan, with a
  post-filter on ``valid_to`` for facts predating the first version.
  No range join, no interval explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timesearch_spark.operators.asof import asof_join


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
    drop_unchanged: bool = True,
    keep_order_cols: bool = False,
) -> DataFrame:
    """Change rows → SCD2 history: (key..., attr..., valid_from,
    valid_to, version, is_current) with ``valid_to`` null on the open
    (current) version and version = 1..n per key in time order.
    ``keep_order_cols`` carries the order columns into the output (each
    version remembers the change-log position that created it) —
    required for exact incremental maintenance via :func:`scd2_apply`.

    ``order_cols`` breaks same-timestamp ties (pass the change-log
    sequence id; defaults to ``attr_cols`` for a deterministic if
    arbitrary order).  ``drop_unchanged`` collapses consecutive
    identical attribute vectors before intervals are cut, so a noisy
    change stream (every sync re-emits the row) still yields minimal
    history."""
    tie = order_cols if order_cols is not None else attr_cols
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tie]
    )
    df = changes
    if drop_unchanged:
        attrs = F.struct(*[F.col(c) for c in attr_cols])
        df = (
            df.withColumn("__prev", F.lag(attrs).over(w))
            .filter(
                F.col("__prev").isNull()
                | ~attrs.eqNullSafe(F.col("__prev"))
            )
            .drop("__prev")
        )
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, *attr_cols,
            # an order col that is also a key/attr col is already in the
            # output — re-selecting it would produce a duplicate-named
            # column that breaks scd2_apply's joins far from the cause
            *(
                [c for c in tie if c not in (*key_cols, *attr_cols)]
                if keep_order_cols and order_cols is not None
                else []
            ),
            "valid_from", "valid_to", "version", "is_current",
        )
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
    drop_unchanged: bool = True,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold a new change batch into an
    existing history WITHOUT rebuilding untouched keys.

    Keys absent from the batch pass through untouched (a left-anti probe
    on the batch's distinct keys — the only thing the full history
    pays); for touched keys the stored versions are lowered back to
    change rows (valid_from, attrs — versions ARE the surviving change
    rows, so no original change log is needed) and re-built together
    with the batch.  Cost tracks |touched keys' history| + |batch|, not
    |history| — the same contract every incremental operator in this
    engine makes (dedup index, rollup refresh, sketch store).

    Exactly equivalent to ``scd2_build(keep_order_cols=True)`` over the
    full concatenated change stream (test-pinned) — with one documented
    exception: a no-op change already collapsed by ``drop_unchanged``
    is gone from the stored history, so a LATE batch row landing
    between it and its predecessor cannot resurrect it (the full
    rebuild would).  Appends at/after each key's last stored change —
    the normal CDC case — are always exact.  Requires a history built
    WITH ``keep_order_cols=True`` when ``order_cols`` is given —
    versions must remember their change-log position for cross-batch
    ties to re-resolve identically."""
    tie = order_cols if order_cols is not None else []
    missing = set(tie) - set(history.columns)
    if missing:
        raise ValueError(
            f"history lacks order columns {sorted(missing)}: build it "
            "with keep_order_cols=True for incremental maintenance"
        )
    keys = changes.select(*key_cols).distinct()
    untouched = history.join(keys, key_cols, "left_anti")
    lowered = (
        history.join(keys, key_cols)
        .select(
            *key_cols,
            F.col("valid_from").alias(ts_col),
            *attr_cols,
            *tie,
        )
    )
    batch = changes.select(*key_cols, ts_col, *attr_cols, *tie)
    rebuilt = scd2_build(
        lowered.unionByName(batch),
        key_cols,
        ts_col,
        attr_cols,
        order_cols=order_cols,
        drop_unchanged=drop_unchanged,
        keep_order_cols=order_cols is not None,
    )
    return untouched.unionByName(rebuilt)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_ts: str,
    attr_cols: list[str],
) -> DataFrame:
    """Point-in-time enrichment: each fact row gets the dim attributes
    valid at ``fact_ts`` (``valid_from <= ts`` and ``ts < valid_to`` /
    open).  Left-outer: facts before the key's first version keep
    nulls.  Output adds ``matched_ts`` (the matched valid_from) plus
    ``attr_cols``."""
    joined = asof_join(
        facts,
        dim.select(*on, "valid_from", "valid_to", "version", *attr_cols),
        on=on,
        left_ts=fact_ts,
        right_ts="valid_from",
        right_cols=["valid_to", "version", *attr_cols],
        direction="backward",
        # same-instant versions (zero-length intervals from same-ts
        # changes) tie on valid_from: the greatest version is the one
        # whose interval is open at that instant — without this the
        # winner is shuffle-order-dependent and the in_range guard can
        # null out a valid match
        right_order_cols=["version"],
    )
    # intervals tile the timeline, so the as-of hit is the containing
    # version by construction; the guard only matters for half-open
    # histories where a fact lands exactly on/after a closed tail
    in_range = F.col("valid_to").isNull() | (
        F.col(fact_ts) < F.col("valid_to")
    )
    out = joined
    for c in ["matched_ts", "valid_to", *attr_cols]:
        out = out.withColumn(c, F.when(in_range, F.col(c)))
    return out.drop("valid_to", "version")
