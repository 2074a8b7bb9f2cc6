"""As-of (point-in-time) and interval joins over event streams.

Neither exists in the reference (its only temporal join is the monotone
resume bound, tsdb.py-style incremental sync); both are staples of the
time-series workloads this engine targets — "which click preceded this
purchase", "which session window contains this event".

Spark has no ASOF JOIN operator, and the naive formulation
(``l JOIN r ON r.ts <= l.ts`` + max) is a quadratic theta-join.  Both
operators here are re-expressed as linear plans:

- :func:`asof_join` — the union trick: tag both sides, union, ONE
  shuffle on the key, and a ``last(payload, ignorenulls)`` running
  window carries the most recent right row forward onto every left row.
  Cost is one exchange + one ordered scan of \\|L\\|+\\|R\\| rows — the
  merge-join an engine with a native ASOF operator (DuckDB, kdb) runs,
  expressed in DataFrame algebra.  At 100 TB both inputs shuffle on the
  same key, so AQE coalesces them into one co-partitioned stage; a hot
  key (one user dominating) is the same skew exposure sessionize has —
  salt the key or pre-filter the hot user.
- :func:`interval_join` — time-bucket blocking: each interval explodes
  into the fixed-width buckets it covers, each point hashes to exactly
  ONE bucket, and the candidate join is a plain equi-join on
  (key, bucket) + an exact containment filter.  A (point, interval)
  pair can only meet in the point's bucket, so no dedup pass is needed.
  Candidate volume is \\|points\\| + \\|intervals\\|·(len/bucket_sec + 1):
  pick ``bucket_sec`` near the typical interval length so the blow-up
  stays ~2×.  This is the bucketed range-join DBR's range-join hint and
  Flink's interval join both compile to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    strict: bool = False,
    right_order_cols: list[str] | None = None,
) -> DataFrame:
    """Join each left row to the nearest right row per key: the latest
    ``right_ts <= left_ts`` (``backward``) or earliest
    ``right_ts >= left_ts`` (``forward``).  ``strict`` excludes equal
    timestamps; ``tolerance`` (same units as the ts columns) nulls out
    matches farther than the bound, keeping the left row (pandas
    ``merge_asof`` semantics — the join is left-outer either way).

    Output: every left column, plus ``matched_ts`` and each requested
    right column (nulls when nothing qualifies).  Among right rows with
    EQUAL timestamps the winner is shuffle-order-dependent unless
    ``right_order_cols`` (payload columns, must be in ``right_cols``)
    totally orders them — then the row with the GREATEST order value
    wins.  Pass it whenever ``right_ts`` can tie (scd2_lookup passes
    ``version``); with a totally-ordered ``right_ts`` it is unneeded.

    Timestamps may be any orderable numeric/timestamp type shared by
    both sides; ``tolerance`` requires a numeric one.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (*on, right_ts)
    ]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    # "matched_ts" is a reserved output name: a left column (or requested
    # right column) with that name would silently duplicate in the output
    if "matched_ts" in left.columns or "matched_ts" in rcols:
        raise ValueError(
            "'matched_ts' is reserved for the as-of output; rename the "
            "input column before joining"
        )

    from pyspark.sql.types import StructField, StructType

    payload = F.struct(
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c) for c in rcols],
    )
    payload_t = StructType(
        [StructField("matched_ts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in rcols]
    )
    left_t = StructType(list(left.schema.fields))
    # One unioned relation: key cols, event time, tie-rank, payload
    # (null on the left side), and the left row as a struct (null on the
    # right side).  On timestamp ties the right row must sort BEFORE the
    # left row iff ties match (non-strict): side 0 < 1 handles backward;
    # strict flips the pair so the window's frame ends before the tie.
    side_right, side_left = (1, 0) if strict else (0, 1)
    # null timestamps never participate: a null right_ts sorts FIRST
    # under the ascending window order and last(ignorenulls) would carry
    # its payload onto every otherwise-unmatched left row (DuckDB's ASOF
    # ignores null keys; pandas merge_asof refuses them outright)
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(side_right).alias("__side"),
        payload.alias("__p"),
        F.lit(None).cast(left_t).alias("__l"),
    )
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__t"),
        F.lit(side_left).alias("__side"),
        F.lit(None).cast(payload_t).alias("__p"),
        lrow.alias("__l"),
    )
    both = r.unionByName(l)

    if right_order_cols:
        missing = set(right_order_cols) - {"matched_ts", *rcols}
        if missing:
            raise ValueError(
                f"right_order_cols not in the payload: {sorted(missing)}"
            )
    # tie-break among equal right timestamps: payload order columns rank
    # rights within the (__t, __side) group; left rows (__p null) sort
    # first, which is irrelevant — each left row only ends its own frame
    ties = [
        F.col("__p")[c].asc_nulls_first() for c in (right_order_cols or [])
    ]
    order = [F.col("__t").asc(), F.col("__side").asc(), *ties]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__side").asc(), *ties]
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("__m", F.last("__p", ignorenulls=True).over(w))

    out = matched.filter(F.col("__side") == side_left)
    # a null LEFT ts can't qualify either (under the forward/descending
    # order it sorts after every right row and would match the earliest)
    m = F.when(F.col("__t").isNotNull(), F.col("__m"))
    if tolerance is not None:
        dist = (
            F.col("__t") - m["matched_ts"]
            if direction == "backward"
            else m["matched_ts"] - F.col("__t")
        )
        m = F.when(dist <= tolerance, F.col("__m"))
    return out.select(
        *[F.col("__l")[f.name].alias(f.name) for f in left.schema.fields],
        m["matched_ts"].alias("matched_ts"),
        *[m[c].alias(c) for c in rcols],
    )


#: Hard ceiling on buckets one interval may explode into.  Spark's
#: ``sequence`` silently allows huge arrays until it hits its own
#: element cap and kills the job with an opaque error; we fail first,
#: loudly, with a fix suggestion (or auto-derive — see interval_join).
MAX_BUCKETS_PER_INTERVAL = 4096


def derive_bucket_sec(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    max_buckets: int = MAX_BUCKETS_PER_INTERVAL,
) -> int:
    """Sample interval lengths and pick a bucket width: the p90 length
    (so ~90% of intervals explode into ≤2 buckets) floored at
    ``max_len / (max_buckets - 2)`` — a bucket-boundary-crossing
    interval spans ``floor(len/b) + 2`` buckets, so dividing by
    ``max_buckets`` exactly would let the longest interval land at
    ``max_buckets + 1`` and trip the very guard this function exists to
    avoid.  One narrow agg job over (start, end) only.
    """
    ln = F.col(end_col) - F.col(start_col)
    row = intervals.agg(
        F.percentile_approx(ln, 0.9).alias("p90"), F.max(ln).alias("mx")
    ).first()
    if row is None or row["p90"] is None:
        return 3600
    return max(
        int(row["p90"]), int(row["mx"] // max(max_buckets - 2, 1)) + 1, 1
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_sec: int | None = 3600,
    how: str = "inner",
    point_id_cols: list[str] | None = None,
    max_buckets: int = MAX_BUCKETS_PER_INTERVAL,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= ts <= end``), optionally key-scoped by ``on``.

    ``how="inner"`` drops uncontained points; ``"left"`` keeps them with
    null interval columns.  Column names must not clash (caller selects/
    renames first — same contract as asof_join's right_cols).
    ``point_id_cols`` is accepted for backward compatibility and
    ignored: the left path is a true outer hash join, so duplicate
    point rows are preserved verbatim with no uniqueness requirement.

    The containment predicate never reaches the join condition as a
    range: both sides get integer bucket keys (``ts // bucket_sec``;
    intervals explode into every bucket they overlap) and the join is a
    hash equi-join on (on..., bucket) with the exact BETWEEN applied as
    a post-filter (inner) or inside the join condition (left).  Each
    point belongs to exactly one bucket, so a qualifying pair meets
    exactly once — no dedup stage.

    ``bucket_sec=None`` auto-derives the width from a one-pass sample
    of interval lengths (:func:`derive_bucket_sec`).  An explicit
    ``bucket_sec`` that would explode any interval into more than
    ``max_buckets`` buckets raises at runtime with a clear message
    instead of hitting Spark's opaque ``sequence`` element cap.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    on = on or []
    clash = set(points.columns) & set(intervals.columns)
    if clash - set(on):
        raise ValueError(
            f"overlapping non-key columns: {sorted(clash - set(on))}"
        )
    if bucket_sec is None:
        bucket_sec = derive_bucket_sec(
            intervals, start_col, end_col, max_buckets
        )
    b = F.lit(int(bucket_sec))
    start_b = F.floor(F.col(start_col) / b).cast("long")
    end_b = F.floor(F.col(end_col) / b).cast("long")
    n_buckets = end_b - start_b + F.lit(1)
    # n_buckets < 1 means an inverted interval (end < start) crossing a
    # bucket boundary: Spark's sequence(start_b, end_b) silently
    # DESCENDS, exploding bogus bucket rows that can never satisfy the
    # BETWEEN — fail as loudly as the too-many-buckets case instead.
    # The raw-column test catches the SAME-bucket inversion too (e.g.
    # start=100, end=50 under bucket_sec=3600 gives n_buckets=1), which
    # would otherwise silently produce no matches.
    guarded_start = F.when(
        (n_buckets > max_buckets)
        | (n_buckets < 1)
        | (F.col(end_col) < F.col(start_col)),
        F.raise_error(
            F.concat(
                F.lit("interval_join: an interval spans "),
                n_buckets.cast("string"),
                F.lit(
                    f" buckets (allowed: 1..{max_buckets}) at bucket_sec="
                    f"{int(bucket_sec)}; an inverted interval (end < "
                    "start) or too-small bucket_sec — fix the data, "
                    "raise bucket_sec, or pass bucket_sec=None to "
                    "auto-derive it"
                ),
            )
        ).cast("long"),
    ).otherwise(start_b)
    ivb = intervals.withColumn(
        "__b", F.explode(F.sequence(guarded_start, end_b))
    )
    ptb = points.withColumn("__b", F.floor(F.col(point_ts) / b).cast("long"))
    contained = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "inner":
        return ptb.join(ivb, [*on, "__b"]).filter(contained).drop("__b")
    # left: ONE outer hash equi-join with the exact containment folded
    # into the join condition — Catalyst extracts the equality conjuncts
    # as hash keys and evaluates BETWEEN during the probe, so a point
    # whose bucket matches but containment fails still surfaces once
    # with null interval columns.  No second pass, no point-key
    # uniqueness requirement, duplicate points preserved verbatim.
    p, iv = ptb.alias("__pt"), ivb.alias("__iv")
    cond = F.col("__pt.__b") == F.col("__iv.__b")
    for c in on:
        cond = cond & (F.col(f"__pt.{c}") == F.col(f"__iv.{c}"))
    cond = cond & (
        (F.col(f"__pt.{point_ts}") >= F.col(f"__iv.{start_col}"))
        & (F.col(f"__pt.{point_ts}") <= F.col(f"__iv.{end_col}"))
    )
    iv_only = [c for c in intervals.columns if c not in on]
    return p.join(iv, cond, "left").select(
        *[F.col(f"__pt.{c}") for c in points.columns],
        *[F.col(f"__iv.{c}") for c in iv_only],
    )
