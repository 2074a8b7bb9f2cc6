"""Skew probe: time each per-key sequential operator against its
skew-immune twin on a synthetically HOT dataset — the regime the main
scaling probe (key-offset replication, skew shape preserved but
bounded) never enters.

``python tools/bench_skew.py [MEGA_N] [HOT_EVENTS]`` (defaults
1_000_000-comment thread, 2_000_000-event user).  Datasets are built
from ``spark.range`` expressions — deterministic, no files, negligible
generation cost next to the operators under test:

- comment forest: one MEGA_N-comment thread (binary-tree parents,
  depth ~log2 N) over a background of 20k five-comment threads —
  `comment_forest` walks the mega thread in ONE Python task;
  `comment_forest_big` pointer-doubles it across the cluster.
- funnels/sessions: one user with HOT_EVENTS events (1s apart, cycling
  view→click→buy→scroll) over 20k ten-event users — the plain forms
  collect the hot user's history into one task; the salted forms chunk
  it by time bucket.

Each cell is min of 2 runs through the noop sink, cache cleared.  The
twins are exact (fuzz-pinned in tests/), so the delta is pure plan
shape.  Results go to stdout as a markdown table — paste into the
round's SCALING file.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from timesearch_spark.session import get_spark  # noqa: E402


def mega_forest_df(spark, n: int):
    """One n-comment thread (parent i//2 — depth ~log2 n) plus 20k
    small threads of 5."""
    mega = spark.range(n).select(
        F.concat(F.lit("t1_m"), F.col("id").cast("string")).alias("idstr"),
        F.when(F.col("id") == 0, F.lit("t3_mega"))
        .otherwise(
            F.concat(F.lit("t1_m"), (F.col("id") / 2).cast("long").cast("string"))
        )
        .alias("parent"),
        F.lit("mega").alias("submission"),
        F.col("id").alias("created"),
        F.pmod(F.col("id"), F.lit(97)).alias("score"),
    )
    small = spark.range(20_000 * 5).select(
        F.concat(F.lit("t1_s"), F.col("id").cast("string")).alias("idstr"),
        F.when(F.col("id") % 5 == 0,
               F.concat(F.lit("t3_s"), (F.col("id") / 5).cast("long").cast("string")))
        .otherwise(F.concat(F.lit("t1_s"), (F.col("id") - 1).cast("string")))
        .alias("parent"),
        F.concat(F.lit("s"), (F.col("id") / 5).cast("long").cast("string"))
        .alias("submission"),
        F.col("id").alias("created"),
        F.pmod(F.col("id"), F.lit(7)).alias("score"),
    )
    return mega.unionByName(small)


def hot_events_df(spark, n: int):
    """One user with n events 1s apart plus 20k ten-event users."""
    types = F.array(F.lit("view"), F.lit("click"), F.lit("buy"), F.lit("scroll"))
    hot = spark.range(n).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("event_id"),
        (F.col("id") * F.lit(10**9)).alias("ts"),
        F.lit("hot_user").alias("user_id"),
        F.element_at(types, F.pmod(F.col("id"), F.lit(4)).cast("int") + 1).alias(
            "event_type"
        ),
        F.lit(0.0).alias("value"),
    )
    cold = spark.range(20_000 * 10).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("event_id"),
        (F.col("id") * F.lit(10**9)).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") / 10).cast("long").cast("string")).alias(
            "user_id"
        ),
        F.element_at(types, F.pmod(F.col("id"), F.lit(4)).cast("int") + 1).alias(
            "event_type"
        ),
        F.lit(0.0).alias("value"),
    )
    return hot.unionByName(cold)


def timed(spark, build):
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    mega_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hot_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("bench-skew")

    from timesearch_spark.operators import trees as tr
    from timesearch_spark.operators import windows as win

    forest = mega_forest_df(spark, mega_n).localCheckpoint(eager=True)
    events = hot_events_df(spark, hot_n).localCheckpoint(eager=True)
    steps = ["view", "click", "buy"]

    rows = [
        (
            f"comment_forest ({mega_n:,}-node thread)",
            timed(spark, lambda: tr.comment_forest(forest)),
            timed(spark, lambda: tr.comment_forest_big(forest)),
        ),
        (
            f"funnel_progression ({hot_n:,}-event user)",
            timed(spark, lambda: win.funnel_progression(events, steps)),
            timed(spark, lambda: win.funnel_progression_salted(events, steps)),
        ),
        (
            f"session_funnel ({hot_n:,}-event user)",
            timed(spark, lambda: win.session_funnel(events, steps)),
            timed(spark, lambda: win.session_funnel_salted(events, steps)),
        ),
        (
            f"sessionize ({hot_n:,}-event user)",
            timed(spark, lambda: win.sessionize(events)),
            timed(spark, lambda: win.sessionize_salted(events)),
        ),
    ]
    print("| operator (hot-key fixture) | plain (s) | skew-immune twin (s) | speedup |")
    print("|---|---|---|---|")
    for name, tp, tt in rows:
        print(f"| {name} | {tp:.2f} | {tt:.2f} | {tp / tt:.1f}x |")


if __name__ == "__main__":
    main()
