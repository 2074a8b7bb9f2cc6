"""As-of and interval joins (operators/asof.py): exactness is pinned
against DuckDB's NATIVE implementations (ASOF JOIN; a true range join)
on the events table — the strongest available oracle for operators the
driver checks rows-only."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from timesearch_spark.operators.asof import asof_join, interval_join
from timesearch_spark.operators.windows import sessionize, with_event_time
from timesearch_spark.tables import load


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT event_id, user_id, event_type, "
        f"epoch_ns(ts) // 1000000000 AS ts_sec "
        f"FROM '{SF_ORACLE}/events.parquet'"
    )
    yield con
    con.close()


def _sides(spark):
    ev = with_event_time(load(spark, SF_ORACLE, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_sec"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_sec").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return purchases, clicks


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values("event_id").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].fillna(-1).astype("int64")
    return out


@pytest.mark.parametrize(
    "direction,strict,op",
    [
        ("backward", False, "<="),
        ("backward", True, "<"),
        ("forward", False, ">="),
        ("forward", True, ">"),
    ],
)
def test_asof_matches_duckdb_native(spark, duck, direction, strict, op):
    purchases, clicks = _sides(spark)
    got = _canon(
        asof_join(
            purchases,
            clicks,
            on=["user_id"],
            left_ts="ts_sec",
            right_ts="click_ts",
            right_cols=["click_id"],
            direction=direction,
            strict=strict,
        ).toPandas()
    )
    exp = _canon(
        duck.sql(
            f"""
        WITH p AS (SELECT event_id, user_id, ts_sec FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts_sec AS click_ts, event_id AS click_id
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts_sec,
               c.click_ts AS matched_ts, c.click_id
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.click_ts {op} p.ts_sec
        """
        ).df()
    )
    pd.testing.assert_frame_equal(got, exp)


def test_asof_tolerance_nulls_far_matches(spark):
    purchases, clicks = _sides(spark)
    base = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts_sec",
        right_ts="click_ts", right_cols=["click_id"],
    ).toPandas()
    tol = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts_sec",
        right_ts="click_ts", right_cols=["click_id"], tolerance=3600,
    ).toPandas()
    assert len(tol) == len(base)  # left-outer either way
    m = base.set_index("event_id")
    t = tol.set_index("event_id")
    for eid in m.index:
        dist = m.loc[eid, "ts_sec"] - m.loc[eid, "matched_ts"]
        if pd.notna(dist) and dist <= 3600:
            assert t.loc[eid, "matched_ts"] == m.loc[eid, "matched_ts"]
        else:
            assert pd.isna(t.loc[eid, "matched_ts"])


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Independent second oracle: seeded-random key/ts data vs pandas
    merge_asof across direction × tolerance (pandas has no strict
    flag; DuckDB covers that axis).  Catches boundary conventions a
    single fixed dataset can miss."""
    import numpy as np

    rng = np.random.RandomState(7)
    for trial in range(4):
        nl, nr = rng.randint(30, 120), rng.randint(30, 120)
        lp = pd.DataFrame({
            "k": rng.randint(0, 8, nl),
            "ts": rng.randint(0, 500, nl).astype("int64"),
            "lid": np.arange(nl, dtype="int64"),
        })
        rp = pd.DataFrame({
            "k": rng.randint(0, 8, nr),
            "rts": np.sort(rng.choice(10_000, nr, replace=False)).astype(
                "int64"
            ),  # unique right ts → unique expected match
            "rid": np.arange(nr, dtype="int64") + 1000,
        })
        ld = spark.createDataFrame(lp)
        rd = spark.createDataFrame(rp)
        for direction in ("backward", "forward"):
            for tol in (None, 50):
                got = (
                    asof_join(
                        ld, rd, on=["k"], left_ts="ts", right_ts="rts",
                        right_cols=["rid"], direction=direction,
                        tolerance=tol,
                    )
                    .toPandas()
                    .sort_values("lid")
                    .reset_index(drop=True)
                )
                exp = pd.merge_asof(
                    lp.sort_values("ts"),
                    rp.rename(columns={"rts": "ts"}).sort_values("ts"),
                    on="ts", by="k", direction=direction,
                    tolerance=tol,
                ).sort_values("lid").reset_index(drop=True)
                a = got.rid.fillna(-1).astype("int64")
                b = exp.rid.fillna(-1).astype("int64")
                assert (a == b).all(), (trial, direction, tol)


def test_asof_rejects_bad_args(spark):
    purchases, clicks = _sides(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(purchases, clicks, on=["user_id"], left_ts="ts_sec",
                  right_ts="click_ts", direction="nearest")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            purchases,
            clicks.select("user_id", F.col("click_ts"),
                          F.col("click_id").alias("event_id")),
            on=["user_id"], left_ts="ts_sec", right_ts="click_ts",
        )


_SESS_SQL = """
    WITH v AS (SELECT user_id, ts_sec, event_id FROM events
               WHERE event_type = 'view'),
    numbered AS (
      SELECT user_id, ts_sec, event_id,
        CASE WHEN LAG(ts_sec) OVER w IS NULL
               OR ts_sec - LAG(ts_sec) OVER w > {gap} THEN 1 ELSE 0 END AS ns
      FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    ),
    flagged AS (
      SELECT user_id, ts_sec,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
               AS session_id
      FROM numbered
    ),
    sess AS (
      SELECT user_id, session_id, MIN(ts_sec) AS session_start,
             MAX(ts_sec) AS session_end, COUNT(*) AS n_events
      FROM flagged GROUP BY 1, 2
    ),
    p AS (SELECT event_id, user_id, ts_sec FROM events
          WHERE event_type = 'purchase')
"""


def _iv_sides(spark, gap):
    ev = with_event_time(load(spark, SF_ORACLE, "events"))
    sessions = sessionize(ev.filter(F.col("event_type") == "view"), gap_sec=gap)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_sec"
    )
    return purchases, sessions


@pytest.mark.parametrize("gap,bucket", [(7200, 7200), (7200, 600), (86400, 3600)])
def test_interval_inner_matches_duckdb(spark, duck, gap, bucket):
    purchases, sessions = _iv_sides(spark, gap)
    got = (
        interval_join(
            purchases, sessions, point_ts="ts_sec",
            start_col="session_start", end_col="session_end",
            on=["user_id"], bucket_sec=bucket,
        )
        .select("event_id", "session_id", "session_start", "session_end")
        .toPandas()
        .sort_values(["event_id", "session_id"])
        .reset_index(drop=True)
        .astype("int64")
    )
    exp = (
        duck.sql(
            _SESS_SQL.format(gap=gap)
            + """
        SELECT p.event_id, sess.session_id, sess.session_start,
               sess.session_end
        FROM p JOIN sess ON p.user_id = sess.user_id
          AND p.ts_sec BETWEEN sess.session_start AND sess.session_end
        ORDER BY p.event_id, sess.session_id
        """
        )
        .df()
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, exp)


def test_interval_left_keeps_unmatched_points(spark):
    purchases, sessions = _iv_sides(spark, 7200)
    inner = interval_join(
        purchases, sessions, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=7200,
    )
    left = interval_join(
        purchases, sessions, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=7200, how="left",
        point_id_cols=["event_id"],
    )
    n_points = purchases.count()
    n_inner = inner.count()
    lpdf = left.toPandas()
    matched = lpdf[lpdf.session_id.notna()]
    assert len(matched) == n_inner
    # every point appears; unmatched exactly once with null interval cols
    unmatched = lpdf[lpdf.session_id.isna()]
    assert len(unmatched) == n_points - matched.event_id.nunique()
    assert unmatched.session_start.isna().all()


def test_interval_left_preserves_duplicate_points(spark):
    # the left path is a true outer join: byte-identical duplicate point
    # rows each survive, matched or not (the r5 left-anti recovery would
    # have collapsed the unmatched copy when ids collided)
    points = spark.createDataFrame(
        [(1, 1, 150), (1, 1, 150), (1, 2, 999)],
        "user_id long, event_id long, ts_sec long",
    )
    ivs = spark.createDataFrame(
        [(1, 7, 100, 200)],
        "user_id long, session_id long, session_start long, session_end long",
    )
    got = interval_join(
        points, ivs, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=100, how="left",
    ).toPandas()
    assert len(got) == 3
    assert (got[got.event_id == 1].session_id == 7).all()
    assert got[got.event_id == 2].session_id.isna().all()


def test_interval_bucket_explosion_guard(spark):
    # a 10-year interval at bucket_sec=3600 would explode into ~87k
    # buckets — the guard must raise OUR message, never Spark's opaque
    # sequence-length error; bucket_sec=None auto-derives and succeeds
    points = spark.createDataFrame([(1, 50)], "user_id long, ts_sec long")
    ivs = spark.createDataFrame(
        [(1, 0, 10 * 365 * 86400)],
        "user_id long, session_start long, session_end long",
    )
    bad = interval_join(
        points, ivs, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=3600,
    )
    with pytest.raises(Exception, match="interval_join: an interval spans"):
        bad.collect()
    auto = interval_join(
        points, ivs, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=None,
    )
    assert auto.count() == 1


def test_interval_inverted_interval_guard(spark):
    # an inverted interval (end < start) yields n_buckets < 1; Spark's
    # sequence(start_b, end_b) would silently DESCEND and explode bogus
    # bucket rows (none of which can match) — the guard must raise the
    # same loud message as the too-many-buckets case
    points = spark.createDataFrame([(1, 50)], "user_id long, ts_sec long")
    inverted = spark.createDataFrame(
        [(1, 1_000_000_000, 0)],
        "user_id long, session_start long, session_end long",
    )
    bad = interval_join(
        points, inverted, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=3600,
    )
    with pytest.raises(Exception, match="interval_join: an interval spans"):
        bad.collect()


def test_interval_same_bucket_inversion_also_raises(spark):
    # end < start INSIDE one bucket gives n_buckets == 1, so the bucket
    # arithmetic alone can't see the inversion — the raw-column guard
    # must still fail loudly instead of silently matching nothing
    points = spark.createDataFrame([(1, 75)], "user_id long, ts_sec long")
    inverted = spark.createDataFrame(
        [(1, 100, 50)],  # start_b == end_b == 0 at bucket_sec=3600
        "user_id long, session_start long, session_end long",
    )
    bad = interval_join(
        points, inverted, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=3600,
    )
    with pytest.raises(Exception, match="interval_join: an interval spans"):
        bad.collect()


def test_asof_tie_break_on_right_order_cols(spark):
    # two right rows at the SAME timestamp: without right_order_cols the
    # winner is shuffle-order-dependent; with it, the greatest wins
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 50, 1, "old"), (1, 50, 2, "new")],
        "k long, rts long, ver long, tag string",
    )
    got = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["ver", "tag"], right_order_cols=["ver"],
    ).first()
    assert got["ver"] == 2 and got["tag"] == "new"
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                  right_cols=["tag"], right_order_cols=["ver"])


def test_interval_rejects_bad_args(spark):
    purchases, sessions = _iv_sides(spark, 7200)
    with pytest.raises(ValueError, match="inner|left"):
        interval_join(purchases, sessions, point_ts="ts_sec",
                      start_col="session_start", end_col="session_end",
                      on=["user_id"], how="outer")
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(
            purchases.withColumn("session_start", F.lit(0)),
            sessions, point_ts="ts_sec", start_col="session_start",
            end_col="session_end", on=["user_id"],
        )


def test_asof_ignores_null_timestamps(spark):
    """Null right timestamps must never match (DuckDB ASOF ignores null
    keys); null left timestamps stay unmatched in both directions."""
    left = spark.createDataFrame(
        [(1, 100, 1), (1, None, 2)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, None, 10), (1, 50, 11)], "k long, rts long, rid long"
    )
    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="rts",
                right_cols=["rid"], direction=direction,
            ).collect()
        }
        assert got[2] is None, direction  # null left ts: unmatched
        if direction == "backward":
            assert got[1] == 11  # only the real (non-null) right matches
        else:
            assert got[1] is None  # no right at/after ts=100


def test_auto_bucket_never_trips_its_own_guard(spark):
    # the max-length term must decide the width (many short intervals
    # keep p90 tiny at 2), and the longest interval is
    # boundary-crossing: [1, 8192] at b=2 spans floor(8192/2) -
    # floor(1/2) + 1 = 4097 buckets — dividing by max_buckets exactly
    # (the pre-fix formula: 8191//4096 + 1 = 2) trips the very guard
    # auto mode exists to avoid; the margin formula derives 3 and the
    # interval fits in 2731 buckets
    points = spark.createDataFrame([(1, 50)], "user_id long, ts_sec long")
    ivs = spark.createDataFrame(
        [(1, 1, 8192)] + [(1, 10 * i, 10 * i + 2) for i in range(2, 12)],
        "user_id long, session_start long, session_end long",
    )
    from timesearch_spark.operators.asof import derive_bucket_sec

    assert derive_bucket_sec(ivs, "session_start", "session_end", 4096) == 3
    got = interval_join(
        points, ivs, point_ts="ts_sec", start_col="session_start",
        end_col="session_end", on=["user_id"], bucket_sec=None,
        max_buckets=4096,
    )
    # ts=50 is contained in [1, 8192] and in the short interval [50, 52]
    assert got.count() == 2
