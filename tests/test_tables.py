"""Unit tests for the dtype-adaptive event-time helpers (tables.py).

The driver's events.parquet has shipped as BOTH TIMESTAMP(NANOS)
(nanos-as-long under the legacy conf) and timestamp[us] (TIMESTAMP_NTZ)
across testdata generations.  Whichever encoding the current testdata
uses, the OTHER branch must not rot — these tests exercise both against
the same expected epoch-second floors.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from timesearch_spark.tables import event_ts_bound, event_ts_sec, ts_dtype

SEC = 1_000_000_000

#: (epoch-nanos, expected FLOOR(epoch-seconds)) — includes the HALF_UP
#: trap: a nano within 5e-7 s below a second boundary must floor DOWN.
CASES = [
    (1704067798_778549000, 1704067798),
    (1704067799_999999999, 1704067799),  # 1ns below the boundary
    (1704067800_000000000, 1704067800),  # exactly on the boundary
    (1704067800_500000001, 1704067800),  # just past scale-6 rounding
    (0, 0),
]


def test_event_ts_sec_nanos_as_long(spark):
    df = spark.createDataFrame([(n,) for n, _ in CASES], "ts long")
    assert ts_dtype(df) == "bigint"
    got = [r["s"] for r in df.select(event_ts_sec("ts", ts_dtype(df)).alias("s")).collect()]
    assert got == [e for _, e in CASES]


def test_event_ts_sec_timestamp_ntz(spark):
    rows = [
        (dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=n // 1000),)
        for n, _ in CASES
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz")
    assert ts_dtype(df).startswith("timestamp")
    got = [r["s"] for r in df.select(event_ts_sec("ts", ts_dtype(df)).alias("s")).collect()]
    assert got == [e for _, e in CASES]


def test_event_ts_bound_comparable_in_both_encodings(spark):
    lo_sec = 1704067799
    # bigint encoding: bound is the raw nano long
    dfl = spark.createDataFrame([(n,) for n, _ in CASES], "ts long")
    kept_l = dfl.filter(
        F.col("ts") >= event_ts_bound(lo_sec, ts_dtype(dfl))
    ).count()
    # timestamp encoding: bound is a foldable timestamp literal
    rows = [
        (dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=n // 1000),)
        for n, _ in CASES
    ]
    dft = spark.createDataFrame(rows, "ts timestamp_ntz")
    kept_t = dft.filter(
        F.col("ts") >= event_ts_bound(lo_sec, ts_dtype(dft))
    ).count()
    expected = sum(1 for n, _ in CASES if n >= lo_sec * SEC)
    assert kept_l == kept_t == expected
