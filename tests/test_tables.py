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


# --- spread() metadata heuristics ------------------------------------------


def test_scan_parallelism_reads_footers_without_raising(tmp_path):
    """r4 regression: _scan_parallelism unpacked 2 values from
    _file_meta's 3-tuples, so it ALWAYS raised ValueError and spread()'s
    fallback round-robin-shuffled every under-filed input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from timesearch_spark.tables import _scan_parallelism

    p = str(tmp_path / "multi.parquet")
    pq.write_table(pa.table({"x": list(range(1000))}), p, row_group_size=100)
    eff = _scan_parallelism([p], 4)
    assert eff >= 1  # 10 row groups, but a tiny file never byte-splits


def test_spread_noop_when_scan_splits_enough(spark):
    """A big multi-row-group file whose scan already yields >= want tasks
    must NOT be repartitioned (the 100 TB case: file-backed input is
    plenty parallel and spread is a pure metadata check)."""
    from timesearch_spark import tables

    d = tables.load(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    files = d.inputFiles()
    # fake footer metadata: 64 row groups / 1 GiB / 10M rows per file —
    # Spark's split formula gives min(64, ceil(1GiB/32MiB)) = 32 tasks
    saved = {f: tables._FILE_META.get(f) for f in files}
    for f in files:
        tables._FILE_META[f] = (64, 1 << 30, 10_000_000)
    try:
        assert tables.spread(d, min_parts=32) is d
    finally:
        for f, v in saved.items():
            if v is None:
                tables._FILE_META.pop(f, None)
            else:
                tables._FILE_META[f] = v


def test_spread_recognizes_keyed_repartition(spark):
    """df.repartition(64, key) prints 'RepartitionByExpression [key#N], 64'
    — the partition count is the LAST integer; r4's lazy regex grabbed the
    expression id and stacked a round-robin shuffle on top, destroying the
    keyed partitioning."""
    from timesearch_spark import tables

    d = tables.load(spark, "/root/testdata/sf0.001", "documents").repartition(
        64, "doc_id"
    )
    assert tables.spread(d, min_parts=32) is d


def test_spread_treats_sort_within_partitions_as_non_shuffle(spark):
    """sortWithinPartitions introduces no Exchange ('Sort ..., false'), so
    an under-split scan below it still needs the spread repartition."""
    from timesearch_spark import tables

    d = tables.load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id"
    ).sortWithinPartitions("doc_id")
    assert tables.spread(d, min_parts=32) is not d


def test_footer_bounds_reject_sample_with_replacement(spark, tmp_path):
    """ADVICE r8: sample(withReplacement=True) draws Poisson counts per
    row (fraction may exceed 1), so it can emit MORE rows than the scan
    — the footer ceiling must refuse it while plain sampling passes."""
    from timesearch_spark.tables import row_count_bound

    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr("id", "repeat('x', 10) AS text") \
        .write.parquet(p)
    d = spark.read.parquet(p)
    assert row_count_bound(d) == 100
    assert row_count_bound(d.sample(False, 0.5, seed=1)) == 100
    assert row_count_bound(d.sample(True, 2.0, seed=1)) is None


def test_byte_size_bound_rejects_value_synthesizing_plans(spark, tmp_path):
    """ADVICE r8: a Project/Aggregate/Window that synthesizes values
    (concat(text, text), collect_list) keeps row counts but can exceed
    the footers' byte totals — the BYTE ceiling must return None for
    those while attribute-only shapes keep it."""
    import pyspark.sql.functions as F  # noqa: F811

    from timesearch_spark.tables import byte_size_bound

    p = str(tmp_path / "b.parquet")
    spark.range(100).selectExpr(
        "id", "repeat('x', 10) AS text", "id % 3 AS g"
    ).write.parquet(p)
    d = spark.read.parquet(p)
    bb = byte_size_bound(d)
    assert bb is not None and bb > 0
    # attribute-only projection and filter keep the ceiling
    assert byte_size_bound(d.select("id", "text")) == bb
    assert byte_size_bound(d.filter(F.col("id") > 10)) == bb
    # value synthesis voids it
    assert byte_size_bound(
        d.select(F.concat("text", "text").alias("t"))
    ) is None
    assert byte_size_bound(
        d.groupBy("g").agg(F.collect_list("text").alias("xs"))
    ) is None


def test_row_count_exact_only_for_row_preserving_plans(spark, tmp_path):
    """row_count_exact: exact from footers for projection/sort-only
    plans, None the moment a row-SHRINKING node (filter/limit/sample)
    appears — a mere ceiling must never drive gates whose big branch
    changes semantics."""
    import pyspark.sql.functions as F  # noqa: F811

    from timesearch_spark.tables import row_count_exact

    p = str(tmp_path / "e.parquet")
    spark.range(123).selectExpr("id", "id * 2 AS v").write.parquet(p)
    d = spark.read.parquet(p)
    assert row_count_exact(d) == 123
    assert row_count_exact(d.select("id")) == 123
    assert row_count_exact(d.orderBy("v")) == 123
    assert row_count_exact(d.filter(F.col("id") > 5)) is None
    assert row_count_exact(d.limit(5)) is None
    assert row_count_exact(d.sample(False, 0.5, seed=1)) is None
