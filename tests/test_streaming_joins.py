"""Streaming joins (streaming/joins.py): file source → availableNow →
memory sink, pairs checked against the hand-computed horizon set."""

from __future__ import annotations

import json

import pytest

from timesearch_spark.streaming import joins as sj

SCHEMA = "idstr string, user string, created long"


def _stream(spark, tmp_path, rows, name):
    d = tmp_path / name
    d.mkdir()
    (d / "p.jsonl").write_text(
        "\n".join(
            json.dumps(dict(zip(("idstr", "user", "created"), r)))
            for r in rows
        )
    )
    return spark.readStream.schema(SCHEMA).json(str(d))


def _run(spark, df, sink, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {sink}")


def test_attribution_pairs_within_horizon(spark, tmp_path):
    purchases = [
        ("p1", "u1", 1000),
        ("p2", "u1", 5000),
        ("p3", "u2", 2000),
        ("p4", "u3", 9000),
    ]
    clicks = [
        ("c1", "u1", 500),    # within 1h of p1 and p2? p2-500=4500 > 3600 → only p1
        ("c2", "u1", 4000),   # within p2 (1000s before)
        ("c3", "u2", 2500),   # AFTER p3 → no match
        ("c4", "u3", 9000),   # exactly at p4 → inclusive match
        ("c5", "u9", 100),    # unmatched user
    ]
    ps = _stream(spark, tmp_path, purchases, "ps").withColumnRenamed("idstr", "pid")
    cs = _stream(spark, tmp_path, clicks, "cs").withColumnRenamed("idstr", "cid")
    out = sj.attribution_join_stream(
        ps, cs, on="user", horizon_sec=3600,
        left_cols=["pid"], right_cols=["cid"],
    )
    rows = _run(spark, out, "attr", tmp_path).collect()
    got = sorted((r["pid"], r["cid"]) for r in rows)
    assert got == [("p1", "c1"), ("p2", "c2"), ("p4", "c4")]
    # epoch-seconds round-trip survives the timestamp conversion
    by_pid = {r["pid"]: r for r in rows}
    assert by_pid["p1"]["left_created"] == 1000
    assert by_pid["p1"]["right_created"] == 500


def test_attribution_rejects_payload_clash(spark, tmp_path):
    s = _stream(spark, tmp_path, [("a", "u", 1)], "clash")
    with pytest.raises(ValueError, match="collide"):
        sj.attribution_join_stream(s, s, on="user")


def test_enrich_stream_joins_current_dim(spark, tmp_path):
    events = [("e1", "u1", 100), ("e2", "u2", 200), ("e3", "u9", 300)]
    es = _stream(spark, tmp_path, events, "es")
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "trial")], "user string, tier string"
    )
    out = sj.enrich_stream(es, dim, on=["user"])
    rows = _run(spark, out, "enr", tmp_path).collect()
    got = {r["idstr"]: r["tier"] for r in rows}
    assert got == {"e1": "gold", "e2": "trial", "e3": None}
    with pytest.raises(ValueError, match="unsupported"):
        sj.enrich_stream(es, dim, on=["user"], how="full")
