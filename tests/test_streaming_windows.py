"""Streaming window/dedup tests: file source → availableNow → memory sink."""

from __future__ import annotations

import json

from timesearch_spark.streaming import windows as sw

SCHEMA = "idstr string, author string, event_type string, created long"


def _stream(spark, tmp_path, rows, name):
    d = tmp_path / name
    d.mkdir()
    (d / "part1.jsonl").write_text(
        "\n".join(
            json.dumps(dict(zip(("idstr", "author", "event_type", "created"), r)))
            for r in rows
        )
    )
    return spark.readStream.schema(SCHEMA).json(str(d))


def _run(spark, df, sink_name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete" if df.isStreaming else "append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink_name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {sink_name}")


HOUR = 3600


def test_tumbling_stream_counts(spark, tmp_path):
    rows = [
        ("t1_a", "u1", "click", 0),
        ("t1_b", "u1", "click", 100),
        ("t1_c", "u2", "view", 200),
        ("t1_d", "u1", "click", HOUR + 5),
    ]
    out = _run(
        spark,
        sw.tumbling_counts_stream(_stream(spark, tmp_path, rows, "in1"), "1 hour"),
        "tumb", tmp_path,
    ).collect()
    got = {(r["window_start"].hour, r["event_type"]): r["n"] for r in out}
    assert got[(0, "click")] == 2 and got[(0, "view")] == 1 and got[(1, "click")] == 1


def test_session_stream_gap_split(spark, tmp_path):
    rows = [
        ("t1_a", "u1", "e", 0),
        ("t1_b", "u1", "e", 600),        # same session (gap 30 min)
        ("t1_c", "u1", "e", 600 + 3600), # new session
        ("t1_d", "u2", "e", 50),
    ]
    out = _run(
        spark,
        sw.session_counts_stream(
            _stream(spark, tmp_path, rows, "in2"), gap="30 minutes", key="author"
        ),
        "sess", tmp_path,
    ).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["author"], []).append(r["n_events"])
    assert sorted(per_user["u1"]) == [1, 2]
    assert per_user["u2"] == [1]


def test_dedup_stream_exactly_once_per_key(spark, tmp_path):
    rows = [
        ("t1_a", "u1", "e", 10),
        ("t1_a", "u1", "e", 10),   # overlap re-read duplicate (I2)
        ("t1_b", "u2", "e", 20),
    ]
    df = sw.dedup_stream(_stream(spark, tmp_path, rows, "in3"))
    q = (
        df.writeStream.format("memory").queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT idstr FROM dedup").collect()
    assert sorted(r["idstr"] for r in out) == ["t1_a", "t1_b"]
