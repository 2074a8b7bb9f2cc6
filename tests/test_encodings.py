"""Event-time encoding matrix: the driver's events.parquet has shipped
as timestamp[us] (NTZ), TIMESTAMP(NANOS), and could ship tz-aware — the
event-time queries must hash-match their DuckDB oracles under ALL of
them (r4's only red rows were an encoding/engine sensitivity here)."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
QUERIES = ("events_windows", "sessionize")


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 6))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)


def _variant_dir(tmp_path, arrow_type):
    dst = tmp_path / f"sf_{str(arrow_type).replace('[','_').replace(']','').replace(', ','_')}"
    dst.mkdir()
    for f in os.listdir(SF):
        s, d = os.path.join(SF, f), str(dst / f)
        if f == "events.parquet":
            t = pq.read_table(s)
            ts = t.column("ts").cast(arrow_type)
            pq.write_table(
                t.set_column(t.schema.get_field_index("ts"), "ts", ts), d
            )
        else:
            os.symlink(s, d)
    return str(dst)


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("us"), pa.timestamp("ns"), pa.timestamp("us", tz="UTC")],
    ids=["ntz-micros", "nanos", "ltz-micros"],
)
def test_event_queries_hash_match_under_every_encoding(spark, tmp_path, arrow_type):
    import duckdb

    import timesearch_spark.queries as Q

    sf_dir = _variant_dir(tmp_path, arrow_type)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    for name in QUERIES:
        sdf = Q.QUERIES[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(Q.ORACLE[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        assert sorted(scols) == sorted(ocols), name
        assert len(srows) == len(orows), name
        assert _canon(srows, scols) == _canon(orows, ocols), (name, arrow_type)
