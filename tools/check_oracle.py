"""Local stand-in for the driver's t2 check: run every queries()[name]
via Spark and oracle_sql()[name] via DuckDB on the same parquet dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from timesearch_spark.session import get_spark
from timesearch_spark.tables import TABLE_NAMES


def norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 6))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)


def _register(con, sf_dir):
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def paranoid(sf_dir: str, only: set[str]) -> int:
    """Oracle-hygiene sweep (no Spark): run every oracle under DuckDB at
    several thread counts and fail on ANY canonical-hash drift.  An
    oracle whose result depends on execution parallelism (unordered
    window ties, float-sum reassociation, double→decimal rounding at
    partial-agg boundaries) is an environment bomb waiting for the
    grading driver — exactly how r4's events_windows/sessionize failed
    while passing every single-config local check."""
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    failures = []
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        seen = {}
        try:
            for threads in (1, 4, 8):
                con = duckdb.connect()
                con.execute(f"SET threads TO {threads}")
                _register(con, sf_dir)
                res = con.execute(sql)
                cols = [d[0] for d in res.description]
                seen[threads] = canon(res.fetchall(), cols)
                con.close()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        hashes = {t: hash(tuple(c)) for t, c in seen.items()}
        if len(set(hashes.values())) != 1:
            failures.append(name)
            print(f"FAIL {name}: thread-count drift {hashes}")
        else:
            print(f"PASS {name} (stable at 1/4/8 threads, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


def main():
    args = [a for a in sys.argv[1:] if a != "--paranoid"]
    if "--paranoid" in sys.argv[1:]:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        sys.exit(paranoid(sf_dir, set(args[1:])))
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    _register(con, sf_dir)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sc, oc = canon(srows, scols), canon(orows, ocols)
            if sc != oc:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sc, oc)) if a != b), None
                )
                problems.append(
                    f"values differ (first at sorted-row {diff}):\n"
                    f"    spark : {sc[diff][:300] if diff is not None else ''}\n"
                    f"    oracle: {oc[diff][:300] if diff is not None else ''}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
