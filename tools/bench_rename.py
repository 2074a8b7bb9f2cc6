"""Rename-pass timing for the staged thread-docs sink (SCALING_r09;
ported to write_thread_docs when the legacy flat-html sink retired).

``python tools/bench_rename.py [N_THREADS]`` (default 2000) writes N
one-doc threads through ``write_thread_docs`` on a file:// root
three times, isolating the rename PASS from the staged text write by
timing the pass functions directly:

  1. distributed  — mapInPandas + pyarrow.fs (the default arm)
  2. pool16       — driver ThreadPoolExecutor over the Hadoop FS shim
                    (the fallback arm for schemes pyarrow lacks)
  3. serial       — one thread, the r8 shape the distributed pass
                    replaced (kept here purely as the baseline)

Reference measurement (round 9, loadavg ~1.3, N=2000): 3.5 s / 20.8 s /
21.4 s — py4j round trips dominate both driver arms (~3 gateway hops
per thread through one connection-per-thread gateway), which is why the
fix is executor-side pyarrow rather than a bigger driver pool.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from timesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("bench-rename")
    from timesearch_spark.operators import exports

    # (submission, doc) — docs end in the default line_sep '\n' per the
    # write_thread_docs staged-arm contract
    rendered = spark.range(n).select(
        F.concat(F.lit("t3_"), F.col("id").cast("string")).alias("submission"),
        F.concat(F.lit("<div>doc "), F.col("id").cast("string"),
                 F.lit("</div>\n")).alias("doc"),
    )
    base = tempfile.mkdtemp(prefix="bench_rename_")
    timings: dict[str, float] = {}
    real_dist = exports._rename_pass_distributed
    real_pool = exports._rename_pass_driver_pool
    real_open = exports._open_fs

    def timed(tag, fn):
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            timings[tag] = round(time.time() - t0, 2)
            return out
        return wrap

    try:
        exports._rename_pass_distributed = timed("distributed", real_dist)
        assert exports.write_thread_docs(rendered, f"file://{base}/dist") == n
        exports._rename_pass_distributed = real_dist

        def no_open(uri):
            raise RuntimeError("forced driver-pool arm")

        exports._open_fs = no_open
        exports._rename_pass_driver_pool = timed("pool16", real_pool)
        assert exports.write_thread_docs(rendered, f"file://{base}/pool") == n

        def serial(fs, staging, out_dir, entries):
            return sum(
                exports._finalize_one(
                    fs.ls, fs.rename, fs.delete, fs.exists, staging,
                    out_dir, e
                )
                for e in entries
            )

        exports._rename_pass_driver_pool = timed("serial", serial)
        assert exports.write_thread_docs(
            rendered, f"file://{base}/serial"
        ) == n
    finally:
        exports._rename_pass_distributed = real_dist
        exports._rename_pass_driver_pool = real_pool
        exports._open_fs = real_open
        shutil.rmtree(base, ignore_errors=True)

    import json

    print(json.dumps({
        "metric": "rename_pass_sec", "threads": n, "timings": timings,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
