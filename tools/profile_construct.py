"""Split each headline query's wall time into CONSTRUCTION (the
``queries()[name](spark, sf_dir)`` call — DataFrame building, analysis,
py4j chatter, any eager model/probe jobs) and ACTION (the noop write).

The bench times both together, so a query whose construction dominates
is paying driver-side plan-building cost, not distributed compute —
a different fix path (fewer py4j round trips / plan reuse) than the
usual shuffle work.

Usage: python tools/profile_construct.py [REPS] [QUERY ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from timesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-construct")
    import __spark_entry__ as m
    from timesearch_spark.operators.dedup import release_pins

    qs = m.queries()
    # warmup
    df = qs["count_max"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()

    rows = []
    for name in names:
        if name not in qs:
            continue
        best_c = best_a = None
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            release_pins(df)
            c, a = t1 - t0, t2 - t1
            if best_c is None or c + a < best_c + best_a:
                best_c, best_a = c, a
        rows.append((name, best_c, best_a))
        print(f"{name:28s} construct={best_c:6.2f}s action={best_a:6.2f}s",
              flush=True)
    tot_c = sum(r[1] for r in rows)
    tot_a = sum(r[2] for r in rows)
    print(f"{'TOTAL':28s} construct={tot_c:6.2f}s action={tot_a:6.2f}s")


if __name__ == "__main__":
    main()
