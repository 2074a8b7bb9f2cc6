"""Quiet-gated A/B timing harness (r15 optimization round).

Usage: python tools/ab_quiet.py QUERY [REPS] [GATE]

Runs QUERY through the noop sink REPS times (default 5), each run
gated on 1-min loadavg < GATE (default 4.0, max wait 180 s per run),
and prints each sample plus min/median.  Samples taken above the gate
are flagged.  Compare two code states by running this before/after.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from timesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("ab-quiet")
    import __spark_entry__ as m
    from timesearch_spark.operators.dedup import release_pins

    qs = m.queries()

    def run(qname: str) -> float:
        t0 = time.time()
        df = qs[qname](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_pins(df)
        return time.time() - t0

    def steal_ticks() -> int:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])

    run("count_max")  # warmup
    samples = []
    for i in range(reps):
        waited = 0.0
        while os.getloadavg()[0] >= gate and waited < 180:
            time.sleep(10)
            waited += 10
        l0 = os.getloadavg()[0]
        s0 = steal_ticks()
        dt = run(name)
        # steal during the run, as fraction of our 32-core tick budget
        sfrac = (steal_ticks() - s0) / 100.0 / max(dt, 0.01) / (
            os.cpu_count() or 1)
        flag = "" if l0 < gate and sfrac < 0.05 else "  NOISY"
        samples.append((dt, l0, sfrac))
        print(f"{name} run {i}: {dt:7.2f}s  load@start {l0:5.2f}  "
              f"steal {sfrac * 100:5.1f}%{flag}", flush=True)
    vals = [s[0] for s in samples]
    clean = [s[0] for s in samples if s[1] < gate and s[2] < 0.05]
    print(f"{name}: min {min(vals):.2f}  median {statistics.median(vals):.2f}"
          f"  clean-min {min(clean) if clean else float('nan'):.2f}"
          f"  ({len(clean)}/{len(vals)} clean)")


if __name__ == "__main__":
    main()
