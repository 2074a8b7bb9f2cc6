"""Dump `.explain("formatted")` for named headline queries to
plans/r16/<query>_<tag>.txt — the optimization round's plan evidence.

Usage: python tools/explain_r16.py TAG [QUERY ...]
  TAG   = "before" / "after"
  QUERY = subset (default: every bench headliner)

The formatted explain is captured AFTER executing the query's own
QueryExecution (noop-equivalent count over the executed plan) so AQE
finalizes and the file shows the runtime join strategy / AQEShuffleRead
nodes the bench actually ran, plus the static initial plan on top.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from timesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("explain-r16")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from timesearch_spark.operators.dedup import release_pins

    for name in names:
        if name not in qs:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        qe = df._jdf.queryExecution()
        qe.executedPlan().execute().count()  # finalize AQE on THIS QE
        fmt = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(fmt)
        release_pins(df)
        print(f"wrote {path} ({len(fmt)} bytes)")


if __name__ == "__main__":
    main()
