"""Rounding-margin probe for the per-engine-transcendental oracles.

Three promoted oracles derive one output column through a function both
engines evaluate independently (JVM Math.exp/log vs C libm — documented
1-ulp risk next to each):

- ``text_lm_ppl`` / ``text_lm_ppl_bigram``: ppl = round(exp(-avg9), 6),
  where avg9 is the cross-engine-pinned 9-dp mean log-prob;
- ``pipeline_dsir``: key = round(logw + -ln(-ln(u)), 9), where logw is
  pinned and u is the md5-derived Gumbel uniform;
- ``text_clf_score`` (r15): score = round(sigmoid(z9), 6), where z9 is
  the cross-engine-pinned 9-dp logit.

A hash mismatch needs the function value to sit within ~1 ulp of a
rounding midpoint (.5·10⁻⁶ / .5·10⁻⁹).  This probe measures, for every
row at a given sf dir, the distance from the libm-evaluated value to
its nearest midpoint IN ULPS OF THE VALUE, and prints the minima — the
quantitative form of the zero-mismatch evidence.  Margins in the
thousands of ulps mean a future flip requires a data change, not an
engine update; re-run on data changes (the ADVICE instruction that
kept tools/proto_lm_oracle.py around, generalized).

``python tools/ulp_margin.py [SF_DIR]`` (default /root/testdata/sf0.1).
No Spark needed: the pinned inputs are recomputed with the DuckDB
oracle SQL (same libm as python's math module on this box).
"""
from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

TABLES = ("documents",)


def midpoint_margin_ulps(x: float, scale: float) -> float:
    """Distance from x to the nearest round-half midpoint of the given
    decimal scale (e.g. 1e-6), measured in ulps of x."""
    if x == 0 or not math.isfinite(x):
        return float("inf")
    f = x / scale
    d = abs(abs(f - math.floor(f)) - 0.5) * scale
    return d / math.ulp(x)


def margins(sf_dir: str) -> dict[str, list[float]]:
    """name → sorted midpoint margins (ulps) for every transcendental
    oracle, recomputed from the registered oracle SQL at ``sf_dir``.
    Importable so tests/test_ulp_margins.py can pin a floor (VERDICT
    r14 #6) — a data/seed change that collapses a margin fails CI
    before the driver sees a hash flip."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    import timesearch_spark.queries as Q

    out = {}

    # --- LM families: ppl = round(exp(-avg_logp), 6) ------------------
    for name in ("text_lm_ppl", "text_lm_ppl_bigram"):
        rows = con.execute(Q.ORACLE[name]).fetchall()
        cols = [d[0] for d in con.description]
        ai = cols.index("avg_logp")
        margins = sorted(
            midpoint_margin_ulps(math.exp(-r[ai]), 1e-6)
            for r in rows if r[ai] is not None
        )
        out[name] = margins

    # --- DSIR: key = round(logw + gumbel(doc_id), 9) ------------------
    rows = con.execute(Q.ORACLE["pipeline_dsir"]).fetchall()
    cols = [d[0] for d in con.description]
    di, li = cols.index("doc_id"), cols.index("logw")
    margins = []
    for r in rows:
        h = int(hashlib.md5(f"dsir:{r[di]}".encode()).hexdigest()[:15], 16)
        u = (float(h) + 0.5) / float(1 << 60)
        margins.append(
            midpoint_margin_ulps(r[li] + -math.log(-math.log(u)), 1e-9))
    out["pipeline_dsir"] = sorted(margins)

    # --- clf scoring: score = round(1/(1+exp(-z9)), 6) ----------------
    rows = con.execute(Q.ORACLE["text_clf_score"]).fetchall()
    cols = [d[0] for d in con.description]
    zi = cols.index("z")
    out["text_clf_score"] = sorted(
        midpoint_margin_ulps(1.0 / (1.0 + math.exp(-r[zi])), 1e-6)
        for r in rows if r[zi] is not None
    )
    return out


def main() -> None:
    out = margins(SF)
    worst = float("inf")
    for name, ms in out.items():
        lo = ms[:3]
        print(f"{name}: n={len(ms)} min_margins_ulps={[round(m, 1) for m in lo]}")
        worst = min(worst, ms[0] if ms else float("inf"))
    print(f"worst margin: {worst:.1f} ulps "
          f"({'SAFE' if worst > 16 else 'REVIEW — near a midpoint'})")


if __name__ == "__main__":
    main()
