"""Pinned rounding-margin floors for the transcendental oracles
(VERDICT r14 #6): the ulp margins are the quantitative guarantee that a
1-ulp JVM-vs-libm disagreement in exp() cannot flip a graded 6-dp/9-dp
value — so a data/seed change that collapses a margin must fail HERE,
before the driver sees a hash flip.  Recomputes the minima at sf0.01
with tools/ulp_margin.margins (DuckDB only, no Spark session)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.conftest import SF_ORACLE  # noqa: E402

#: Minimum acceptable distance (in ulps of the value) from any graded
#: transcendental output to its nearest rounding midpoint.  The r14
#: measured minima were 30,281 / 6,932 / 3,965 at sf0.1; 100 keeps two
#: orders of magnitude of air over the 1-ulp engine risk while leaving
#: room for ordinary data growth.
FLOOR_ULPS = 100.0


def test_transcendental_oracle_margins_hold():
    import ulp_margin

    out = ulp_margin.margins(SF_ORACLE)
    assert set(out) >= {"text_lm_ppl", "text_lm_ppl_bigram",
                        "pipeline_dsir", "text_clf_score"}
    bad = {name: ms[0] for name, ms in out.items()
           if ms and ms[0] <= FLOOR_ULPS}
    assert not bad, (
        f"transcendental margin collapsed below {FLOOR_ULPS} ulps: {bad} "
        "— a 1-ulp exp()/log() engine disagreement could now flip a "
        "graded rounding; re-derive the pinned column or raise its "
        "rounding scale before the driver sees a hash mismatch"
    )
    assert all(ms for ms in out.values())  # every family measured rows
