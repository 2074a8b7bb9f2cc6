"""Property tests (hypothesis) for the pure-Python kernels — the pieces
whose failure mode is a crashed executor stage, not a wrong number.
Spark stays out of the example loop; the Spark-side behavior of each is
pinned by the unit/oracle tests."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from timesearch_spark.functions.markdown_lite import render
from timesearch_spark.operators.similarity import hyperplanes, pack_signatures
from timesearch_spark.sources.adapters import ndjson_fetch_page
from timesearch_spark.sources.paginated import paginate


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_markdown_render_is_total(text):
    """render() must never raise and always return a string for ANY text —
    one poison document must not kill a 100 TB render stage (the r4 NUL
    placeholder collision was exactly this class of bug)."""
    out = render(text)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="`\n\x00*#> -[]()0123456789a", max_size=200),
)
def test_markdown_render_total_on_fence_like_text(text):
    """Adversarial alphabet: fence markers, placeholders, list/heading
    syntax, NULs — the constructs the block parser dispatches on."""
    assert isinstance(render(text), str)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 10**6)),
        min_size=0, max_size=60, unique_by=lambda t: t[1],
    ),
    st.integers(0, 5),
)
def test_paginate_over_ndjson_adapter_yields_each_id_once(tmp_path_factory, items, extra):
    """End-to-end keyset property: whenever no single second holds a full
    page (the protocol's documented limit — a same-second burst >=
    page_size stops the reference's subset check too, pushshift.py:
    143-145), the paginate+adapter pipeline yields every id EXACTLY once:
    the 1-second overlap refetches boundary items, the dedup drops them,
    and nothing on a page boundary is lost or doubled."""
    tmp = tmp_path_factory.mktemp("pg")
    objs = [
        {"id": f"x{uniq}", "created_utc": ts + 1} for ts, uniq in items
    ]
    p = tmp / "a.jsonl"
    p.write_text("\n".join(json.dumps(o) for o in objs) + "\n")
    burst = max(
        [sum(1 for o in objs if o["created_utc"] == t)
         for t in {o["created_utc"] for o in objs}] or [0]
    )
    page_size = burst + 1 + extra

    fetch = ndjson_fetch_page(str(p))
    seen = [it["id"] for page in paginate(fetch, lower=0, page_size=page_size)
            for it in page]
    assert len(seen) == len(set(seen))  # overlap refetches never double
    assert sorted(seen) == sorted(o["id"] for o in objs)  # nothing lost


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**32), st.integers(1, 8), st.integers(1, 8), st.integers(2, 32))
def test_pack_signatures_deterministic_and_bounded(seed, tables, bits, dim):
    """Signatures are a pure function of (vectors, planes): replayable
    across processes, every value within [0, 2^bits)."""
    import numpy as np

    planes = hyperplanes(dim, bits, tables, seed)
    rng_v = np.array(
        [[((seed + i * 31 + j * 7) % 97) / 48.5 - 1.0 for j in range(dim)]
         for i in range(5)]
    )
    s1 = pack_signatures(rng_v, planes)
    s2 = pack_signatures(rng_v.copy(), planes)
    assert (s1 == s2).all()
    assert s1.shape == (5, tables)
    assert (s1 >= 0).all() and (s1 < (1 << bits)).all()
