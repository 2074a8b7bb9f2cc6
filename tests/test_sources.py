"""NDJSON ingest + paginated source tests (SURVEY §2 A3-A5, I5/I6)."""

from __future__ import annotations

import json

from timesearch_spark.sources import ndjson, paginated


def _write_ndjson(tmp_path, objs, name="archive.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(o) for o in objs) + "\n")
    return str(p)


SUB = {
    "id": "abc",
    "name": "t3_abc",
    "created_utc": 1000,
    "author": "alice",
    "subreddit": "test",
    "title": "hi <b>",
    "selftext": "body &amp; more",
    "score": 10,
    "is_self": False,
    "over_18": False,
    "url": "/r/test/comments/abc",
    "num_comments": 2,
}
COM = {
    "id": "def",
    "name": "t1_def",
    "created_utc": 1001,
    "author": None,
    "subreddit": "test",
    "body": "reply &lt;3",
    "score": 5,
    "parent_id": "t3_abc",
    "link_id": "t3_abc",
}
UNTYPED = {"id": "zzz", "created_utc": 1002}


def test_classify_discriminators(spark, tmp_path):
    path = _write_ndjson(tmp_path, [SUB, COM, UNTYPED])
    raw = ndjson.read_raw(spark, path)
    kinds = {r["id"]: r["kind"] for r in ndjson.classify(raw).collect()}
    assert kinds == {"abc": "submission", "def": "comment", "zzz": None}


def test_classify_by_structure_without_name(spark, tmp_path):
    # over_18 alone marks a submission; parent_id alone a comment
    # (ingest_jsonfile.py:12-23).
    objs = [
        {"id": "s1", "created_utc": 1, "over_18": True},
        {"id": "c1", "created_utc": 2, "parent_id": "t3_s1"},
    ]
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, objs))
    kinds = {r["id"]: r["kind"] for r in ndjson.classify(raw).collect()}
    assert kinds == {"s1": "submission", "c1": "comment"}


def test_classify_requires_t3_prefix_on_parent_and_link(spark, tmp_path):
    """r10 parity fix: the reference tests parent_id/link_id for the
    't3_' PREFIX (ingest_jsonfile.py:19-23) — a present-but-wrong-kind
    id is an object it rejects, so it must stay unclassifiable here
    (kind null), never silently ingested as a comment."""
    objs = [
        {"id": "x1", "created_utc": 1, "parent_id": "t5_weird"},
        {"id": "x2", "created_utc": 2, "link_id": "t1_notathread"},
        {"id": "ok", "created_utc": 3, "parent_id": "t1_nested",
         "link_id": "t3_thread"},  # nested comment: link_id carries t3_
    ]
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, objs))
    kinds = {r["id"]: r["kind"] for r in ndjson.classify(raw).collect()}
    assert kinds == {"x1": None, "x2": None, "ok": "comment"}


def test_submission_canonicalization(spark, tmp_path):
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, [SUB, COM]))
    row = ndjson.submissions_from_raw(raw).first()
    assert row["idstr"] == "t3_abc"
    assert row["idint"] == int("abc", 36)          # base36 (common.py:43-65)
    assert row["url"] == "https://reddit.com/r/test/comments/abc"  # tsdb.py:399-409
    assert row["selftext"] == "body & more"        # html unescape (pushshift.py:72-73)
    assert row["textlen"] == len("body & more")    # tsdb.py:424
    assert row["author"] == "alice"


def test_comment_canonicalization_deleted_sentinel(spark, tmp_path):
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, [SUB, COM]))
    row = ndjson.comments_from_raw(raw).first()
    assert row["idstr"] == "t1_def"
    assert row["author"] == "[DELETED]"            # tsdb.py:394-397
    assert row["body"] == "reply <3"
    assert row["parent"] == "t3_abc" and row["submission"] == "t3_abc"


def test_self_post_url_nulled(spark, tmp_path):
    sub = dict(SUB, is_self=True)
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, [sub]))
    assert ndjson.submissions_from_raw(raw).first()["url"] is None


def test_edited_false_vs_ts(spark, tmp_path):
    subs = [
        dict(SUB, id="a1", name="t3_a1", edited="false"),
        dict(SUB, id="a2", name="t3_a2", edited="1234.0"),
    ]
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, subs))
    rows = {r["idstr"]: r["edited"] for r in ndjson.submissions_from_raw(raw).collect()}
    assert rows == {"t3_a1": None, "t3_a2": 1234}  # int truncation (tsdb.py:374-377)


# --- paginated source --------------------------------------------------------

def _make_items(lo, hi):
    return [{"id": f"i{t}", "created_utc": t} for t in range(lo, hi)]


def test_pushshift_fallback_attributes(spark, tmp_path):
    """Pushshift omits null attributes; the reference fills them back in
    before insert (pushshift.py:34-41 FALLBACK_ATTRIBUTES in
    DummyObject.__init__): absent selftext -> '' (textlen 0), absent
    score -> 0 — on both kinds."""
    sub = {"id": "x1", "name": "t3_x1", "created_utc": 1, "author": "a",
           "subreddit": "t", "title": "bare", "is_self": True,
           "over_18": False}
    com = {"id": "y1", "name": "t1_y1", "created_utc": 2, "author": "b",
           "subreddit": "t", "body": "hi", "parent_id": "t3_x1",
           "link_id": "t3_x1"}
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, [sub, com]))
    s = ndjson.submissions_from_raw(raw).first()
    assert s["selftext"] == "" and s["textlen"] == 0 and s["score"] == 0
    c = ndjson.comments_from_raw(raw).first()
    assert c["score"] == 0


def test_comment_parent_normalization(spark, tmp_path):
    """DummyObject.__init__ (pushshift.py:74-78): a missing parent_id
    falls back to the link_id (top-level comment) and a pushshift
    integer parent id becomes its t1_ base36 fullname."""
    coms = [
        {"id": "p1", "name": "t1_p1", "created_utc": 1, "author": "a",
         "subreddit": "t", "body": "x", "score": 1,
         "parent_id": None, "link_id": "t3_abc"},
        {"id": "p2", "name": "t1_p2", "created_utc": 2, "author": "a",
         "subreddit": "t", "body": "x", "score": 1,
         "parent_id": 12345, "link_id": "t3_abc"},
    ]
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, coms))
    rows = {r["idstr"]: r["parent"]
            for r in ndjson.comments_from_raw(raw).collect()}
    assert rows["t1_p1"] == "t3_abc"          # None -> link_id
    assert rows["t1_p2"] == "t1_" + "9ix"     # int(12345) -> base36 fullname


def test_parent_digit_string_ambiguity_pinned(spark, tmp_path):
    """KNOWN AMBIGUITY pin (ndjson.comments_from_raw docstring): the
    reference converts only JSON ints (isinstance(val, int),
    pushshift.py:76-78) and would keep a bare all-digit STRING parent id
    verbatim; schema-on-read erases the quoting, so this engine
    re-encodes both forms identically.  This test pins the accepted
    divergence so any future raw-schema change that CAN distinguish the
    forms must revisit it deliberately."""
    coms = [
        {"id": "q1", "name": "t1_q1", "created_utc": 1, "author": "a",
         "subreddit": "t", "body": "x", "score": 1,
         "parent_id": 12345, "link_id": "t3_abc"},       # JSON int
        {"id": "q2", "name": "t1_q2", "created_utc": 2, "author": "a",
         "subreddit": "t", "body": "x", "score": 1,
         "parent_id": "12345", "link_id": "t3_abc"},     # digit STRING
    ]
    raw = ndjson.read_raw(spark, _write_ndjson(tmp_path, coms))
    rows = {r["idstr"]: r["parent"]
            for r in ndjson.comments_from_raw(raw).collect()}
    # both collapse to the int form's fullname (reference would keep
    # "12345" for q2) — accepted: real dumps never carry digit strings
    assert rows["t1_q1"] == rows["t1_q2"] == "t1_9ix"


def test_read_raw_file_tab_only_line_is_eof(spark, tmp_path):
    """line.strip() in the reference treats a TAB-only line as blank
    (ingest_jsonfile.py:31-32); F.trim strips only ASCII spaces, so the
    blank test must be the \\s regex.  Also exercises the
    (input_file_block_start, record-number) position key."""
    p = tmp_path / "tab_eof.jsonl"
    p.write_text(json.dumps(SUB) + "\n\t\n" + json.dumps(COM) + "\n")
    raw = ndjson.read_raw_file(spark, str(p))
    assert ndjson.submissions_from_raw(raw).count() == 1
    assert ndjson.comments_from_raw(raw).count() == 0  # past the tab line


def test_paginate_keyset_overlap_dedup():
    data = _make_items(0, 2500)

    calls = []

    def fetch(after, before, limit):
        calls.append(after)
        page = [d for d in data if d["created_utc"] >= after][:limit]
        return page

    pages = list(paginated.paginate(fetch, lower=0, page_size=1000))
    ids = [i["id"] for p in pages for i in p]
    # every item exactly once despite the 1-second overlap re-fetch
    assert len(ids) == 2500 and len(set(ids)) == 2500
    # keyset stepped with -1 overlap (pushshift.py:138-142)
    assert calls[1] == 998


def test_paginate_stops_on_subset():
    # a stuck source returning the same page forever must terminate
    page = _make_items(0, 5)

    def fetch(after, before, limit):
        return page

    pages = list(paginated.paginate(fetch, page_size=1000))
    assert len(pages) == 1  # second fetch is a subset -> stop


def test_rate_limiter_waits():
    t = [0.0]
    waits = []
    limiter = paginated.RateLimiter(
        allowance=2, period=1.0, clock=lambda: t[0], sleep=lambda s: waits.append(s)
    )
    limiter.acquire()
    limiter.acquire()
    limiter.acquire()  # bucket empty -> must sleep
    assert waits and waits[0] > 0


def test_retry_forever_retries():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert paginated.retry_forever(flaky, sleep=lambda s: None) == "ok"
    assert len(attempts) == 3


def test_enrichment_interleave_later_wins_order():
    pages = iter([[{"id": "a", "created_utc": 1}, {"id": "b", "created_utc": 2}]])

    def lookup(ids):
        return {"a": {"id": "a", "created_utc": 1, "score": 99}}

    out = list(paginated.enrichment_interleave(pages, lookup))[0]
    # dummy at priority 1 precedes live at priority 2 (pushshift.py:224-243)
    assert [(d["id"], d["source_priority"]) for d in out] == [
        ("a", 1), ("a", 2), ("b", 1)
    ]
