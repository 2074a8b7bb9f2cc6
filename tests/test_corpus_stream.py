"""Continuous corpus ingest with cross-run dedup (streaming/corpus)."""

from __future__ import annotations

import json

from timesearch_spark.streaming.corpus import CorpusStore


import pytest

def _doc(i, text, source="web"):
    return {"doc_id": i, "source": source, "lang": "en", "text": text}


def _drop(path, name, docs):
    (path / name).write_text("\n".join(json.dumps(d) for d in docs) + "\n")


def test_ingest_batch_dedups_across_runs(spark, tmp_path):
    store = CorpusStore(spark, str(tmp_path / "corpus"))
    b1 = spark.createDataFrame(
        [(1, "web", "en", "the first document"),
         (2, "web", "en", "the second document")],
        "doc_id long, source string, lang string, text string",
    )
    assert store.ingest_batch(b1) == {"seen": 2, "new": 2}
    # second batch: one exact dup (different id), one whitespace-variant
    # dup, one genuinely new
    b2 = spark.createDataFrame(
        [(10, "web", "en", "the first document"),
         (11, "web", "en", "  THE   second document  "),
         (12, "web", "en", "a third document entirely")],
        "doc_id long, source string, lang string, text string",
    )
    assert store.ingest_batch(b2) == {"seen": 3, "new": 1}
    ids = sorted(r["doc_id"] for r in store.corpus().collect())
    assert ids == [1, 2, 12]
    # replay is a no-op (idempotent per content)
    assert store.ingest_batch(b2) == {"seen": 3, "new": 0}
    assert store.corpus().count() == 3
    assert store.index().count() == 3


def test_ingest_stream_available_now(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    _drop(drop, "a.jsonl", [_doc(1, "alpha doc"), _doc(2, "beta doc")])
    _drop(drop, "b.jsonl", [_doc(3, "alpha doc"), _doc(4, "gamma doc")])

    store = CorpusStore(spark, str(tmp_path / "corpus"))
    q = store.ingest_stream(str(drop), once=True)
    q.awaitTermination(120)
    texts = sorted(r["text"] for r in store.corpus().collect())
    # 'alpha doc' ingested once regardless of which file won the race
    assert texts == ["alpha doc", "beta doc", "gamma doc"]

    # later files picked up by a second availableNow run, still deduped
    _drop(drop, "c.jsonl", [_doc(5, "beta doc"), _doc(6, "delta doc")])
    q2 = store.ingest_stream(str(drop), once=True)
    q2.awaitTermination(120)
    texts = sorted(r["text"] for r in store.corpus().collect())
    assert texts == ["alpha doc", "beta doc", "delta doc", "gamma doc"]


def test_ingest_batch_neardup_gate(spark, tmp_path):
    """With neardup_threshold set, fuzzy rewrites of stored docs are
    rejected and batch-internal near-dups collapse to one keeper."""
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the tall fence near the old red barn today")
    store = CorpusStore(spark, str(tmp_path / "c"), neardup_threshold=0.5)
    b1 = spark.createDataFrame(
        [(1, "web", "en", base)],
        "doc_id long, source string, lang string, text string",
    )
    assert store.ingest_batch(b1) == {"seen": 1, "new": 1}
    variant = base.replace("today", "tonight")
    b2 = spark.createDataFrame(
        [
            (10, "web", "en", variant),                       # near-dup of stored 1
            (11, "web", "en", "a wholly different text about query engines "
                              "and shuffle planning in distributed systems"),
            (12, "web", "en", "a wholly different text about query engines "
                              "and shuffle planning in distributed setups"),  # near-dup of 11
        ],
        "doc_id long, source string, lang string, text string",
    )
    out = store.ingest_batch(b2)
    assert out == {"seen": 3, "new": 1}
    assert sorted(r["doc_id"] for r in store.corpus().collect()) == [1, 11]
    # replay: the surviving doc 11 is now exact-indexed -> no-op
    assert store.ingest_batch(b2)["new"] == 0


@pytest.mark.slow
def test_vacuum_drops_superseded_index_versions(spark, tmp_path):
    import os

    store = CorpusStore(spark, str(tmp_path / "c"), neardup_threshold=0.5)
    mk = lambda i, t: spark.createDataFrame(
        [(i, "w", "en", t)], "doc_id long, source string, lang string, text string")
    store.ingest_batch(mk(1, "first doc here with several words inside"))
    store.ingest_batch(mk(2, "second doc here with other words instead"))
    removed = store.vacuum()
    assert len(removed) == 3  # v=1 of index, mh_buckets, mh_sigs
    # live state still reads correctly after vacuum
    assert store.corpus().count() == 2
    assert store.index().count() == 2
    assert sorted(os.listdir(os.path.join(store.path, "index"))) == ["v=2"]
    # and further ingest works
    assert store.ingest_batch(mk(3, "third doc entirely fresh text matter"))["new"] == 1


def test_compact_batches_consolidates_and_preserves_dedup(spark, tmp_path):
    store = CorpusStore(spark, str(tmp_path / "corpus"))
    for i in range(3):
        b = spark.createDataFrame(
            [(i * 10 + j, "web", "en", f"document number {i}-{j}")
             for j in range(4)],
            "doc_id long, source string, lang string, text string",
        )
        assert store.ingest_batch(b)["new"] == 4
    before_ids = sorted(r["doc_id"] for r in store.corpus().collect())

    stats = store.compact_batches()
    assert stats["batches_before"] == 3 and stats["batches_after"] == 1
    assert stats["files_after"] < stats["files_before"]
    assert sorted(r["doc_id"] for r in store.corpus().collect()) == before_ids

    # dedup state survives: replaying an old batch appends nothing,
    # genuinely new content still lands
    replay = spark.createDataFrame(
        [(99, "web", "en", "document number 0-0")],
        "doc_id long, source string, lang string, text string",
    )
    assert store.ingest_batch(replay) == {"seen": 1, "new": 0}
    fresh = spark.createDataFrame(
        [(100, "web", "en", "an entirely unseen document")],
        "doc_id long, source string, lang string, text string",
    )
    assert store.ingest_batch(fresh) == {"seen": 1, "new": 1}
    assert store.corpus().count() == len(before_ids) + 1

    # compacting a single batch is a no-op
    store2 = CorpusStore(spark, str(tmp_path / "single"))
    b = spark.createDataFrame(
        [(1, "web", "en", "only doc")],
        "doc_id long, source string, lang string, text string",
    )
    store2.ingest_batch(b)
    s = store2.compact_batches()
    assert s["batches_before"] == s["batches_after"] == 1


def test_compact_spares_in_flight_ingest_dir(spark, tmp_path):
    # ingest_batch writes its batch=N dir BEFORE swapping the pointer; a
    # compaction overlapping that window must not reclaim the
    # higher-versioned dir as an orphan (it is an in-flight ingest), but
    # a stale non-integer compacted orphan is still reclaimed
    import os

    root = str(tmp_path / "corpus")
    store = CorpusStore(spark, root)
    b1 = spark.createDataFrame(
        [(1, "web", "en", "one doc"), (2, "web", "en", "two doc")],
        "doc_id long, source string, lang string, text string",
    )
    store.ingest_batch(b1)
    store.ingest_batch(
        spark.createDataFrame(
            [(3, "web", "en", "three doc")],
            "doc_id long, source string, lang string, text string",
        )
    )
    croot = os.path.join(root, "corpus")
    ver = store._pointer()["version"]
    inflight = os.path.join(croot, f"batch={ver + 1}")
    orphan = os.path.join(croot, "batch=0compacted")
    os.makedirs(inflight)
    os.makedirs(orphan)
    store.compact_batches()
    assert os.path.isdir(inflight)      # spared: version > pointer
    assert not os.path.isdir(orphan)    # reclaimed: crashed compaction


def _b(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )


def test_compaction_finishing_mid_ingest_keeps_both(spark, tmp_path):
    """A compaction that lands while an ingest is running must not be
    undone by the ingest's pointer swap: the swap merges against the
    CURRENT batch list, so the compacted batch and the new batch both
    survive."""
    root = str(tmp_path / "corpus")
    store = CorpusStore(spark, root)
    store.ingest_batch(_b(spark, [(1, "w", "en", "one doc")]))
    store.ingest_batch(_b(spark, [(2, "w", "en", "two doc")]))

    other = CorpusStore(spark, root)
    orig_index = store.index

    def hooked():
        store.index = orig_index  # fire once
        other.compact_batches()   # compaction lands mid-ingest
        return orig_index()

    store.index = hooked
    assert store.ingest_batch(_b(spark, [(3, "w", "en", "three doc")])) == {
        "seen": 1, "new": 1,
    }
    texts = sorted(r["text"] for r in store.corpus().collect())
    assert texts == ["one doc", "three doc", "two doc"]


def test_ingest_committing_mid_compaction_aborts_compaction(spark, tmp_path):
    """The mirror race: an ingest committing while compact_batches
    rewrites must abort the compaction cleanly (stale swap would drop
    the new batch and regress the version)."""
    import pytest as _pytest

    from timesearch_spark.streaming.store import ConcurrentWriteError

    root = str(tmp_path / "corpus2")
    store = CorpusStore(spark, root)
    store.ingest_batch(_b(spark, [(1, "w", "en", "one doc")]))
    store.ingest_batch(_b(spark, [(2, "w", "en", "two doc")]))

    other = CorpusStore(spark, root)
    orig_corpus = store.corpus

    def hooked():
        store.corpus = orig_corpus  # fire once
        other.ingest_batch(_b(spark, [(3, "w", "en", "three doc")]))
        return orig_corpus()

    store.corpus = hooked
    with _pytest.raises(ConcurrentWriteError):
        store.compact_batches()
    texts = sorted(r["text"] for r in store.corpus().collect())
    assert texts == ["one doc", "three doc", "two doc"]
    # the aborted consolidated dir was discarded; a retry succeeds
    s = store.compact_batches()
    assert s["batches_after"] == 1
    assert store.corpus().count() == 3


def test_vacuum_handles_staging_residue(spark, tmp_path):
    # a crashed ingest leaves index/v=N.staging-* dirs; vacuum must
    # reclaim those at/below the live version (not crash on int parse)
    # and spare higher-versioned ones as possibly in-flight
    import os

    root = str(tmp_path / "corpus")
    store = CorpusStore(spark, root)
    store.ingest_batch(_b(spark, [(1, "w", "en", "one doc")]))
    store.ingest_batch(_b(spark, [(2, "w", "en", "two doc")]))
    ver = store.version()
    stale = os.path.join(root, "index", f"v={ver}.staging-dead")
    inflight = os.path.join(root, "index", f"v={ver + 1}.staging-live")
    os.makedirs(stale)
    os.makedirs(inflight)
    removed = store.vacuum()
    assert any("staging-dead" in r for r in removed)
    assert not os.path.isdir(stale)
    assert os.path.isdir(inflight)
    assert store.index().count() == 2  # live index untouched


def test_corpus_lease_serializes_concurrent_ingest(spark, tmp_path):
    """Two lease-enabled ingest writers released into contention both
    commit; the corpus holds all docs and the version advanced twice."""
    import threading
    import time as _time

    from timesearch_spark.fs import WriterLease, get_fs

    root = str(tmp_path / "corpus_lease")
    a = CorpusStore(spark, root, lease_timeout_sec=60.0)
    b = CorpusStore(spark, root, lease_timeout_sec=60.0)
    a.ingest_batch(_b(spark, [(1, "w", "en", "seed doc")]))

    gate = WriterLease(get_fs(spark, root), root).acquire()
    errors = []

    def run(store, doc_id, text):
        try:
            store.ingest_batch(_b(spark, [(doc_id, "w", "en", text)]))
        except Exception as exc:  # pragma: no cover - failure reporting
            errors.append(exc)

    ta = threading.Thread(target=run, args=(a, 2, "doc two"))
    tb = threading.Thread(target=run, args=(b, 3, "doc three"))
    ta.start(); tb.start()
    _time.sleep(1.0)
    assert a.version() == 1  # both gated
    gate.release()
    ta.join(120); tb.join(120)

    assert not errors, errors
    assert a.version() == 3
    assert sorted(r["text"] for r in a.corpus().collect()) == [
        "doc three", "doc two", "seed doc",
    ]
