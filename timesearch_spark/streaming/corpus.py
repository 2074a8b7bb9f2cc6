"""Continuous corpus ingest with cross-run dedup — the streaming form of
the training-data pipeline's front door.

A drop directory of NDJSON document files feeds a Structured Streaming
query; every micro-batch is tagged against the persisted content
FINGERPRINT INDEX (dedup.incremental_dedup), only first-seen documents
append to the corpus, and the index advances atomically with the data.
The corpus is append-only (documents are immutable), so unlike the
archive's MERGE store no rewrite happens — each batch appends one
parquet directory and swaps a version pointer; readers pin a pointer
snapshot and never see a half-written batch.

Scale shape per batch: batch fingerprints are one map stage; the
is-new tag joins the batch against the index relation (32-byte fp +
long per distinct corpus document — a thousandth of corpus width, and
the join cost tracks the INDEX, never the corpus); the new index is
old ∪ new fingerprints (partial-agg'd min per fp).  The corpus text is
never re-read after its ingest batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timesearch_spark.fs import get_fs, read_json, write_json_atomic

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


class CorpusStore:
    """Versioned append-only document corpus + fingerprint index.

    Layout: ``corpus/batch=N/`` parquet per ingested batch,
    ``index/v=N/`` parquet index versions, ``LATEST`` JSON pointer
    (atomic rename) naming the live batch list and index version."""

    def __init__(self, spark: SparkSession, path: str,
                 neardup_threshold: float | None = None,
                 lease_timeout_sec: float | None = None):
        """``neardup_threshold``: when set, batches are ALSO tagged
        against the persisted minhash index (signature-estimated
        Jaccard >= threshold rejects) and batch-internal near-dups
        collapse to their min-id keeper — fuzzy dedup at ingest, not
        just exact content identity.

        ``lease_timeout_sec``: when set, ingest_batch/compact_batches
        run under a WriterLease on the store root so cooperating
        writers serialize instead of the loser aborting with
        ConcurrentWriteError (see ParquetMergeStore for the contract;
        the version CAS stays armed as the backstop)."""
        self.spark = spark
        self.path = path
        self.neardup_threshold = neardup_threshold
        self.lease_timeout_sec = lease_timeout_sec
        # metadata IO (pointer, listings, reclaim) through the fs shim:
        # object-store capable; data IO is Spark parquet either way
        self._fs = get_fs(spark, path)
        self._fs.mkdirs(path)

    # -- pointer ------------------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, "LATEST")

    def _pointer(self) -> dict:
        return read_json(
            self._fs, self._pointer_file(),
            default={"version": 0, "batches": []},
        )

    def _swap_pointer(self, ptr: dict) -> None:
        write_json_atomic(self._fs, self._pointer_file(), ptr)

    def _lease(self):
        """Writer lease (no-op guard when leasing is off)."""
        from timesearch_spark.fs import WriterLease

        return WriterLease.maybe(self._fs, self.path, self.lease_timeout_sec)

    def version(self) -> int:
        return self._pointer()["version"]

    # -- reads --------------------------------------------------------------

    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def corpus(self) -> DataFrame:
        ptr = self._pointer()
        if not ptr["batches"]:
            return self._empty(DOCUMENT_SCHEMA)
        paths = [os.path.join(self.path, "corpus", f"batch={b}") for b in ptr["batches"]]
        return self.spark.read.schema(DOCUMENT_SCHEMA).parquet(*paths)

    def index(self) -> DataFrame:
        ptr = self._pointer()
        if ptr["version"] == 0:
            return self._empty("fp string, keeper long")
        return self.spark.read.parquet(
            os.path.join(self.path, "index", f"v={ptr['version']}")
        )

    def minhash_buckets(self) -> DataFrame:
        ptr = self._pointer()
        if ptr["version"] == 0:
            return self._empty("band int, bucket bigint, keeper long")
        return self.spark.read.parquet(
            os.path.join(self.path, "mh_buckets", f"v={ptr['version']}")
        )

    def minhash_sigs(self) -> DataFrame:
        ptr = self._pointer()
        if ptr["version"] == 0:
            return self._empty("keeper long, sig array<bigint>")
        return self.spark.read.parquet(
            os.path.join(self.path, "mh_sigs", f"v={ptr['version']}")
        )

    # -- ingest -------------------------------------------------------------

    def ingest_batch(self, batch: DataFrame) -> dict:
        """Tag ``batch`` against the index, append only first-seen docs,
        advance the index; returns {'seen': n, 'new': n}.

        Idempotent per content: replaying a batch appends nothing (every
        fingerprint is already indexed).  The batch is localCheckpointed
        so the tag and the write see the same rows even off a
        nondeterministic source."""
        batch = batch.localCheckpoint(eager=True)
        pinned = []  # released (even on abort) once the batch is done
        n_seen = batch.count()
        if n_seen == 0:
            return {"seen": 0, "new": 0}
        try:
            with self._lease():
                return self._ingest_pinned(batch, n_seen, pinned)
        finally:
            # drop the per-batch signature caches on EVERY exit path —
            # a loop that catches ConcurrentWriteError and retries must
            # not accumulate CacheManager entries per failed attempt
            from timesearch_spark.operators.dedup import release_pins

            release_pins(*pinned)

    def _ingest_pinned(self, batch: DataFrame, n_seen: int,
                       pinned: list) -> dict:
        from timesearch_spark.operators.dedup import (
            fingerprint_index,
            incremental_dedup,
            incremental_minhash_dedup,
            minhash_index,
            minhash_near_dups,
        )

        ptr = self._pointer()
        idx = self.index()
        tag = incremental_dedup(batch, index=idx)
        new_docs = batch.join(
            tag.filter(F.col("is_new")).select("doc_id"), "doc_id"
        ).localCheckpoint(eager=True)
        mh_buckets = mh_sigs = None
        if self.neardup_threshold is not None and new_docs.count():
            # fuzzy gate: reject near-dups of the stored corpus, then
            # collapse batch-internal near-dups to their min-id keeper
            mh_buckets, mh_sigs = self.minhash_buckets(), self.minhash_sigs()
            near = incremental_minhash_dedup(
                new_docs, mh_buckets, mh_sigs,
                threshold=self.neardup_threshold,
            )
            pinned.append(near)
            new_docs = new_docs.join(
                near.filter(F.col("is_new")).select("doc_id"), "doc_id"
            )
            internal = minhash_near_dups(
                new_docs, threshold=self.neardup_threshold,
                hash_family="xxhash64",
            ).select(F.col("b").alias("doc_id")).distinct()
            new_docs = new_docs.join(internal, "doc_id", "left_anti")
            new_docs = new_docs.localCheckpoint(eager=True)
        n_new = new_docs.count()
        version = ptr["version"] + 1
        # Every artifact stages into a per-attempt dir and publishes by
        # rename AFTER the version-drift check — writing final paths
        # directly would let a slow ingest clobber a faster concurrent
        # ingest's committed batch/index dirs at the same version BEFORE
        # its own abort (the exact torn state ParquetMergeStore's
        # staging protocol closes; same design here).
        import uuid as _uuid

        token = _uuid.uuid4().hex
        publishes: list[tuple[str, str]] = []  # (staging, final)

        def _stage(sub: str, name: str) -> str:
            final = os.path.join(self.path, sub, name)
            stg = f"{final}.staging-{token}"
            publishes.append((stg, final))
            return stg

        if n_new:
            new_docs.write.mode("overwrite").parquet(
                _stage("corpus", f"batch={version}")
            )
        merged = (
            idx
            .unionByName(fingerprint_index(new_docs))
            .groupBy("fp")
            .agg(F.min("keeper").alias("keeper"))
        )
        merged.write.mode("overwrite").parquet(_stage("index", f"v={version}"))
        if self.neardup_threshold is not None:
            if mh_buckets is None:
                mh_buckets, mh_sigs = self.minhash_buckets(), self.minhash_sigs()
            nb, ns = minhash_index(new_docs)
            pinned.append(nb)  # nb/ns share one pinned signature pass
            mh_buckets.unionByName(nb).write.mode("overwrite").parquet(
                _stage("mh_buckets", f"v={version}")
            )
            mh_sigs.unionByName(ns).write.mode("overwrite").parquet(
                _stage("mh_sigs", f"v={version}")
            )
        # Version-drift check, then a jobs-free publish window (renames
        # + pointer write only; best-effort like the MERGE store — the
        # contract is single-ingest-writer).  The batch list merges
        # against the CURRENT pointer, not the one captured at ingest
        # start: a compaction finishing during this ingest replaced the
        # list (same version), and swapping the stale list back would
        # resurrect batch dirs the compaction just deleted.  A VERSION
        # drift, by contrast, means a concurrent INGEST committed — a
        # contract violation — so abort cleanly, final dirs untouched.
        cur = self._pointer()
        if cur["version"] != ptr["version"]:
            from timesearch_spark.streaming.store import ConcurrentWriteError

            for stg, _final in publishes:
                self._fs.delete(stg)
            raise ConcurrentWriteError(
                f"corpus pointer moved from v{ptr['version']} to "
                f"v{cur['version']} during ingest — a concurrent ingest "
                "committed; this store is single-ingest-writer"
            )
        for stg, final in publishes:
            if self._fs.is_dir(final):
                self._fs.delete(final)  # crashed earlier attempt's residue
            self._fs.rename(stg, final)
        self._swap_pointer(
            {
                "version": version,
                "batches": cur["batches"] + ([version] if n_new else []),
            }
        )
        return {"seen": n_seen, "new": n_new}

    def compact_batches(self, target_mb: int = 128) -> dict:
        """Consolidate every live ``batch=`` directory into ONE
        doc_id-clustered batch of ~``target_mb`` files (operators/
        layout.py semantics applied to the corpus): continuous ingest is
        write-optimal and read-toxic — thousands of per-micro-batch
        files whose footers a every corpus read must enumerate.

        Rewrite-then-swap: the consolidated batch is fully written
        BEFORE the pointer flips to it, and old directories are removed
        only after the swap, so a crash at any point leaves a readable
        corpus (worst case: the orphaned consolidated dir, re-claimed by
        the next compaction).  The fingerprint/minhash indexes reference
        doc ids, not batch paths, so dedup state is untouched.  Returns
        {'batches_before', 'batches_after', 'files_before',
        'files_after'}."""
        with self._lease():
            return self._compact_impl(target_mb)

    def _compact_impl(self, target_mb: int) -> dict:
        ptr = self._pointer()

        # Reclaim orphans first: unlisted batch dirs are crash residue
        # (vacuum deliberately never touches the corpus subtree, so this
        # is the only reclaim point).  Same reader caveat as vacuum.
        # A dir is SPARED when it could belong to a live concurrent
        # operation (ingest+compaction overlap is supported; the
        # pointer-swap races are guarded best-effort by the version
        # checks at each swap, same contract as ParquetMergeStore):
        #
        # - batch=<int> / batch=<int>.staging-*: spared while
        #   int > pointer version (an in-flight or just-crashed ingest —
        #   the next committed ingest at that version moves the pointer
        #   past it and makes the residue reclaimable);
        # - batch=<int>compacted*: spared while int == pointer version
        #   (a possibly in-flight compaction — compaction keeps the
        #   version, so residue becomes reclaimable after the next
        #   ingest bumps it).
        import re as _re

        croot = os.path.join(self.path, "corpus")
        live = {f"batch={b}" for b in ptr["batches"]}

        def _reclaimable(name: str) -> bool:
            m = _re.match(r"batch=(\d+)(.*)", name)
            if not m:
                return True  # unparseable residue: never produced live
            ver, suffix = int(m.group(1)), m.group(2)
            if "compacted" in suffix:
                return ver < ptr["version"]
            return ver <= ptr["version"]

        if self._fs.is_dir(croot):
            for d in self._fs.ls(croot):
                if d.startswith("batch=") and d not in live and _reclaimable(d):
                    self._fs.delete(os.path.join(croot, d))

        def _files(batches):
            out = []
            for b in batches:
                d = os.path.join(self.path, "corpus", f"batch={b}")
                out += [
                    os.path.join(d, f)
                    for f in self._fs.ls(d)
                    if f.endswith(".parquet")
                ]
            return out

        before = _files(ptr["batches"])
        stats = {
            "batches_before": len(ptr["batches"]),
            "files_before": len(before),
        }
        if len(ptr["batches"]) <= 1:
            return {
                **stats,
                "batches_after": stats["batches_before"],
                "files_after": stats["files_before"],
            }
        total = sum(self._fs.size(f) for f in before)
        n = max(1, -(-total // (target_mb << 20)))
        import uuid as _uuid

        # version-prefixed (drives the reclaim rule above) + unique
        # token: two overlapping compactions never write the same dir.
        # Overlap is still OUTSIDE the contract — the first to commit
        # deletes the old batch dirs the second is mid-scan on, so the
        # second fails with a read error (loud, no data loss; its
        # partial consolidated dir is reclaimed after the next ingest
        # bumps the version) — but never silent corruption.
        label = f"{ptr['version']}compacted-{_uuid.uuid4().hex[:8]}"
        (
            self.corpus()
            .repartitionByRange(n, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, "corpus", f"batch={label}"))
        )
        # Abort (and discard the consolidated dir) if an ingest committed
        # while the rewrite ran: swapping the stale single-batch list
        # would drop the new batch AND regress the version — the mirror
        # of the stale-batch-list check in ingest_batch.  An unchanged
        # version means at most the batch list is the one we read (only
        # ingest bumps the version), so the swap below is consistent.
        cur = self._pointer()
        if cur["version"] != ptr["version"]:
            from timesearch_spark.streaming.store import ConcurrentWriteError

            self._fs.delete(os.path.join(self.path, "corpus", f"batch={label}"))
            raise ConcurrentWriteError(
                f"corpus pointer moved from v{ptr['version']} to "
                f"v{cur['version']} during compaction — an ingest "
                "committed; re-run compact_batches"
            )
        old = ptr["batches"]
        self._swap_pointer({"version": ptr["version"], "batches": [label]})
        for b in old:
            self._fs.delete(os.path.join(self.path, "corpus", f"batch={b}"))
        return {
            **stats,
            "batches_after": 1,
            "files_after": len(_files([label])),
        }

    def vacuum(self) -> list[str]:
        """Delete index/minhash versions older than the live pointer,
        plus ``.staging-`` residue of crashed ingests at or below it
        (corpus batch dirs are all live by construction — the pointer
        lists them — so only superseded index versions accumulate;
        higher-versioned staging dirs are spared as possibly in-flight,
        same rule as compact_batches' reclaim).  Returns the removed
        paths."""
        import re as _re

        live = self._pointer()["version"]
        removed = []
        for sub in ("index", "mh_buckets", "mh_sigs"):
            root = os.path.join(self.path, sub)
            if not self._fs.is_dir(root):
                continue
            for d in sorted(self._fs.ls(root)):
                m = _re.match(r"v=(\d+)(.*)", d)
                if not m:
                    continue
                ver, suffix = int(m.group(1)), m.group(2)
                reclaim = (
                    ver <= live if ".staging-" in suffix
                    else ver < live and not suffix
                )
                if reclaim:
                    full = os.path.join(root, d)
                    self._fs.delete(full)
                    removed.append(full)
        return removed

    def ingest_stream(self, drop_dir: str, once: bool = True,
                      poll_seconds: int = 30):
        """Run the drop-directory ingest as a Structured Streaming query
        (availableNow for ``once``, processing-time trigger otherwise);
        returns the StreamingQuery."""
        stream = self.spark.readStream.schema(DOCUMENT_SCHEMA).json(drop_dir)
        writer = stream.writeStream.foreachBatch(
            lambda b, _id: self.ingest_batch(b)
        ).option(
            "checkpointLocation", os.path.join(self.path, "_checkpoint")
        )
        if once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{poll_seconds} seconds")
        return writer.start()
