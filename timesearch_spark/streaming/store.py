"""Versioned parquet MERGE store — the upsert/CDC sink (SURVEY §2 A11,
C3, I3, I4).

Reference semantics: TSDB.insert (tsdb.py:326-359) — per-batch upsert
with edit capture, one commit per chunk.  Spark has no transactional
single-table update without a lakehouse format, so the store emulates
MERGE the standard way:

- the snapshot lives under ``<path>/snapshot/v=N`` (monotone versions);
  a merge writes v=N+1 and then moves the ``LATEST`` pointer — readers
  of v=N are never disturbed (writer-reader isolation by immutability);
- edit rows append under ``<path>/edits`` (append-only CDC log, exactly
  the ``*_edits`` tables of tsdb.py:88-100);
- the merge itself is operators.upsert.upsert_snapshot — idempotent
  coalesce rules, so a replayed micro-batch converges to the same state
  (exactly-once-per-key downstream of at-least-once delivery).

With Delta/Iceberg available this class collapses to ``MERGE INTO``;
the interface (merge/snapshot/resume_lower_bound) is format-agnostic by
design.  At 100 TB the snapshot is partitioned by entity and the rewrite
touches only affected partitions (partition-overwrite mode).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timesearch_spark.operators.upsert import UpsertResult, upsert_snapshot

#: Archive format version (parity with DATABASE_VERSION = 2 stored in
#: PRAGMA user_version, tsdb.py:34-37; checked at open tsdb.py:217-228).
SCHEMA_VERSION = 2


class ArchiveOutOfDate(Exception):
    """Raised when a store was written by an older schema version
    (exceptions.py:22-26 analog); run ``upgrade_store`` to migrate."""


class ParquetMergeStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema,
        key: str = "idstr",
        text_col: str = "body",
        store_edits: bool = True,
    ):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.key = key
        self.text_col = text_col
        self.store_edits = store_edits
        os.makedirs(path, exist_ok=True)

    # -- version pointer ----------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, "LATEST")

    def _pointer(self) -> dict:
        try:
            with open(self._pointer_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "schema_version": SCHEMA_VERSION}

    def version(self) -> int:
        return self._pointer()["version"]

    def schema_version(self) -> int:
        return self._pointer().get("schema_version", 1)

    def check_schema_version(self) -> None:
        """Open-time gate (tsdb.py:217-228): refuse an older archive."""
        found = self.schema_version()
        if found < SCHEMA_VERSION:
            raise ArchiveOutOfDate(
                f"archive at {self.path} is schema v{found}; "
                f"engine expects v{SCHEMA_VERSION} — run upgrade_store()"
            )

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, "snapshot", f"v={version}")

    def _commit(self, version: int, schema_version: int = SCHEMA_VERSION) -> None:
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "schema_version": schema_version,
                    "committed_at": time.time(),
                },
                f,
            )
        os.replace(tmp, self._pointer_file())  # atomic pointer swap

    # -- reads ----------------------------------------------------------------

    def snapshot(self) -> DataFrame:
        v = self.version()
        if v == 0:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(self._snapshot_dir(v))

    def edits(self) -> DataFrame:
        d = os.path.join(self.path, "edits")
        try:
            return self.spark.read.parquet(d)
        except Exception:
            return self.spark.createDataFrame(
                [], f"{self.key} string, previous_{self.text_col} string, replaced_at long"
            )

    def resume_lower_bound(self) -> int:
        """I2: incremental resume point = max stored ``created`` − 1 (the
        1-second overlap of get_submissions.py:52-66); 0 on empty."""
        v = self.version()
        if v == 0:
            return 0
        row = self.snapshot().agg(F.max("created").alias("m")).first()
        return (row["m"] - 1) if row["m"] is not None else 0

    # -- merge ----------------------------------------------------------------

    def merge(
        self,
        batch: DataFrame,
        observed_at: int | None = None,
        batch_order_col: str | None = None,
    ) -> UpsertResult:
        """MERGE one batch: new snapshot version + appended edit rows."""
        if observed_at is None:
            observed_at = int(time.time())
        res = upsert_snapshot(
            self.snapshot(),
            batch,
            key=self.key,
            text_col=self.text_col,
            observed_at=observed_at,
            store_edits=self.store_edits,
            batch_order_col=batch_order_col,
        )
        new_version = self.version() + 1
        res.snapshot.write.mode("overwrite").parquet(self._snapshot_dir(new_version))
        if self.store_edits:
            res.edits.write.mode("append").parquet(os.path.join(self.path, "edits"))
        self._commit(new_version)
        return res

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        """``writeStream.foreachBatch`` adapter (I1→A11)."""
        self.merge(batch)


#: Stepwise migrations (database_upgrader.py:24-49 analog): version → fn.
#: Each fn takes (store, snapshot DataFrame) and returns the migrated
#: DataFrame; the runner commits one version bump per step.
MIGRATIONS: dict[int, callable] = {
    # 1 → 2: the reference's v2 added submissions.augmented_at /
    # augmented_count (tsdb.py:68-69); parquet snapshots add them as nulls.
    2: lambda store, df: _add_missing_columns(df, store.schema),
}


def _add_missing_columns(df: DataFrame, schema) -> DataFrame:
    for field in schema.fields:
        if field.name not in df.columns:
            df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
    return df.select(*[f.name for f in schema.fields])


def upgrade_store(store: ParquetMergeStore) -> int:
    """Run every pending migration step in order (the database_upgrader
    loop); returns the final schema version."""
    current = store.schema_version()
    while current < SCHEMA_VERSION:
        step = current + 1
        migrate = MIGRATIONS.get(step)
        snap = store.snapshot()
        if migrate is not None:
            snap = migrate(store, snap)
        new_version = store.version() + 1
        snap.write.mode("overwrite").parquet(store._snapshot_dir(new_version))
        store._commit(new_version, schema_version=step)
        current = step
    return current
