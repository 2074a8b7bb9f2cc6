"""Upsert-with-history: the reference's storage heart (SURVEY §2 C3, I3, I4).

Reference semantics (tsdb.py:389-509):
- probe each incoming row by ``idstr``;
- absent → INSERT;
- present → ``UPDATE ... SET col = coalesce(new, old)`` for the mutable
  columns (submissions: nsfw, score, selftext, distinguish, num_comments,
  flair_text, flair_css_class — tsdb.py:438-448; comments: score, body,
  distinguish — tsdb.py:494-500);
- **edit capture** (tsdb.py:303-324, 361-387): when the text column
  changed, append a row holding the *old* text to the ``*_edits`` table
  with ``replaced_at`` = the new row's edit timestamp, else observation
  time;
- **deletion masking** (tsdb.py:527-545): if the new author is gone and
  the new text is '[removed]'/'[deleted]' (or matches a vandalism
  pattern), keep the old text and do NOT record an edit.

Spark shape: one full-outer join snapshot ⟗ batch on the key, per-column
coalesce rules, two outputs (new snapshot + appended edit rows).  The
batch is deduplicated to one row per key first (later-wins, C4/E3) so the
join is 1:1.  This is the MERGE pattern; with a transactional table format
it becomes ``MERGE INTO whenMatched/whenNotMatched``, without one the
caller overwrites affected partitions.

Scale notes: snapshot and batch shuffle once each on the key; bucketing
the snapshot by ``idstr`` removes its shuffle entirely.  The coalesce
rules are idempotent, so task retries / micro-batch replays are safe
(same observable semantics as the reference's per-row transaction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Vandalism markers (tsdb.py:541-543): a body containing ANY of these is
# treated like a deletion — keep the old text.  The reference checks
# `any(grease in body for grease in greasy)` over exactly this list.
GREASY = ["has been overwritten", "pastebin.com/64GuVi2F"]

SUBMISSION_MUTABLE = [
    "nsfw", "score", "selftext", "distinguish", "num_comments",
    "flair_text", "flair_css_class",
]  # tsdb.py:438-448
COMMENT_MUTABLE = ["score", "body", "distinguish"]  # tsdb.py:494-500


@dataclass
class UpsertResult:
    snapshot: DataFrame
    edits: DataFrame
    stats: dict = field(default_factory=dict)


def _latest_per_key(batch: DataFrame, key: str, order_col: str | None) -> DataFrame:
    """Collapse a batch to one row per key, later-wins (E3).

    ``order_col`` is a monotone source-priority / arrival column.  When
    None, ``created`` breaks ties first, then an arrival-order column
    captured HERE (``monotonically_increasing_id`` before any shuffle:
    within a file-split partition it follows file order, and partition ids
    follow split order) — so when one NDJSON batch holds two versions of
    the same idstr with equal ``created`` (original + edited copy), the
    later line wins, matching the reference's sequential row-by-row
    application (tsdb.py:389-509).

    That guarantee is best-effort: it holds for deterministic narrow
    lineage upstream (file sources), but ``monotonically_increasing_id``
    is not stable under task retry/speculation on a nondeterministic
    source.  Callers needing strict ordering there should pass an
    explicit ``order_col`` captured at read time.
    """
    order_exprs = []
    if order_col is not None:
        order_exprs.append(F.col(order_col).desc())
    # created/arrival ALWAYS follow as tiebreaks: with only an explicit
    # order_col, two same-key rows at equal priority (the 1-second
    # pagination overlap re-reading an item) would pick a
    # nondeterministic winner — the older version could clobber the newer
    if "created" in batch.columns:
        order_exprs.append(F.col("created").desc())
    batch = batch.withColumn("__arrival", F.monotonically_increasing_id())
    order_exprs.append(F.col("__arrival").desc())
    w = Window.partitionBy(key).orderBy(*order_exprs)
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__arrival")
    )


def _is_deleted(author_col, text_col):
    """Deletion-mask predicate (tsdb.py:527-545): author gone AND body is a
    removal placeholder, or the body matches a vandalism marker."""
    removed = text_col.isin("[removed]", "[deleted]")
    greasy = F.lit(False)
    for marker in GREASY:
        greasy = greasy | text_col.contains(marker)
    # match the canonical '[DELETED]' sentinel AND the raw lowercase
    # '[deleted]' that archive/pushshift dumps carry verbatim (only
    # NULL authors get canonicalized; a literal string flows through) —
    # exports.py applies the same case-insensitive test
    author_gone = author_col.isNull() | (
        F.lower(author_col) == F.lit("[deleted]")
    )
    return (author_gone & removed) | greasy


def upsert_snapshot(
    snapshot: DataFrame,
    batch: DataFrame,
    key: str = "idstr",
    mutable: list[str] | None = None,
    text_col: str = "body",
    author_col: str = "author",
    edited_ts_col: str | None = "edited",
    observed_at: int | None = None,
    store_edits: bool = True,
    batch_order_col: str | None = None,
) -> UpsertResult:
    """Full-outer MERGE of ``batch`` into ``snapshot``.

    Returns the new snapshot plus the edit-capture rows (old text versions)
    shaped like the ``*_edits`` tables: (idstr, previous_text, replaced_at).
    ``edited_ts_col``, if present in the batch, supplies ``replaced_at``
    (tsdb.py:374-377); otherwise ``observed_at`` is used.
    """
    if mutable is None:
        mutable = COMMENT_MUTABLE if text_col == "body" else SUBMISSION_MUTABLE

    cols = snapshot.columns
    batch = _latest_per_key(batch, key, batch_order_col)

    old = snapshot.alias("old")
    new = batch.alias("new")
    joined = old.join(new, on=F.col(f"old.{key}") == F.col(f"new.{key}"), how="full_outer")

    okey, nkey = F.col(f"old.{key}"), F.col(f"new.{key}")
    matched = okey.isNotNull() & nkey.isNotNull()
    deleted = _is_deleted(F.col(f"new.{author_col}"), F.col(f"new.{text_col}"))

    out_cols = []
    for c in cols:
        oc, nc = F.col(f"old.{c}"), (F.col(f"new.{c}") if c in batch.columns else F.lit(None))
        if c == key:
            expr = F.coalesce(oc, nc)
        elif c == text_col and c in mutable:
            # Deletion masking: keep old text when the new row is a removal.
            expr = F.when(matched & deleted, oc).otherwise(
                F.when(matched, F.coalesce(nc, oc)).otherwise(F.coalesce(oc, nc))
            )
        elif c in mutable:
            expr = F.when(matched, F.coalesce(nc, oc)).otherwise(F.coalesce(oc, nc))
        else:
            # Immutable columns: the first-seen value wins (reference never
            # updates them).
            expr = F.coalesce(oc, nc)
        out_cols.append(expr.alias(c))
    new_snapshot = joined.select(*out_cols)

    if store_edits:
        replaced_at = F.lit(observed_at).cast("long")
        if edited_ts_col and edited_ts_col in batch.columns:
            replaced_at = F.coalesce(
                F.col(f"new.{edited_ts_col}").cast("long"), replaced_at
            )
        text_changed = (
            matched
            & ~deleted
            & F.col(f"new.{text_col}").isNotNull()
            & (
                F.col(f"old.{text_col}").isNull()
                | (F.col(f"old.{text_col}") != F.col(f"new.{text_col}"))
            )
        )
        edits = joined.filter(text_changed).select(
            okey.alias(key),
            F.col(f"old.{text_col}").alias(f"previous_{text_col}"),
            replaced_at.alias("replaced_at"),
        )
    else:
        edits = snapshot.sparkSession.createDataFrame(
            [], f"{key} string, previous_{text_col} string, replaced_at long"
        )

    return UpsertResult(snapshot=new_snapshot, edits=edits)
