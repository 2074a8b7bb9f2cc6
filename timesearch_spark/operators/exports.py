"""Export sinks (SURVEY §2 A8/A9/A10, F1/F3, H7/H10/H14/H16).

Reference output shapes:

- **index listings** (index.py:9-15,100-167): one formatted line per
  submission above a score threshold, ordered by a chosen key; txt
  (``{timestamp}: [{title}]({link}) - /u/{author} (+{score})``) or HTML
  div variant wrapped in a fixed header/footer; timestamp '%Y %b %d';
  link = ``https://redd.it/<bare id>`` (or offline per-thread page);
  deleted authors link to '#' (index.py:142-146); newlines stripped from
  titles (index.py:159).
- **breakdown JSON** (breakdown.py:83-101): plain ``json.dumps`` dict of
  ``{name: {submissions, comments}}``, or — when sorted — a custom
  pretty format, one ``"name": {...}`` line per key.
- **per-thread HTML** (offline_reading.py:369-390): one ``<id>.html``
  per submission.

Spark shape: each export is a DataFrame of formatted strings built with
JVM expressions (F.format_string/concat), fully distributed until the
final single-file write — which is driver-side by design because the
*output contract* is one ordered text file.  At 100 TB you export a
filtered slice, not the corpus; the plan is sort → project-to-line →
either ``collect`` (small) or partitioned ``write.text`` (large,
one shard per range)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timesearch_spark.functions import flatten_newlines, listing_time, strip_prefix

LINE_FORMAT_TXT = "%s: [%s](%s) - /u/%s (+%d)"  # index.py:9-11
LINE_FORMAT_HTML = (
    '<div>%s: <a href="%s">[%s] %s</a> - <a href="%s">%s</a> (+%d)</div>'
)  # index.py:13-15
HTML_HEADER = (
    "<html>\n<head>\n<meta charset=\"UTF-8\">\n<style>\n    *\n    {\n"
    "        font-family: Consolas;\n    }\n</style>\n</head>\n\n<body>\n"
)  # index.py:22-36
HTML_FOOTER = "\n</body>\n</html>\n"  # index.py:38-40

#: The five orderings of index.py:68-92 (F1/F3); each is (column factory,
#: suffix) — factories because Columns need a live session.
INDEX_ORDERINGS = {
    "date": (lambda: [F.asc("created")], "_date"),
    "title": (lambda: [F.asc("title")], "_title"),
    "score": (lambda: [F.desc("score")], "_score"),
    "author": (lambda: [F.asc("author")], "_author"),
    "flair": (  # F3: flaired first, each group time-ordered (index.py:89-92)
        lambda: [F.col("flair_text").isNull().cast("int").asc(), F.asc("created")],
        "_flair",
    ),
}


def _link_col(offline: bool):
    return (
        F.concat(F.lit("../offline_reading/"), F.col("idstr"), F.lit(".html"))
        if offline
        else F.concat(F.lit("https://redd.it/"), strip_prefix(F.col("idstr")))
    )  # index.py:134-138


def index_lines(
    submissions: DataFrame,
    orderby: str = "date",
    score_threshold: int = 0,
    html: bool = False,
    offline: bool = False,
) -> DataFrame:
    """The listing as a one-column ('line') DataFrame in final order."""
    order_cols, _ = INDEX_ORDERINGS[orderby]
    df = submissions.filter(F.col("score") >= score_threshold).orderBy(*order_cols())

    link = _link_col(offline)
    author = F.col("author")
    title = flatten_newlines(F.coalesce(F.col("title"), F.lit("")))
    ts = listing_time(F.col("created"))
    if html:
        author_link = F.when(
            F.lower(author) == "[deleted]", F.lit("#")
        ).otherwise(F.concat(F.lit("https://reddit.com/u/"), author))  # index.py:142-146
        line = F.format_string(
            LINE_FORMAT_HTML,
            ts, link, F.coalesce(F.col("flair_text"), F.lit("")), title,
            author_link, author, F.col("score"),
        )
    else:
        line = F.format_string(LINE_FORMAT_TXT, ts, title, link, author, F.col("score"))
    return df.select(line.alias("line"))


def write_index(
    submissions: DataFrame,
    out_dir: str,
    basename: str,
    orderby: str = "date",
    score_threshold: int = 0,
    html: bool = False,
    offline: bool = False,
) -> str:
    """Write one ordered listing file; returns its path."""
    from timesearch_spark.fs import get_fs

    _, suffix = INDEX_ORDERINGS[orderby]
    ext = ".html" if html else ".txt"
    fs = get_fs(submissions.sparkSession, out_dir)
    fs.mkdirs(out_dir)
    path = os.path.join(out_dir, basename + suffix + ext)
    lines = index_lines(submissions, orderby, score_threshold, html, offline)
    with fs.open_write(path) as f:
        if html:
            f.write(HTML_HEADER)
        for row in lines.toLocalIterator():  # ordered, constant driver memory
            f.write(row["line"] + "\n")
        if html:
            f.write(HTML_FOOTER)
    return path


def write_index_sharded(
    submissions: DataFrame,
    out_dir: str,
    orderby: str = "date",
    score_threshold: int = 0,
    html: bool = False,
    offline: bool = False,
) -> str:
    """The 100× form of ``write_index``: the ordered listing written as
    RANGE-PARTITIONED text shards straight from executors — a global
    sort range-partitions the lines, so the directory's content files
    concatenate in filename order into exactly the single-file
    ``write_index`` output (for html, driver-written ``00_header.html``
    / ``zz_footer.html`` bracket the ``part-*`` shards — they sort
    first/last, and Spark's zero-byte ``_SUCCESS`` marker is
    concatenation-neutral).  No driver iteration at any size;
    ``write_index`` (one file, driver-written, constant memory) remains
    the right tool when the output contract is literally one file.
    Returns the shard directory."""
    from timesearch_spark.fs import get_fs

    lines = index_lines(submissions, orderby, score_threshold, html, offline)
    path = os.path.join(out_dir, f"listing_{orderby}_shards")
    lines.write.mode("overwrite").text(path)
    if html:
        fs = get_fs(submissions.sparkSession, out_dir)
        with fs.open_write(os.path.join(path, "00_header.html")) as f:
            f.write(HTML_HEADER)
        with fs.open_write(os.path.join(path, "zz_footer.html")) as f:
            f.write(HTML_FOOTER)
    return path


def breakdown_json(bd: DataFrame, sort: str | None = None,
                   key_name: str = "author") -> str:
    """Serialize a breakdown DataFrame the reference's way
    (breakdown.py:83-88): plain dict dump unsorted, or the pretty
    one-line-per-key format when sorted."""
    if sort is None:
        rows = bd.collect()
        return json.dumps(
            {
                r[key_name]: {"submissions": r["submissions"], "comments": r["comments"]}
                for r in rows
            }
        )
    from timesearch_spark.operators.breakdown import breakdown_sorted

    rows = breakdown_sorted(bd, sort=sort, key_name=key_name).collect()
    body = ",\n".join(
        f'    "{r[key_name]}": {{"submissions": {r["submissions"]}, '
        f'"comments": {r["comments"]}}}'
        for r in rows
    )
    return "{\n" + body + "\n}\n"


def write_breakdown(bd: DataFrame, out_dir: str, basename: str,
                    sort: str | None = None, key_name: str = "author") -> str:
    from timesearch_spark.fs import get_fs

    fs = get_fs(bd.sparkSession, out_dir)
    fs.mkdirs(out_dir)
    suffix = f"_breakdown_{sort}.json" if sort else "_breakdown.json"
    path = os.path.join(out_dir, basename + suffix)
    fs.write_text_atomic(path, breakdown_json(bd, sort=sort, key_name=key_name))
    return path


def write_thread_html(rendered: DataFrame, out_dir: str) -> int:
    """A10: one ``<submission id>.html`` per thread from the rendered
    forest (columns: submission, position, html).  Returns file count.

    Files are written EXECUTOR-side (mapInPandas over the grouped
    one-row-per-thread relation; the count aggregate drives the job), so
    the sink parallelizes with the thread count — a driver
    ``toLocalIterator`` loop would serialize every document through one
    process, the one part of the r4 sink that didn't survive the 100×
    story.  ``out_dir`` must be reachable from executors (local mode:
    trivially; cluster: shared FS / fuse-mounted object store — the same
    contract any foreachPartition file sink has).  Re-runs are idempotent:
    file-per-key overwrite, no partial-append state.

    ``file://`` URIs are accepted and mapped to the local path (python
    workers have no JVM gateway, so the executor writer uses plain
    ``open``); any other scheme raises up front — a remote-object-store
    thread export should go through a fuse mount or a Spark writer."""
    from timesearch_spark.fs import has_scheme

    if out_dir.startswith("file://"):
        out_dir = out_dir[len("file://"):]
    elif has_scheme(out_dir):
        raise ValueError(
            f"write_thread_html writes executor-side with plain open(); "
            f"scheme {out_dir.split('://', 1)[0]}:// is not reachable "
            "there — use a fuse mount or a local/file:// path"
        )
    os.makedirs(out_dir, exist_ok=True)
    # collect_list order is not stable under shuffle: gather (position,
    # html) structs and sort inside the group instead.
    grouped = rendered.groupBy("submission").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("position", "html"))),
                lambda s: s["html"],
            ),
            "\n",
        ).alias("doc")
    )

    def write_part(batches):
        import pandas as pd

        n = 0
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            for name, doc in zip(pdf["submission"], pdf["doc"]):
                if name is None:
                    # orphan comments (raw line without link_id) have no
                    # thread to render into — skip, don't kill the job
                    continue
                name = name if name.startswith("t3_") else "t3_" + name
                path = os.path.join(out_dir, f"{name}.html")
                with open(path, "w", encoding="utf-8") as f:
                    f.write(HTML_HEADER + doc + HTML_FOOTER)
                n += 1
        yield pd.DataFrame({"n": [n]})

    counts = grouped.mapInPandas(write_part, "n long")
    total = counts.agg(F.sum("n")).first()[0]
    return int(total or 0)
