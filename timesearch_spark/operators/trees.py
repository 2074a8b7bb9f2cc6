"""Comment-forest assembly and rendering (SURVEY §2 C6/J2, §3.3).

Reference semantics (offline_reading.py:298-367 in
/root/reference/timesearch_modules/offline_reading.py):

- comments of one submission are fetched, sorted by ``created``
  (offline_reading.py:338), and linked parent→child;
- a comment whose parent id is missing gets a **phantom parent** node with
  ``data=None`` (offline_reading.py:360-366).  NOTE a deliberate
  deviation: the reference never re-attaches that phantom subtree, so the
  root-anchored walk (offline_reading.py:224-246) silently DROPS orphan
  comments from the rendered output; here phantom parents hang under the
  submission root, so every stored comment is reachable and counted.
  Depth/render output for orphan subtrees therefore differs from the
  reference by design (they appear instead of vanishing);
- top-level comments (parent starts with 't3_') attach to the submission
  root (offline_reading.py:357-359);
- render order walks children by score desc (offline_reading.py:211),
  preorder DFS (offline_reading.py:153-160).

Spark shape: threads are small (single-submission scope) while the corpus
is huge, so the right plan is ``groupBy(submission).applyInPandas`` — the
only shuffle is on the submission key, and the in-memory recursion runs
per group exactly like the reference's TreeNode code.  At 100 TB the
groups stay bounded (a thread is never TBs), and AQE's skew split keeps a
mega-thread from stalling a task slot.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TREE_SCHEMA = (
    "submission string, idstr string, parent string, depth int, "
    "position int, phantom boolean"
)


def _walk_one_thread(
    submission: str, idstrs: list, parents: list, scores: list, out: list
) -> None:
    """Assemble one submission's comment tree and append its preorder walk
    to ``out``.  Inputs are created-asc ordered plain lists — no pandas in
    the per-thread path, which is what keeps 100k tiny threads cheap.

    Port of tree_from_submission/walk semantics (offline_reading.py:331-367,
    153-160): created-asc insertion, phantom parents for missing ids,
    children visited by (score desc, idstr asc), preorder positions.
    """
    root = "t3_" + submission if not submission.startswith("t3_") else submission

    children: dict[str, list[str]] = {}
    score: dict[str, int] = {}
    parent_of: dict[str, str] = {}
    phantom: set[str] = set()
    known = set(idstrs)

    for idstr, parent, sc in zip(idstrs, parents, scores):
        if str(parent).startswith("t3_"):
            parent = root
        elif parent not in known and parent not in phantom:
            # Phantom parent (offline_reading.py:360-366): materialize a
            # data-less node under the root.
            phantom.add(parent)
            children.setdefault(root, []).append(parent)
            parent_of[parent] = root
            score[parent] = 0
        children.setdefault(parent, []).append(idstr)
        parent_of[idstr] = parent
        # Arrow hands a nullable long column over as float64 with NaN
        # (not None) — and NaN poisons the sibling sort key (every
        # comparison False → render order degrades to shuffle order).
        # `sc != sc` is the NaN test.
        score[idstr] = 0 if sc is None or sc != sc else sc

    # Iterative preorder DFS (recursion depth is unbounded in adversarial
    # threads; an explicit stack is).
    position = 0
    stack = [(root, -1)]
    while stack:
        node, depth = stack.pop()
        if node != root:
            out.append(
                (submission, node, parent_of.get(node), depth, position, node in phantom)
            )
            position += 1
        kids = children.get(node)
        if kids:
            # Render order: score desc (offline_reading.py:211), id asc for
            # determinism; reversed for the LIFO stack.
            kids.sort(key=lambda k: (-score.get(k, 0), k), reverse=True)
            for k in kids:
                stack.append((k, depth + 1))


def comment_forest(comments: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Preorder walk of every submission's comment tree.

    Input needs columns (idstr, parent, submission, created, score).
    Output: (submission, idstr, parent, depth, position, phantom) where
    depth 0 = top-level comment and position is the render order within
    the thread.

    Threads are tiny and numerous, so ``groupBy.applyInPandas`` (one
    Python call per group) would drown in per-group dispatch overhead.
    Instead: hash-partition by submission, sort within partitions, and
    walk each partition's groups inside ONE ``mapInPandas`` iterator —
    per-Arrow-batch Python cost, identical per-thread semantics, same
    single shuffle."""
    cols = ["idstr", "parent", "submission", "created", "score"]
    df = comments.select(*cols)
    parted = (
        df.repartition(num_partitions, "submission")
        if num_partitions
        else df.repartition("submission")
    ).sortWithinPartitions("submission", "created")

    out_cols = ["submission", "idstr", "parent", "depth", "position", "phantom"]

    def walk_group_lists(subs, idstrs, parents, scores, out):
        """Walk every contiguous submission run in the (sorted) lists."""
        start = 0
        for i in range(1, len(subs) + 1):
            if i == len(subs) or subs[i] != subs[start]:
                _walk_one_thread(
                    subs[start], idstrs[start:i], parents[start:i], scores[start:i], out
                )
                start = i

    def walk_partition(batches):
        # Groups can straddle Arrow batch boundaries: hold back the last
        # submission's rows until the next batch (partitioning guarantees
        # a submission never straddles *partitions*).
        psubs, pids, ppar, psc = [], [], [], []
        for pdf in batches:
            if pdf.empty:
                continue
            subs = psubs + pdf["submission"].tolist()
            ids = pids + pdf["idstr"].tolist()
            par = ppar + pdf["parent"].tolist()
            sc = psc + pdf["score"].tolist()
            # find the start of the final (possibly incomplete) group
            cut = len(subs) - 1
            while cut > 0 and subs[cut - 1] == subs[-1]:
                cut -= 1
            psubs, pids, ppar, psc = subs[cut:], ids[cut:], par[cut:], sc[cut:]
            out: list = []
            walk_group_lists(subs[:cut], ids[:cut], par[:cut], sc[:cut], out)
            if out:
                yield pd.DataFrame(out, columns=out_cols)
        out = []
        walk_group_lists(psubs, pids, ppar, psc, out)
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return parted.mapInPandas(walk_partition, TREE_SCHEMA)


def thread_stats(forest: DataFrame) -> DataFrame:
    """Per-thread rollup over the walk: size, max depth, phantom count."""
    return forest.groupBy("submission").agg(
        F.count("*").alias("n_nodes"),
        F.max("depth").alias("max_depth"),
        F.sum(F.col("phantom").cast("long")).alias("n_phantom"),
    )


# --- rendering (J1 UDF surface) ---------------------------------------------

def html_escape(col):
    """The reference's escape — including its '&rt;' typo, reproduced for
    parity (offline_reading.py:285-290)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, "<", "&lt;"), ">", "&rt;")


def render_comment_html(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Per-comment HTML div, nested by depth (offline_reading.py:178-199
    template family).  Reference composition (render_markdown,
    offline_reading.py:285-291): escape brackets FIRST — including the
    '&rt;' [sic] typo — then run the body through markdown.
    ``functions.markdown_render`` owns the package-vs-subset branch (the
    ``markdown`` package behind an import-try, the deterministic subset
    renderer in functions/markdown_lite.py otherwise) and is an
    Arrow-batched pandas_udf in BOTH arms — never a row-at-a-time UDF."""
    from timesearch_spark.functions import markdown_render

    rendered = markdown_render(html_escape(F.col(body_col)))

    return df.withColumn(
        "html",
        F.format_string(
            '<div class="comment" id="%s" style="margin-left:%dem">%s</div>',
            F.col("idstr"),
            F.col("depth").cast("int"),
            rendered,
        ),
    )
