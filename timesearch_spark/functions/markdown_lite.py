"""Deterministic subset Markdown→HTML renderer (H5 fallback).

The reference renders comment bodies with the ``markdown`` package
(offline_reading.py:285-291), which is not installed in this container.
Rather than degrading to an escaped raw body, this module renders the
block/inline constructs that dominate the reference's domain (forum
comment text) with python-markdown-compatible output shapes:

- paragraphs (blank-line separated)         → ``<p>…</p>``
- ATX headings ``#``–``######``             → ``<h1>``…``<h6>``
- blockquotes (``> `` prefixed lines)       → ``<blockquote><p>…``
- unordered lists (``- `` / ``* `` lines)   → ``<ul><li>…``
- ordered lists (``1. `` numbered lines)    → ``<ol><li>…``
- fenced code blocks (``` fences)           → ``<pre><code>…``
- indented code blocks (4-space lines)      → ``<pre><code>…``
- ``**strong**``, ``*em*``, ``` `code` ``   → ``<strong>/<em>/<code>``
- ``[text](url)``                           → ``<a href="url">text</a>``

Known deviations (documented, deliberate): raw inline HTML is escaped
rather than passed through, nested lists/quotes are flattened one
level, and setext headings are rendered as paragraphs.  Fenced code is
the Reddit-markdown reading of ``` blocks; the reference's renderer
(python-markdown WITHOUT the fenced_code extension,
offline_reading.py:285-291) has no fence support at all, so this is an
extension past reference behavior, not a mismatch against one it has.
The renderer is pure and total: same string in, same string out, never
raises.
"""

from __future__ import annotations

import re

_CODE = re.compile(r"`([^`]+)`")
_STRONG = re.compile(r"\*\*([^*]+)\*\*")
_EM = re.compile(r"\*([^*]+)\*")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)\s]*)\)")
_HEADING = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")


_BARE_AMP = re.compile(r"&(?![#\w]+;)")


def _escape(s: str) -> str:
    """python-markdown-style escaping: '&' becomes '&amp;' only when it
    does not already start an entity-shaped sequence (markdown's own
    smart-ampersand rule — the reference relies on it to keep its
    pre-escaped '&lt;'/'&rt;' [sic] sequences intact,
    offline_reading.py:286-291)."""
    return _BARE_AMP.sub("&amp;", s).replace("<", "&lt;").replace(">", "&gt;")


def _inline(s: str) -> str:
    s = _escape(s)
    # carve code spans out FIRST (NUL placeholders — render() strips
    # NULs from the input, so no collision): python-markdown keeps
    # code-span content literal, and running link/strong/em over the
    # rendered <code> body would rewrite `[x](y)` inside backticks
    spans: list[str] = []

    def _carve(m):
        spans.append(f"<code>{m.group(1)}</code>")
        return f"\x00i{len(spans) - 1}\x00"

    s = _CODE.sub(_carve, s)
    # quotes in the url are attribute-escaped (python-markdown does the
    # same) so a crafted url can't break out of the href attribute
    s = _LINK.sub(
        lambda m: f'<a href="{m.group(2).replace(chr(34), "&quot;")}">{m.group(1)}</a>',
        s,
    )
    s = _STRONG.sub(lambda m: f"<strong>{m.group(1)}</strong>", s)
    s = _EM.sub(lambda m: f"<em>{m.group(1)}</em>", s)
    for i, span in enumerate(spans):
        s = s.replace(f"\x00i{i}\x00", span)
    return s


_OL_ITEM = re.compile(r"^\d+\.\s+(.*)$")


def _render_block(block: str) -> str:
    lines = block.split("\n")
    m = _HEADING.match(lines[0])
    if m and len(lines) == 1:
        level = len(m.group(1))
        return f"<h{level}>{_inline(m.group(2))}</h{level}>"
    if all(ln.startswith(">") for ln in lines):
        inner = "\n".join(ln[2:] if ln.startswith("> ") else ln[1:] for ln in lines)
        return "<blockquote>\n" + render(inner) + "\n</blockquote>"
    if all(ln.startswith(("- ", "* ")) for ln in lines):
        items = "\n".join(f"<li>{_inline(ln[2:])}</li>" for ln in lines)
        return "<ul>\n" + items + "\n</ul>"
    ol = [_OL_ITEM.match(ln) for ln in lines]
    if all(ol):
        items = "\n".join(f"<li>{_inline(m.group(1))}</li>" for m in ol)
        return "<ol>\n" + items + "\n</ol>"
    if all(ln.startswith("    ") or not ln.strip() for ln in lines):
        code = "\n".join(ln[4:] for ln in lines)
        return "<pre><code>" + _escape(code) + "\n</code></pre>"
    return "<p>" + _inline("\n".join(lines)) + "</p>"


_FENCE = re.compile(r"^```[^\n`]*\n(.*?)\n?^```\s*$", re.M | re.S)


def render(text: str | None) -> str | None:
    """Render a markdown string to HTML (None passes through)."""
    if text is None:
        return None
    text = text.replace("\r\n", "\n")
    # Fenced code first: fences may contain blank lines, so they must be
    # carved out before the blank-line block split.  Placeholder indexes
    # into the rendered fence list; stray NULs DO occur in real corpus
    # text and would collide with the placeholder encoding (raising on
    # fences[i] and breaking the never-raises contract), so strip them
    # up front — NUL has no markdown meaning and no HTML representation.
    text = text.replace("\x00", "")
    fences: list[str] = []

    def _carve(m: re.Match) -> str:
        fences.append("<pre><code>" + _escape(m.group(1)) + "\n</code></pre>")
        return f"\n\n\x00{len(fences) - 1}\x00\n\n"

    text = _FENCE.sub(_carve, text)
    blocks = [b for b in re.split(r"\n\s*\n", text) if b.strip()]
    out = []
    for b in blocks:
        b = b.strip("\n")
        fm = re.fullmatch(r"\x00(\d+)\x00", b)
        out.append(fences[int(fm.group(1))] if fm else _render_block(b))
    return "\n".join(out)
