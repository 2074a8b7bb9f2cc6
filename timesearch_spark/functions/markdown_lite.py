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
- ``**strong**``, ``*em*``, ``` `code` ``   → ``<strong>/<em>/<code>``
- ``[text](url)``                           → ``<a href="url">text</a>``

Known deviations (documented, deliberate): raw inline HTML is escaped
rather than passed through, nested lists/quotes are flattened one level,
and setext headings / ordered lists / fenced code blocks are rendered as
paragraphs.  The renderer is pure and total: same string in, same string
out, never raises.
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
    s = _CODE.sub(lambda m: f"<code>{m.group(1)}</code>", s)
    s = _LINK.sub(lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', s)
    s = _STRONG.sub(lambda m: f"<strong>{m.group(1)}</strong>", s)
    s = _EM.sub(lambda m: f"<em>{m.group(1)}</em>", s)
    return s


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
    return "<p>" + _inline("\n".join(lines)) + "</p>"


def render(text: str | None) -> str | None:
    """Render a markdown string to HTML (None passes through)."""
    if text is None:
        return None
    blocks = [b for b in re.split(r"\n\s*\n", text.replace("\r\n", "\n")) if b.strip()]
    return "\n".join(_render_block(b.strip("\n")) for b in blocks)
