"""Deterministic HTML → field extraction, written from scratch (no bs4 in the
environment; the reference consumed a pre-built Lucene index whose fields
``url, keywords, title, inlink, body`` were extracted out-of-band —
``QryEval.java:529``; this module is the rebuild's extractor).

The per-row invariant from ``BASELINE.json input_hint``: for every corpus row,
``extract_fields(html)["body"]`` must equal the row's golden ``text`` column
**byte-for-byte** — regardless of parallelism or run order (it is a pure
function of the bytes).

Pipeline per document:
1. decode utf-8;
2. drop ``<!-- comments -->`` and ``<script>/<style>`` blocks;
3. capture ``<title>``, ``<meta name="keywords" content=...>`` and
   ``<a href=...>anchor</a>`` pairs (for the inlink anchor-text join);
4. strip remaining tags (each tag becomes a whitespace separator);
5. decode HTML entities;
6. normalize whitespace (collapse runs to single spaces, strip ends).
"""

from __future__ import annotations

import html as _html
import re

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.S | re.I)
_META_KW_RE = re.compile(
    r"<meta\s[^>]*name\s*=\s*[\"']keywords[\"'][^>]*content\s*=\s*[\"']([^\"']*)[\"']",
    re.S | re.I,
)
_ANCHOR_RE = re.compile(
    r"<a\s[^>]*href\s*=\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a\s*>", re.S | re.I
)
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean_text(fragment: str) -> str:
    """tags → spaces, entity decode, whitespace normalize."""
    no_tags = _TAG_RE.sub(" ", fragment)
    return _WS_RE.sub(" ", _html.unescape(no_tags)).strip()


def extract_fields(html_bytes: bytes | str) -> dict:
    """Extract ``{body, title, keywords, links}`` from one HTML page.

    ``links`` is a list of ``(href, anchor_text)`` pairs feeding the optional
    inlink anchor-text groupby (SURVEY.md §2.6 build-side join).
    """
    raw = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, (bytes, bytearray, memoryview))
        else html_bytes
    )
    stripped = _SCRIPT_STYLE_RE.sub(" ", _COMMENT_RE.sub(" ", raw))

    m = _TITLE_RE.search(stripped)
    title = _clean_text(m.group(1)) if m else ""

    m = _META_KW_RE.search(stripped)
    keywords = _WS_RE.sub(" ", _html.unescape(m.group(1))).strip() if m else ""

    links = [
        (_html.unescape(href).strip(), _clean_text(anchor))
        for href, anchor in _ANCHOR_RE.findall(stripped)
    ]

    m = _BODY_RE.search(stripped)
    body_src = m.group(1) if m else _TITLE_RE.sub(" ", stripped)
    body = _clean_text(body_src)

    return {"body": body, "title": title, "keywords": keywords, "links": links}
