"""HTML main-content extraction — DOM boilerplate stripping.

Stage 3a of the pipeline (north_star: "DOM-tree boilerplate stripping via
text-density/link-density heuristics (readability/jusText-style block
classification)").  The reference engine is PDF-only; this module supplies
the HTML half of the Common-Crawl-style input table.  stdlib-only
(``html.parser``) — deterministic, no native dependencies.

Algorithm (documented so goldens are reproducible):

1. **Prune** — subtrees rooted at non-content tags are dropped entirely:
   ``script style noscript template svg nav header footer aside form iframe
   button select option``.
2. **Segment** — remaining text is split into blocks at block-level element
   boundaries (``p div h1..h6 li td th dt dd blockquote pre article section
   main figcaption table tr ul ol body``).  Inline markup (``a b i span em
   strong code small``) does not break a block.  Whitespace inside a block is
   collapsed to single spaces and trimmed.
3. **Score** — per block: ``chars`` (total text length), ``link_chars``
   (text length inside ``<a>``), ``words`` (whitespace token count),
   ``link_density = link_chars / chars`` and
   ``text_density = chars / max(1, tags_in_block)`` (jusText / readability
   style stopword-free surrogates).
4. **Classify** — a block is **content** iff ``link_density < 1/3`` and
   (``words >= min_words`` or it is a heading ``h1..h6`` with ``words >= 1``).
   A heading is kept only if some *later* non-heading content block exists
   (jusText's neighbour reclassification, forward direction): headings above
   boilerplate-only regions are boilerplate.
5. **Emit** — content block texts joined by ``"\\n\\n"``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["HtmlBlock", "segment_blocks", "segment_blocks_fast",
           "extract_main_text"]

PRUNE_TAGS = frozenset(
    "script style noscript template svg nav header footer aside form iframe "
    "button select option".split()
)
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th dt dd blockquote pre article section "
    "main figcaption table tr ul ol body".split()
)
HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_WS = re.compile(r"\s+")


class HtmlBlock:
    """One segmented text block with boilerplate-classification features."""

    __slots__ = ("tag", "parts", "link_chars", "tags_inside", "_text")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.parts: list[str] = []
        self.link_chars = 0
        self.tags_inside = 1
        self._text: str | None = None

    @property
    def text(self) -> str:
        # cached: classification reads this through several properties
        if self._text is None:
            self._text = _WS.sub(" ", "".join(self.parts)).strip()
        return self._text

    @property
    def chars(self) -> int:
        return len(self.text)

    @property
    def words(self) -> int:
        t = self.text
        return len(t.split()) if t else 0

    @property
    def link_density(self) -> float:
        c = self.chars
        return (self.link_chars / c) if c > 0 else 0.0

    @property
    def text_density(self) -> float:
        return self.chars / max(1, self.tags_inside)

    @property
    def is_heading(self) -> bool:
        return self.tag in HEADING_TAGS


class _Segmenter(HTMLParser):
    """Single-pass prune + segment (steps 1-2)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[HtmlBlock] = []
        self._cur: HtmlBlock | None = None
        self._prune_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        if self._cur is not None and self._cur.text:
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._prune_depth:
            if tag in _VOID_TAGS:
                return
            self._prune_depth += 1
            return
        if tag in PRUNE_TAGS:
            self._prune_depth = 1
            self._flush()
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._cur = HtmlBlock(tag)
            return
        if tag == "br" and self._cur is not None:
            self._cur.parts.append(" ")
            return
        if self._cur is not None and tag not in _VOID_TAGS:
            self._cur.tags_inside += 1
            if tag == "a":
                self._anchor_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if self._prune_depth:
            self._prune_depth -= 1
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._prune_depth or not data:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._cur = HtmlBlock("div")
        self._cur.parts.append(data)
        if self._anchor_depth:
            self._cur.link_chars += len(_WS.sub(" ", data).strip(" "))

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush()


def segment_blocks(html: str) -> list[HtmlBlock]:
    """Steps 1-2 via stdlib ``html.parser`` — the REFERENCE segmenter.
    Semantically authoritative but pure-Python-slow (~3 MB/s); the pipeline
    runs :func:`segment_blocks_fast` (fuzz-checked against this one)."""
    seg = _Segmenter()
    seg.feed(html)
    seg.close()
    return seg.blocks


# --------------------------------------------------------------------------
# fast scanner — one compiled regex pass (~6x the html.parser segmenter)
# --------------------------------------------------------------------------

#: One match per markup construct, terminator REQUIRED — an unterminated
#: construct is not markup and falls through as text (html.parser's
#: rest-as-data-at-EOF behavior).  Attribute values may contain '>' inside
#: quotes, so the attr body alternates quoted runs with non-'>' characters.
#: On pathologically malformed markup (stray '<' followed by a later '>')
#: this scanner consumes one deterministic tag where html.parser's recovery
#: would re-emit the '<' as text — an accepted, documented policy: both are
#: deterministic, and the classification downstream is heuristic anyway.
_MARKUP = re.compile(
    r"""<(?:
        !--.*?-->                                    # comment
      | ![^>]*>                                      # doctype / declaration
      | \?[^>]*>                                     # processing instruction
      | /\s*(?P<end>[a-zA-Z][a-zA-Z0-9.:_-]*)[^>]*>  # end tag
      | (?P<start>[a-zA-Z][a-zA-Z0-9.:_-]*)          # start tag name
        (?P<body>(?:"[^"]*"|'[^']*'|[^>"'])*)>       # attrs (quote-aware)
    )""",
    re.VERBOSE | re.DOTALL,
)

#: script/style content is CDATA: markup inside is text until the matching
#: close tag (html.parser's set_cdata_mode semantics).
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script[^>]*>", re.IGNORECASE),
    "style": re.compile(r"</style[^>]*>", re.IGNORECASE),
}


def segment_blocks_fast(html: str) -> list[HtmlBlock]:
    """Steps 1-2 with a single-regex scan.  Event-for-event equivalent to
    :func:`segment_blocks` on well-formed markup (hypothesis-fuzzed in
    ``tests/test_extract_doc.py``); entity decoding is deferred to whole
    text chunks (``html.unescape`` only when ``&`` present)."""
    from html import unescape

    blocks: list[HtmlBlock] = []
    cur: HtmlBlock | None = None
    prune_depth = 0
    anchor_depth = 0

    def flush() -> None:
        nonlocal cur
        if cur is not None and cur.text:
            blocks.append(cur)
        cur = None

    def data(chunk: str) -> None:
        nonlocal cur
        if prune_depth or not chunk:
            return
        if "&" in chunk:
            chunk = unescape(chunk)
        if cur is None:
            if not chunk.strip():
                return
            cur = HtmlBlock("div")
        cur.parts.append(chunk)
        cur._text = None
        if anchor_depth:
            cur.link_chars += len(_WS.sub(" ", chunk).strip(" "))

    pos = 0
    n = len(html)
    while pos < n:
        m = _MARKUP.search(html, pos)
        if m is None:
            data(html[pos:])
            break
        if m.start() > pos:
            data(html[pos:m.start()])
        pos = m.end()

        start = m.group("start")
        if start is not None:
            tag = start.lower()
            self_closing = (m.group("body") or "").rstrip().endswith("/")
            # CDATA elements: swallow raw content up to the close tag
            if tag in _RAWTEXT_CLOSE and not self_closing:
                cm = _RAWTEXT_CLOSE[tag].search(html, pos)
                pos = cm.end() if cm else n
                if prune_depth:
                    continue  # swallowed inside a pruned subtree
                if tag in PRUNE_TAGS:
                    flush()
                    continue  # opened+closed entirely, nothing emitted
            if prune_depth:
                if tag not in _VOID_TAGS:
                    prune_depth += 1
                    if self_closing:
                        prune_depth -= 1
                continue
            if tag in PRUNE_TAGS:
                flush()
                if self_closing:
                    continue
                prune_depth = 1
                continue
            if tag in BLOCK_TAGS:
                flush()
                cur = HtmlBlock(tag)
                if self_closing:
                    flush()
                continue
            if tag == "br":
                if cur is not None:
                    cur.parts.append(" ")
                    cur._text = None
                continue
            if cur is not None and tag not in _VOID_TAGS:
                cur.tags_inside += 1
                if tag == "a":
                    anchor_depth += 1
                if self_closing and tag == "a" and anchor_depth:
                    anchor_depth -= 1
            continue

        end = m.group("end")
        if end is not None:
            tag = end.lower()
            if prune_depth:
                prune_depth -= 1
                continue
            if tag == "a" and anchor_depth:
                anchor_depth -= 1
                continue
            if tag in BLOCK_TAGS:
                flush()
        # comments / declarations / PIs: skipped entirely

    flush()
    return blocks


def extract_main_text(
    html: str,
    *,
    max_link_density: float = 1.0 / 3.0,
    min_words: int = 5,
) -> str:
    """Steps 3-5: classify blocks, emit main-content text.

    Deterministic: same input string ⇒ same output bytes.
    """
    blocks = segment_blocks_fast(html)
    content: list[tuple[int, HtmlBlock]] = []
    for i, b in enumerate(blocks):
        if b.link_density >= max_link_density:
            continue
        if b.words >= min_words:
            content.append((i, b))
        elif b.is_heading and b.words >= 1:
            content.append((i, b))
    # drop headings not followed by non-heading content — computed with a
    # reversed suffix flag (a forward any()-rescan is O(n^2) on pages with
    # thousands of heading-classified blocks)
    body_follows = [False] * len(content)
    seen_body = False
    for pos in range(len(content) - 1, -1, -1):
        body_follows[pos] = seen_body
        if not content[pos][1].is_heading:
            seen_body = True
    kept = [b for pos, (_i, b) in enumerate(content)
            if not b.is_heading or body_follows[pos]]
    return "\n\n".join(b.text for b in kept)
