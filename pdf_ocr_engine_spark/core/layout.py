"""Layout reconstruction core — the byte-identity kernel.

Pure-Python (stdlib-only) reimplementation of the reference engine's
copy-friendly word sequencing semantics (ajjucoder/pdf-ocr-engine,
``src/lib/ocr/builder.ts:22-122``):

1. word validity filter (non-empty trimmed text, finite coords, positive box)
   — ``builder.ts:22-27`` (SURVEY.md F5)
2. derived geometry ``height = y1-y0``, ``centerY = (y0+y1)/2``
   — ``builder.ts:32-39`` (P3)
3. stable composite sort by ``(centerY ASC, x0 ASC)`` — ``builder.ts:40-43`` (W1)
4. greedy 1-D line clustering in sort order: a word joins the nearest
   existing line iff ``|centerY - line.centerY| <= max(2, 0.6*min(word.height,
   line.avgHeight))`` (first line wins exact distance ties), else opens a new
   line; the line's centroid/height are order-dependent running means
   ``new = (old*(n-1)+x)/n`` — ``builder.ts:45-77`` (W5 + A5)
5. line sort by final centerY, in-line sort by x0 — ``builder.ts:79,84`` (W2, W3)
6. separator classification per word from the lag gap
   ``max(0, cur.x0 - prev.x1)``: first word of a non-first line gets ``"\\n"``;
   otherwise a separator is emitted only when ``gap > 0.15*line.avgHeight``,
   and it is ``"\\t"`` when ``gap >= max(1.25*avgWordWidth, 1.5*line.avgHeight)``
   else ``" "`` — ``builder.ts:86-111`` (W4, W6, W7, A4)
7. ordered concat ``prefix + rawText`` — ``builder.ts:113-121`` (W8)

Every float operation is evaluated in the same order and with the same
IEEE-754 double semantics as the reference (JS ``number`` == Python ``float``),
so the emitted byte sequence is identical.  Per-page word counts are
O(10^2-10^3), so this loop is micro-scale; at pipeline level it runs inside
Arrow-batched pandas UDFs where the batch I/O is vectorized.
"""

from __future__ import annotations

import math
from typing import Iterable, NamedTuple

__all__ = [
    "Word",
    "CopyWord",
    "js_trim",
    "is_valid_word",
    "build_copy_friendly_word_sequence",
    "page_text",
]

# ECMAScript String.prototype.trim whitespace set (WhiteSpace + LineTerminator).
# Differs from Python str.strip() on U+FEFF (JS trims it, Python does not) and
# on U+001C-U+001F (Python strips them, JS does not) — byte-identity demands
# the JS set.
_JS_WS = (
    "\t\n\v\f\r \u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)


class Word(NamedTuple):
    """One OCR-style word box (image coords, top-left origin).

    Mirrors ``OcrResult`` (reference ``src/lib/ocr/types.ts:8-17``);
    ``confidence`` is carried but never read by the layout algorithm
    (the reference's builder never reads it either).
    """

    text: str
    x0: float
    y0: float
    x1: float
    y1: float
    confidence: float = 0.0


class CopyWord(NamedTuple):
    """Mirrors ``CopyFriendlyWord`` (reference ``builder.ts:4-8``):
    ``text`` carries the separator prefix, ``raw_text`` does not."""

    raw_text: str
    text: str
    x0: float
    y0: float
    x1: float
    y1: float


def js_trim(s: str) -> str:
    """``String.prototype.trim`` — strips the ECMAScript whitespace set."""
    return s.strip(_JS_WS)


def is_valid_word(text: str | None, x0: float, y0: float, x1: float, y1: float) -> bool:
    """Reference ``isValidWord`` (``builder.ts:22-27``): non-empty trimmed
    text, all-finite coordinates, strictly positive width and height."""
    if text is None or not js_trim(text):
        return False
    for v in (x0, y0, x1, y1):
        # JS Number.isFinite: false for NaN and +/-Infinity.
        if not math.isfinite(v):
            return False
    return x1 > x0 and y1 > y0


class _Line:
    """Mutable line cluster (reference ``WordLine``, ``builder.ts:16-20``)."""

    __slots__ = ("center_y", "avg_height", "words")

    def __init__(self, center_y: float, avg_height: float, first: tuple) -> None:
        self.center_y = center_y
        self.avg_height = avg_height
        self.words = [first]


def build_copy_friendly_word_sequence(words: Iterable[Word]) -> list[CopyWord]:
    """Byte-identical port of ``buildCopyFriendlyWordSequence``
    (``builder.ts:29-122``).  Accepts any iterable of :class:`Word` (or
    5+-tuples ``(text, x0, y0, x1, y1, ...)``) and returns the ordered
    :class:`CopyWord` sequence whose concatenated ``text`` fields form the
    extracted page text.
    """
    # filter + derive metrics (F5, P3); entry = (word_tuple, center_y, height)
    metrics: list[tuple] = []
    for w in words:
        text, x0, y0, x1, y1 = w[0], w[1], w[2], w[3], w[4]
        if not is_valid_word(text, x0, y0, x1, y1):
            continue
        height = y1 - y0
        center_y = (y0 + y1) / 2
        metrics.append((text, x0, y0, x1, y1, center_y, height))

    # W1: stable sort by (centerY, x0).  JS Array.prototype.sort is stable
    # (ES2019+) and the comparator returns 0 on full ties, so a stable
    # key-sort reproduces it exactly.
    metrics.sort(key=lambda m: (m[5], m[1]))

    # W5 + A5: greedy clustering with order-dependent running means.
    lines: list[_Line] = []
    for cand in metrics:
        c_center, c_height = cand[5], cand[6]
        best_line: _Line | None = None
        best_distance = math.inf
        for line in lines:
            distance = abs(c_center - line.center_y)
            tolerance = max(2.0, min(c_height, line.avg_height) * 0.6)
            # strict '<' on best_distance: the earliest line wins exact ties,
            # matching the reference's scan order (builder.ts:50-62).
            if distance <= tolerance and distance < best_distance:
                best_distance = distance
                best_line = line
        if best_line is None:
            lines.append(_Line(c_center, c_height, cand))
            continue
        best_line.words.append(cand)
        count = len(best_line.words)
        # exact op order of builder.ts:74-76
        best_line.center_y = (best_line.center_y * (count - 1) + c_center) / count
        best_line.avg_height = (best_line.avg_height * (count - 1) + c_height) / count

    # W2: stable sort of lines by final centroid (builder.ts:79).
    lines.sort(key=lambda ln: ln.center_y)

    output: list[CopyWord] = []
    for line_index, line in enumerate(lines):
        # W3: in-line stable sort by x0 (builder.ts:84).
        line.words.sort(key=lambda m: m[1])

        # A4: sequential mean of word widths (left-fold, same order as
        # Array.prototype.reduce — builder.ts:86-93).
        total = 0.0
        for m in line.words:
            total = total + (m[3] - m[1])
        avg_word_width = total / len(line.words) if line.words else 0.0
        table_gap_threshold = max(avg_word_width * 1.25, line.avg_height * 1.5)

        # W4 + W6 + W7 + W8 (builder.ts:99-121)
        prev = None
        for i, m in enumerate(line.words):
            prefix = ""
            if line_index > 0 and i == 0:
                prefix = "\n"
            elif i > 0:
                gap = max(0.0, m[1] - prev[3])
                if gap > line.avg_height * 0.15:
                    prefix = "\t" if gap >= table_gap_threshold else " "
            output.append(CopyWord(m[0], prefix + m[0], m[1], m[2], m[3], m[4]))
            prev = m

    return output


def page_text(words: Iterable[Word]) -> str:
    """Extracted text of one page: the concatenated prefixed word sequence."""
    return "".join(cw.text for cw in build_copy_friendly_word_sequence(words))
