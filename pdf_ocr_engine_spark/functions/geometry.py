"""Span geometry — the reference's coordinate transforms as column exprs.

The reference draws each OCR word back onto the PDF page
(``src/lib/ocr/builder.ts:124-204``); these are its C1-C3 scalar transforms
(SURVEY.md §2.7) expressed as pure Catalyst column arithmetic over exploded
span rows — whole-stage codegen, no Python:

* C1 scale factors: ``scaleX = pdf_w/img_w``, ``scaleY = pdf_h/img_h``
  (``builder.ts:155-156``);
* C2 y-axis flip + baseline offset: image coords are top-origin, PDF
  bottom-origin, and ``drawText`` anchors at the baseline ≈ 20% above the
  bbox bottom: ``y = pdf_h - y1*scaleY + 0.2*wordH`` (``builder.ts:165-168``;
  rationale in the reference's BUGFIXES.md:119-146);
* C3 font-size fit: scale 12pt so the text fills the box width, cap at 90%
  of box height, floor 4, draw only if >1 (``builder.ts:171-193``).  The
  12pt text width needs a font metric; callers pass ``text_width_at_12``
  (e.g. from real font metrics); :func:`approx_text_width_at_12` supplies a
  deterministic Helvetica-like approximation (0.6 em average advance).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scale_x(pdf_w: Column, img_w: Column) -> Column:
    """C1: horizontal image→PDF scale (``builder.ts:155``)."""
    return pdf_w / img_w


def scale_y(pdf_h: Column, img_h: Column) -> Column:
    """C1: vertical image→PDF scale (``builder.ts:156``)."""
    return pdf_h / img_h


def pdf_x(x0: Column, sx: Column) -> Column:
    """PDF x of a span (``builder.ts:164``)."""
    return x0 * sx


def pdf_y(y0: Column, y1: Column, sy: Column, pdf_h: Column) -> Column:
    """C2: y-flip + 20% baseline offset (``builder.ts:165-168``)."""
    word_h = (y1 - y0) * sy
    return pdf_h - (y1 * sy) + word_h * 0.2


def approx_text_width_at_12(raw: Column) -> Column:
    """Deterministic stand-in font metric: 0.6 em average advance at 12 pt.
    Swap for real ``font.widthOfTextAtSize`` metrics when embedding fonts."""
    return F.length(raw) * (0.6 * 12.0)


def font_size_fit(x0: Column, x1: Column, y0: Column, y1: Column,
                  sx: Column, sy: Column,
                  text_width_at_12: Column) -> Column:
    """C3: fit 12pt to the box width, cap at 0.9*height, floor 4
    (``builder.ts:171-188``).  Returns NULL where the reference skips the
    word entirely (non-positive width/height — F9 draw-eligibility)."""
    word_w = (x1 - x0) * sx
    word_h = (y1 - y0) * sy
    fitted = F.least((word_w / text_width_at_12) * 12.0, word_h * 0.9)
    size = F.greatest(fitted, F.lit(4.0))
    eligible = (text_width_at_12 > 0) & (word_w > 0) & (word_h > 0)
    return F.when(eligible, size)


def drawable(font_size: Column, raw: Column) -> Column:
    """F9: draw iff ``fontSize > 1`` and the raw text is non-blank
    (``builder.ts:189``)."""
    return font_size.isNotNull() & (font_size > 1.0) & (F.trim(raw) != "")


def positioned_spans(spans_df, pdf_w=612.0, pdf_h=792.0,
                     img_w: Column | None = None,
                     img_h: Column | None = None):
    """Convenience: add (x, y, font_size, drawable) to an exploded span
    DataFrame with columns ``raw, x0, y0, x1, y1`` (+ optional image dims).
    Defaults assume image coords already in PDF points (scale 1)."""
    sx = scale_x(F.lit(float(pdf_w)), img_w) if img_w is not None else F.lit(1.0)
    sy = scale_y(F.lit(float(pdf_h)), img_h) if img_h is not None else F.lit(1.0)
    tw = approx_text_width_at_12(F.col("raw"))
    fs = font_size_fit(F.col("x0"), F.col("x1"), F.col("y0"), F.col("y1"),
                       sx, sy, tw)
    return (spans_df
            .withColumn("x", pdf_x(F.col("x0"), sx))
            .withColumn("y", pdf_y(F.col("y0"), F.col("y1"), sy,
                                   F.lit(float(pdf_h))))
            .withColumn("font_size", fs)
            .withColumn("drawable", drawable(fs, F.col("raw"))))
