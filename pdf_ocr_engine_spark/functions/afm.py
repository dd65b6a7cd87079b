"""Helvetica font metrics — the Adobe Core-14 AFM width table (C3).

The reference measures every word with real font metrics before fitting the
invisible text layer (``font.widthOfTextAtSize(word.rawText, 12)``,
``src/lib/ocr/builder.ts:171``, pdf-lib's ``StandardFonts.Helvetica``).
Round 1 approximated that with a flat 0.6-em advance; this module carries the
genuine Helvetica advance widths (units per 1000 em, Latin-1 code points)
from Adobe's published Core-14 ``Helvetica.afm`` — public metrics shipped
with every PostScript/PDF toolchain.

Semantics, identical in all three places that measure text (the Python
writer ``core/pdfwrite.py``, the Catalyst expression
``functions/geometry.helvetica_width_at_12``, and the DuckDB oracle SQL):

* code points 32-126 and 160-255: AFM advance of the Latin-1 glyph;
* undefined control codes (0-31, 127-159): 0 — a word of only these
  measures zero width and is skipped, mirroring the reference's
  ``textWidth <= 0`` guard (builder.ts:174-181);
* code points >= 256: fallback ``FALLBACK_UNITS`` (600).  pdf-lib's
  WinAnsi Helvetica throws on unencodable text; we measure it at a fixed
  deterministic advance instead so mixed-script corpora keep flowing.

Widths are summed in integer units first (order-independent, exact), then
converted once: ``width_at_size = units * size / 1000`` — so the Python,
Spark, and DuckDB sides agree bit-for-bit.
"""

from __future__ import annotations

__all__ = ["HELVETICA_WIDTHS", "FALLBACK_UNITS", "text_width_units",
           "text_width_at"]

FALLBACK_UNITS = 600

# Units per 1000 em, indexed by Latin-1 code point.  0 = undefined glyph.
HELVETICA_WIDTHS: tuple[int, ...] = (
    # 0-31: control, undefined
    *([0] * 32),
    278, 278, 355, 556, 556, 889, 667, 191,   # 32-39  space ! " # $ % & '
    333, 333, 389, 584, 278, 333, 278, 278,   # 40-47  ( ) * + , - . /
    556, 556, 556, 556, 556, 556, 556, 556,   # 48-55  0-7
    556, 556, 278, 278, 584, 584, 584, 556,   # 56-63  8 9 : ; < = > ?
    1015, 667, 667, 722, 722, 667, 611, 778,  # 64-71  @ A B C D E F G
    722, 278, 500, 667, 556, 833, 722, 778,   # 72-79  H I J K L M N O
    667, 778, 722, 667, 611, 722, 667, 944,   # 80-87  P Q R S T U V W
    667, 667, 611, 278, 278, 278, 469, 556,   # 88-95  X Y Z [ \ ] ^ _
    333, 556, 556, 500, 556, 556, 278, 556,   # 96-103 ` a b c d e f g
    556, 222, 222, 500, 222, 833, 556, 556,   # 104-111 h i j k l m n o
    556, 556, 333, 500, 278, 556, 500, 722,   # 112-119 p q r s t u v w
    500, 500, 500, 334, 260, 334, 584,        # 120-126 x y z { | } ~
    # 127-159: control, undefined
    *([0] * 33),
    278, 333, 556, 556, 556, 556, 260, 556,   # 160-167 nbsp ¡ ¢ £ ¤ ¥ ¦ §
    333, 737, 370, 556, 584, 333, 737, 333,   # 168-175 ¨ © ª « ¬ shy ® ¯
    400, 584, 333, 333, 333, 556, 537, 278,   # 176-183 ° ± ² ³ ´ µ ¶ ·
    333, 333, 365, 556, 834, 834, 834, 611,   # 184-191 ¸ ¹ º » ¼ ½ ¾ ¿
    667, 667, 667, 667, 667, 667, 1000, 722,  # 192-199 À Á Â Ã Ä Å Æ Ç
    667, 667, 667, 667, 278, 278, 278, 278,   # 200-207 È É Ê Ë Ì Í Î Ï
    722, 722, 778, 778, 778, 778, 778, 584,   # 208-215 Ð Ñ Ò Ó Ô Õ Ö ×
    778, 722, 722, 722, 722, 667, 667, 611,   # 216-223 Ø Ù Ú Û Ü Ý Þ ß
    556, 556, 556, 556, 556, 556, 889, 500,   # 224-231 à á â ã ä å æ ç
    556, 556, 556, 556, 278, 278, 278, 278,   # 232-239 è é ê ë ì í î ï
    556, 556, 556, 556, 556, 556, 556, 584,   # 240-247 ð ñ ò ó ô õ ö ÷
    611, 556, 556, 556, 556, 500, 556, 500,   # 248-255 ø ù ú û ü ý þ ÿ
)

assert len(HELVETICA_WIDTHS) == 256


def text_width_units(text: str) -> int:
    """Advance width of ``text`` in integer AFM units (per 1000 em)."""
    w = HELVETICA_WIDTHS
    return sum(w[cp] if (cp := ord(c)) < 256 else FALLBACK_UNITS
               for c in text)


def text_width_at(text: str, size: float) -> float:
    """``font.widthOfTextAtSize(text, size)`` (builder.ts:171) with the
    table above: integer unit sum, then one float scale."""
    return text_width_units(text) * size / 1000.0
