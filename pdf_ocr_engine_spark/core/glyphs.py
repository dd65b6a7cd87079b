"""Simple-font encodings + glyph-name resolution for the real-PDF parser.

A huge share of real-world PDFs use simple fonts with an ``/Encoding``
(WinAnsiEncoding / MacRomanEncoding / StandardEncoding), frequently with a
``/Differences`` array, and **no** ``/ToUnicode`` CMap — before this module
their text came back as raw Latin-1 byte values with ``status='ok'``
(silently wrong characters).  The reference gets full encoding resolution
for free from pdf.js ``getTextContent()``
(``/root/reference/src/lib/ocr/extractor.ts:78-93``); this is the
deterministic stdlib equivalent, built from the public ISO 32000-1 Annex D
tables and the public Adobe Glyph List convention:

* **WinAnsiEncoding** — identical to Windows code page 1252 for every code
  both define (cp1252's undefined holes 0x81/0x8D/0x8F/0x90/0x9D are
  undefined in WinAnsi too), so the table derives from Python's ``cp1252``
  codec directly.
* **MacRomanEncoding** — Python's ``mac_roman`` codec with Adobe's one
  deviation: code 0xDB is ``currency`` (U+00A4) in the PDF table, not the
  Euro Apple later placed there.
* **StandardEncoding** — ASCII with Adobe's classic quirks (0x27 →
  quoteright, 0x60 → quoteleft) plus the upper punctuation/ligature range,
  written out literally from Annex D.
* **/Differences** — arrays of ``code /name /name …`` runs; names resolve
  through an Adobe-Glyph-List subset covering Latin-1, typographic
  punctuation, and the standard ligatures, plus the algorithmic
  ``uniXXXX`` / ``uXXXX[XX]`` hex forms.  Unresolvable names fall back to
  U+FFFD and are COUNTED (encoding-fallback lineage counter) so corpus
  quality drift is observable instead of silent.
"""

from __future__ import annotations

__all__ = [
    "AGL",
    "MAC_ROMAN",
    "STANDARD",
    "WIN_ANSI",
    "base_encoding_map",
    "glyph_to_unicode",
]


def _codec_table(codec: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for code in range(32, 256):
        try:
            ch = bytes([code]).decode(codec)
        except UnicodeDecodeError:
            continue
        out[code] = ch
    return out


#: WinAnsiEncoding (ISO 32000-1 Annex D.2) == cp1252 on all defined codes.
WIN_ANSI: dict[int, str] = _codec_table("cp1252")

#: MacRomanEncoding: Apple's table except 0xDB stays ``currency`` in Adobe's.
MAC_ROMAN: dict[int, str] = {**_codec_table("mac_roman"), 0xDB: "¤"}

#: StandardEncoding: ASCII + Adobe quirks + the Annex D upper range.
STANDARD: dict[int, str] = {c: chr(c) for c in range(32, 127)}
STANDARD.update({
    0x27: "’",   # quoteright
    0x60: "‘",   # quoteleft
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
    0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
    0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
    0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ",
    0xB1: "–", 0xB2: "†", 0xB3: "‡", 0xB4: "·",
    0xB6: "¶", 0xB7: "•", 0xB8: "‚", 0xB9: "„",
    0xBA: "”", 0xBB: "»", 0xBC: "…", 0xBD: "‰",
    0xBF: "¿",
    0xC1: "`", 0xC2: "´", 0xC3: "ˆ", 0xC4: "˜",
    0xC5: "¯", 0xC6: "˘", 0xC7: "˙", 0xC8: "¨",
    0xCA: "˚", 0xCB: "¸", 0xCD: "˝", 0xCE: "˛",
    0xCF: "ˇ", 0xD0: "—",
    0xE1: "Æ", 0xE3: "ª", 0xE8: "Ł", 0xE9: "Ø",
    0xEA: "Œ", 0xEB: "º",
    0xF1: "æ", 0xF5: "ı", 0xF8: "ł", 0xF9: "ø",
    0xFA: "œ", 0xFB: "ß",
})


def _build_agl() -> dict[str, str]:
    """Adobe-Glyph-List subset: every name reachable from the Annex D
    encodings plus the common typographic/ligature names Differences
    arrays use in the wild."""
    agl: dict[str, str] = {}
    # ASCII letters/digits name themselves via words; letters literally
    for ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
        agl[ch] = ch
    agl.update({
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
        "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
        "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
        "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
        "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
        "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
        "backslash": "\\", "bracketright": "]", "asciicircum": "^",
        "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~",
    })
    # Latin-1 supplement (names per AGL)
    agl.update({
        "exclamdown": "¡", "cent": "¢", "sterling": "£",
        "currency": "¤", "yen": "¥", "brokenbar": "¦",
        "section": "§", "dieresis": "¨", "copyright": "©",
        "ordfeminine": "ª", "guillemotleft": "«",
        "logicalnot": "¬", "registered": "®", "macron": "¯",
        "degree": "°", "plusminus": "±", "twosuperior": "²",
        "threesuperior": "³", "acute": "´", "mu": "µ",
        "paragraph": "¶", "periodcentered": "·",
        "cedilla": "¸", "onesuperior": "¹",
        "ordmasculine": "º", "guillemotright": "»",
        "onequarter": "¼", "onehalf": "½",
        "threequarters": "¾", "questiondown": "¿",
        "multiply": "×", "divide": "÷",
        "nbspace": " ", "softhyphen": "­",
    })
    # accented Latin-1 letters: derive names algorithmically (AGL names are
    # base letter + accent suffix, e.g. Adieresis, eacute, ntilde)
    accents = {
        "grave": "̀", "acute": "́", "circumflex": "̂",
        "tilde": "̃", "dieresis": "̈", "ring": "̊",
        "cedilla": "̧", "caron": "̌", "breve": "̆",
        "macron": "̄", "dotaccent": "̇", "ogonek": "̨",
        "hungarumlaut": "̋", "slash": "̸",
    }
    import unicodedata
    for cp in list(range(0xC0, 0x100)) + list(range(0x100, 0x180)):
        ch = chr(cp)
        decomp = unicodedata.normalize("NFD", ch)
        if len(decomp) == 2 and decomp[0].isalpha():
            base, mark = decomp[0], decomp[1]
            for name, cmb in accents.items():
                if cmb == mark and base in agl:
                    agl.setdefault(base + name, ch)
    agl.update({
        "AE": "Æ", "ae": "æ", "OE": "Œ", "oe": "œ",
        "Oslash": "Ø", "oslash": "ø", "Eth": "Ð",
        "eth": "ð", "Thorn": "Þ", "thorn": "þ",
        "germandbls": "ß", "Lslash": "Ł", "lslash": "ł",
        "dotlessi": "ı", "Scaron": "Š", "scaron": "š",
        "Zcaron": "Ž", "zcaron": "ž", "Ydieresis": "Ÿ",
    })
    # typographic punctuation + ligatures + symbols
    agl.update({
        "quoteleft": "‘", "quoteright": "’",
        "quotesinglbase": "‚", "quotedblleft": "“",
        "quotedblright": "”", "quotedblbase": "„",
        "dagger": "†", "daggerdbl": "‡", "bullet": "•",
        "ellipsis": "…", "perthousand": "‰",
        "guilsinglleft": "‹", "guilsinglright": "›",
        "endash": "–", "emdash": "—", "minus": "−",
        "fraction": "⁄", "florin": "ƒ", "fi": "ﬁ",
        "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
        "Euro": "€", "trademark": "™", "circumflex": "ˆ",
        "tilde": "˜", "breve": "˘", "dotaccent": "˙",
        "ring": "˚", "hungarumlaut": "˝", "ogonek": "˛",
        "caron": "ˇ", "apple": "", "notequal": "≠",
        "infinity": "∞", "lessequal": "≤",
        "greaterequal": "≥", "partialdiff": "∂",
        "summation": "∑", "product": "∏", "pi": "π",
        "integral": "∫", "Omega": "Ω", "radical": "√",
        "approxequal": "≈", "Delta": "Δ", "lozenge": "◊",
        "fraction1": "⁄",
    })
    return agl


AGL: dict[str, str] = _build_agl()

_BASE_ENCODINGS: dict[str, dict[int, str]] = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "StandardEncoding": STANDARD,
    # MacExpertEncoding is ornamental figures — map what we can't, count
    # the fallback upstream; an empty base keeps Differences still applied.
    "MacExpertEncoding": {},
}


def base_encoding_map(name: str | None) -> dict[int, str] | None:
    """Code→Unicode table for a base-encoding NAME; None when unknown
    (caller keeps its default and counts the fallback)."""
    if name is None:
        return None
    table = _BASE_ENCODINGS.get(str(name))
    return dict(table) if table is not None else None


def glyph_to_unicode(name: str) -> str | None:
    """Resolve one glyph name per the public AGL algorithm: direct AGL
    lookup, then ``uniXXXX``/``uXXXX[XX]`` hex forms; None when the name is
    not resolvable (e.g. ``gNN`` subset glyphs without meaning)."""
    got = AGL.get(name)
    if got is not None:
        return got
    if name.startswith("uni") and len(name) >= 7:
        try:
            cps = [int(name[i:i + 4], 16) for i in range(3, len(name) - 3, 4)]
            return "".join(chr(c) for c in cps)
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
            return chr(cp) if cp < 0x110000 else None
        except ValueError:
            return None
    return None
