"""Hyphenation repair (north_star: "PDF layout parsing with word-box
ordering, column detection, hyphenation repair").

The reference engine stops at the separator-classified word sequence
(``builder.ts:113-121``); hyphenation repair is the one extraction step the
north_star adds on top.  It is therefore an *optional post-pass* over the
already byte-identical layout output — OFF in the byte-identity core, exposed
as its own operator.

Rule (deterministic, pure string rewrite): a line ending in an
ASCII-hyphenated word fragment is joined with the first word of the next
line when that word starts with a lowercase letter — the classic
"continuation is lowercase ⇒ soft line-break hyphen" heuristic used by
pdftotext-style extractors.  The hyphen is removed and the two fragments are
fused; the rest of the second line is preserved.
"""

from __future__ import annotations

import re

# "frag-\ncontinuation" where frag ends with a letter and continuation starts
# lowercase.  \n is the line separator emitted by layout W6.  The groups
# capture the fragments so exception handling can test the fused candidate.
_HYPHEN_BREAK = re.compile(r"([A-Za-z]+)-\n([a-z]+)")


def repair_hyphenation(text: str,
                       exceptions: frozenset[str] | None = None) -> str:
    """Fuse soft line-break hyphens: ``"exam-\\nple" -> "example"``.

    Hard hyphens (continuation starts with uppercase/digit, e.g.
    ``"Jean-\\nPaul"``) are preserved with the line break intact.

    ``exceptions``: lowercase hyphenated compounds (e.g. from the
    ``hyphen_exceptions.txt`` executor asset, ``sources/assets.py``) that
    are legitimately hyphenated — ``"self-\\ncontained"`` joins to
    ``"self-contained"`` (line break removed, hyphen KEPT) instead of
    fusing to ``"selfcontained"``.
    """
    if not exceptions:
        return _HYPHEN_BREAK.sub(r"\1\2", text)

    def repl(m: re.Match) -> str:
        joined = f"{m.group(1)}-{m.group(2)}"
        if joined.lower() in exceptions:
            return joined
        return m.group(1) + m.group(2)

    return _HYPHEN_BREAK.sub(repl, text)
