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

# A maximal CHAIN of soft breaks: "frag-\ncont-\ncont…" where each fragment
# ends with a letter and each continuation starts lowercase.  Matching the
# whole chain (not one break at a time) repairs words split across three or
# more lines in one pass — a break-at-a-time consuming regex only fixes
# every other break — and lets exception handling see the full compound.
# \n is the line separator emitted by layout W6.
_HYPHEN_CHAIN = re.compile(r"[A-Za-z]+(?:-\n[a-z]+)+")


def repair_hyphenation(text: str,
                       exceptions: frozenset[str] | None = None) -> str:
    """Fuse soft line-break hyphens: ``"exam-\\nple" -> "example"`` — also
    across chains: ``"super-\\ncali-\\nfragilistic" -> "supercalifragilistic"``.

    Hard hyphens (continuation starts with uppercase/digit, e.g.
    ``"Jean-\\nPaul"``) are preserved with the line break intact.

    ``exceptions``: lowercase hyphenated compounds (e.g. from the
    ``hyphen_exceptions.txt`` executor asset, ``sources/assets.py``) that
    are legitimately hyphenated — ``"self-\\ncontained"`` joins to
    ``"self-contained"`` (line break removed, hyphen KEPT) instead of
    fusing to ``"selfcontained"``.  Multi-part compounds work too: if the
    chain's full hyphen-join (``"mother-in-law"``) is an exception it is
    kept whole; otherwise each adjacent pair is checked, so unknown parts
    fuse while known compounds keep their hyphen.
    """
    if not exceptions:
        return _HYPHEN_CHAIN.sub(lambda m: m.group().replace("-\n", ""),
                                 text)

    def repl(m: re.Match) -> str:
        parts = m.group().split("-\n")
        if "-".join(parts).lower() in exceptions:
            return "-".join(parts)
        out = parts[0]
        for i, part in enumerate(parts[1:], start=1):
            # check the ORIGINAL adjacent pair, not the fused accumulator:
            # in "un-\nself-\ncontained" the pair behind "contained" is
            # "self-contained" even after "un"+"self" fused
            if f"{parts[i - 1]}-{part}".lower() in exceptions:
                out += "-" + part
            else:
                out += part
        return out

    return _HYPHEN_CHAIN.sub(repl, text)
