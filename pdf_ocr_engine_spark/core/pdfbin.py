"""Deterministic PDF word-box container codec.

The pipeline input is Common-Crawl-style rows with an opaque ``html: binary``
payload (BASELINE.json ``input_hint``).  Rows whose payload passes the PDF
magic-byte sniff (``%PDF-`` — reference ``src/app/api/convert/route.ts:9-12``)
carry a *deterministic word-box record* per page: the decoded equivalent of
the reference's Tesseract block tree after the 4-level flatten
(``src/lib/ocr/ocr.ts:5-39``).  Real OCR (Tesseract) is a nondeterministic
native dependency that a byte-identity contract cannot tolerate; everything
from the flattened word list onward — the reference's actual algorithmic
contribution — is reproduced exactly (see ``core/layout.py``).

Container format (all bytes):

    %PDF-1.7\\n
    %WBOX1\\n
    <one-line JSON document>\\n
    %%EOF

JSON document::

    {
      "page_count": <declared page count, reference getPageCount>,
      "pages": [
        {"page_no": 1, "width": 612.0, "height": 792.0, "has_text": false,
         "words": [[text, x0, y0, x1, y1, confidence], ...]},
        ...
      ]
    }

``page_count`` is declared independently of ``len(pages)`` so fixtures can
exercise the reference's page-extraction-mismatch invariant
(``src/lib/ocr/index.ts:109-119``).  ``has_text`` drives the OCR-skip
predicate (``index.ts:94-97``).  NaN coordinates are encoded as JSON ``NaN``
(both ends are this codec, so the non-standard literal is safe) to exercise
the validity filter (``builder.ts:25``).
"""

from __future__ import annotations

import json
import math
from typing import Any

MAGIC = b"%PDF-"
_HEADER = b"%PDF-1.7\n%WBOX1\n"
_FOOTER = b"\n%%EOF"

HTML_MAGICS = (b"<!doctype", b"<html", b"<head", b"<body")


def encode_pdf(
    pages: list[dict[str, Any]],
    page_count: int | None = None,
) -> bytes:
    """Encode page word-box records into the binary container.

    Each page dict: ``{"page_no", "width", "height", "has_text", "words"}``
    with ``words`` a list of ``(text, x0, y0, x1, y1[, confidence])``.
    """
    norm_pages = []
    for p in pages:
        words = [
            [w[0], float(w[1]), float(w[2]), float(w[3]), float(w[4]),
             float(w[5]) if len(w) > 5 else 90.0]
            for w in p.get("words", [])
        ]
        norm_pages.append(
            {
                "page_no": int(p["page_no"]),
                "width": float(p.get("width", 612.0)),
                "height": float(p.get("height", 792.0)),
                "has_text": bool(p.get("has_text", False)),
                "words": words,
            }
        )
    doc = {
        "page_count": len(pages) if page_count is None else int(page_count),
        "pages": norm_pages,
    }
    payload = json.dumps(doc, ensure_ascii=False, separators=(",", ":"))
    return _HEADER + payload.encode("utf-8") + _FOOTER


def sniff_kind(data: bytes | None) -> str:
    """Batched byte-stream sniff (north_star): classify a payload as
    ``pdf`` / ``html`` / ``other`` from its leading bytes.

    PDF test mirrors ``hasPdfHeader`` (reference ``route.ts:9-12``):
    first five bytes equal ``%PDF-``.
    """
    if not data:
        return "other"
    if data[:5] == MAGIC:
        return "pdf"
    head = data[:256].lstrip(b" \t\r\n\f").lower()
    if head.startswith(HTML_MAGICS):
        return "html"
    return "other"


def decode_pdf(data: bytes) -> dict[str, Any]:
    """Decode the word-box container.  Raises ``ValueError`` on malformed
    input (the pipeline maps this to ``status='decode_error'`` — errors are
    data, not exceptions: reference ``index.ts:158-164``)."""
    if data[:5] != MAGIC:
        raise ValueError("not a PDF payload (missing %PDF- magic)")
    if not data.startswith(_HEADER):
        raise ValueError("unsupported PDF flavor (no WBOX1 word-box record)")
    body = data[len(_HEADER):]
    if body.endswith(_FOOTER):
        body = body[: -len(_FOOTER)]
    try:
        doc = json.loads(body.decode("utf-8"))
    except Exception as exc:  # noqa: BLE001 - becomes a status column
        raise ValueError(f"corrupt word-box record: {exc}") from exc
    if not isinstance(doc, dict) or "pages" not in doc or "page_count" not in doc:
        raise ValueError("corrupt word-box record: missing keys")
    for p in doc["pages"]:
        # JSON null coordinates (from non-finite floats round-tripped through
        # strict encoders) decode to NaN so the validity filter sees them.
        for w in p.get("words") or []:
            for i in range(1, 5):
                if w[i] is None:
                    w[i] = math.nan
    return doc
