"""Deterministic minimal PDF text extraction for binary payloads.

Fills the binary-payload decode slot (the reference decodes image bytes at
/root/reference/src/gen-sods-doc-image-ray.py:76-83; our analogue pulls text
operators out of PDF content streams).  Scope is deliberately narrow and
fully deterministic:

* Only UNCOMPRESSED content streams are parsed: we scan ``BT ... ET`` text
  objects for ``(string) Tj`` and ``[(a) -12 (b)] TJ`` show operators and
  decode standard PDF string escapes.  This covers the synthetic fixture
  PDFs (FIXTURES.md §1) end-to-end.
* Anything else (FlateDecode streams, encrypted files, ...) raises
  ``PdfExtractError`` → the row is quarantined with an ``error`` column by
  the Spark kernel, never failing the task (parity with the broken-image
  tolerance at /root/reference/src/gen-sods-doc-image-ray.py:102-106).

Real-world PDF layout parsing would plug in here behind the same function
signature (bytes → lines); the heavy libraries are not in this container,
so the deterministic parser doubles as the test double.

Each ``Tj``/``TJ`` operator yields one line; lines then flow through the
same strip → ad-filter → separator-free join pipeline as HTML blocks.
"""

from __future__ import annotations

import re
from typing import List

from document_automation_spark.kernels.textproc import join_clean_lines

PDF_MAGIC = b"%PDF-"

_TEXT_OBJECT = re.compile(rb"BT(.*?)ET", re.DOTALL)
# (string) Tj  |  [(a) -12 (b)] TJ — strings with balanced escapes.
_SHOW_OP = re.compile(rb"\((?P<s>(?:[^()\\]|\\.)*)\)\s*Tj|\[(?P<arr>(?:[^\]\\]|\\.)*)\]\s*TJ", re.DOTALL)
_ARRAY_STRING = re.compile(rb"\((?P<s>(?:[^()\\]|\\.)*)\)", re.DOTALL)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


class PdfExtractError(ValueError):
    """Payload is not a parseable (uncompressed) PDF."""


def looks_like_pdf(payload: bytes) -> bool:
    return payload[: len(PDF_MAGIC)] == PDF_MAGIC


def _decode_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i : i + 1]
        if b == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: swallow
            continue
        out += b
        i += 1
    return out.decode("utf-8", errors="replace")


def extract_text_pdf(payload: bytes) -> str:
    """PDF bytes → extracted text through the deterministic line pipeline."""
    if not looks_like_pdf(payload):
        raise PdfExtractError("missing %PDF- magic")
    if b"FlateDecode" in payload or b"/Encrypt" in payload:
        raise PdfExtractError("compressed or encrypted PDF not supported")

    lines: List[str] = []
    for text_obj in _TEXT_OBJECT.finditer(payload):
        for op in _SHOW_OP.finditer(text_obj.group(1)):
            if op.group("s") is not None:
                lines.append(_decode_pdf_string(op.group("s")))
            else:
                parts = [_decode_pdf_string(m.group("s")) for m in _ARRAY_STRING.finditer(op.group("arr"))]
                lines.append("".join(parts))
    if not lines:
        raise PdfExtractError("no text operators found")
    return join_clean_lines(lines)
