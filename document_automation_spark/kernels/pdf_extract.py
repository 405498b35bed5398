"""Deterministic PDF text + layout extraction for binary payloads.

Fills the binary-payload decode slot (the reference decodes image bytes at
/root/reference/src/gen-sods-doc-image-ray.py:76-83; our analogue pulls text
operators out of PDF content streams).  Deterministic, stdlib-only:

* **Content streams**: both uncompressed and **FlateDecode** streams are
  parsed (``zlib`` is stdlib — no external PDF library needed); each
  ``<<dict>> stream … endstream`` block is located, decompressed when its
  dict names ``/FlateDecode``, and scanned for ``BT … ET`` text objects.
  Payloads with no stream framing fall back to a whole-buffer scan.
* **Layout-aware line assembly**: show operators (``(s) Tj``,
  ``[(a) -12 (b)] TJ``) APPEND to the current line; line-move operators
  (``x y Td``, ``x y TD``, ``T*``, and ``Tm`` matrix sets) flush it — so
  text split across multiple show ops on one baseline stays one line,
  matching how real PDF generators emit justified text.
* Encrypted files and other unsupported constructs raise
  ``PdfExtractError`` → the row is quarantined with an ``error`` column by
  the Spark kernel, never failing the task (parity with the broken-image
  tolerance at /root/reference/src/gen-sods-doc-image-ray.py:102-106).

Lines then flow through the same strip → ad-filter → separator-free join
pipeline as HTML blocks (kernels.textproc.join_clean_lines).
"""

from __future__ import annotations

import re
import zlib
from typing import List

from document_automation_spark.kernels.textproc import join_clean_lines

PDF_MAGIC = b"%PDF-"

_STREAM_START = re.compile(
    rb"<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>\s*stream(?:\r\n|\n)",
    re.DOTALL,
)
# direct /Length only: (?!\d) pins the full digit run (no backtracking into
# the lookahead), (?!\s+\d+\s+R) rejects indirect references of ANY
# generation number ('/Length 30 0 R' must not parse as length 3)
_LENGTH = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
# string-aware scan: an 'ET' byte pair INSIDE a (string) literal must not
# terminate the text object ('(NETWORK) Tj' would otherwise cut the page at
# 'N|ET|WORK' and lose everything after it).  The body is consumed as
# complete string literals or single non-'(' bytes, so the lazy ET match
# can only land OUTSIDE a string.  Nested unescaped parens stay unsupported,
# matching the _TOKEN/_ARRAY_STRING grammar.  Known trade (round 6): a
# spec-invalid UNCLOSED '(' inside a text object now fails the whole
# object's match (→ quarantine when nothing else extracts), where the old
# byte-blind regex emitted whatever preceded the first ET — quarantining a
# malformed page beats silently truncating mid-string (pinned by
# tests/test_properties.py::test_unclosed_paren_quarantines).
_TEXT_OBJECT = re.compile(rb"BT((?:\((?:[^()\\]|\\.)*\)|[^(])*?)ET", re.DOTALL)
# one token stream: show ops AND line-move ops, in document order.
# PDF reals allow leading/trailing-dot forms ('.5', '5.', '-.5') — all
# must count as move operands or distinct baselines merge silently.
_NUM = rb"[-+]?(?:\d+\.?\d*|\.\d+)"
_TOKEN = re.compile(
    rb"\((?P<s>(?:[^()\\]|\\.)*)\)\s*Tj"  # (string) Tj
    rb"|\[(?P<arr>(?:[^\]\\]|\\.)*)\]\s*TJ"  # [(a) -12 (b)] TJ
    # PDF lexing permits '20Td' — no delimiter between the LAST operand and
    # the operator (numbers self-terminate at a non-number char), so the
    # trailing separator is \s* where \s+ would silently drop the move op
    # and merge distinct baselines into one line
    rb"|(?P<move>" + _NUM + rb"\s+" + _NUM + rb"\s*T[dD]"  # x y Td / TD
    rb"|T\*"  # next line
    rb"|(?:" + _NUM + rb"\s+){5}" + _NUM + rb"\s*Tm)",  # text matrix reset
    re.DOTALL,
)
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
    """Payload is not a parseable PDF."""


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


def _content_chunks(payload: bytes) -> List[bytes]:
    """Every content stream, FlateDecode-decompressed where declared.

    Stream data is delimited by the dict's ``/Length`` when it is a direct
    integer (the spec's framing — binary data may legally contain
    ``endstream`` or end with ``\\r``, so byte-scanning alone is wrong);
    only without a usable Length do we fall back to scanning for the
    ``endstream`` keyword.  Bytes OUTSIDE every stream are scanned too
    (minimal/fixture PDFs put BT…ET at top level; mixed payloads must not
    lose it), so with no stream framing at all the whole buffer is the one
    chunk."""
    chunks: List[bytes] = []
    spans: List[tuple] = []  # (start, end) of each consumed stream region
    consumed_until = 0  # guards against <<dict>>stream look-alikes INSIDE
    # a stream body producing overlapping spans
    for m in _STREAM_START.finditer(payload):
        if m.start() < consumed_until:
            continue
        start = m.end()
        lmatch = _LENGTH.search(m.group("dict"))
        data = None
        if lmatch is not None:
            length = int(lmatch.group(1))
            tail = payload[start + length : start + length + 16]
            if tail.lstrip(b"\r\n ").startswith(b"endstream"):
                data = payload[start : start + length]
        data_end = None
        if data is not None:
            data_end = start + len(data)
        else:  # no direct /Length (or it didn't line up)
            end = payload.find(b"endstream", start)
            if end < 0:
                if b"/Length" not in m.group("dict"):
                    # no /Length token (direct OR indirect) AND no
                    # endstream: a framing look-alike (e.g. '<<x>>stream'
                    # inside page TEXT), not a truncated content stream —
                    # real stream dicts carry /Length.  Skip it so the
                    # surrounding text keeps flowing to the whole-buffer
                    # scan.
                    continue
                # declared /Length but truncated body: its binary tail must
                # never be scanned as text — consume to end of payload
                spans.append((m.start(), len(payload)))
                consumed_until = len(payload)
                break
            data = payload[start:end]
            data_end = end
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith(b"\n") or data.endswith(b"\r"):
                data = data[:-1]
        if b"FlateDecode" in m.group("dict"):
            try:
                data = zlib.decompress(data)
            except zlib.error as err:
                raise PdfExtractError(f"bad FlateDecode stream: {err}") from err
        chunks.append(data)
        spans.append((m.start(), data_end))
        consumed_until = data_end
    if not spans:
        return [payload]
    # everything between/around streams (object dicts, top-level BT…ET)
    outside = bytearray()
    prev = 0
    for s, e in spans:
        outside += payload[prev:s]
        prev = e
    outside += payload[prev:]
    chunks.append(bytes(outside))
    return chunks


def _lines_from_text_object(body: bytes) -> List[str]:
    """Show ops accumulate onto the current baseline; move ops flush it."""
    lines: List[str] = []
    current: List[str] = []

    def flush() -> None:
        if current:
            lines.append("".join(current))
            current.clear()

    for tok in _TOKEN.finditer(body):
        if tok.group("move") is not None:
            flush()
        elif tok.group("s") is not None:
            current.append(_decode_pdf_string(tok.group("s")))
        else:
            current.append(
                "".join(
                    _decode_pdf_string(m.group("s"))
                    for m in _ARRAY_STRING.finditer(tok.group("arr"))
                )
            )
    flush()
    return lines


def extract_text_pdf(payload: bytes) -> str:
    """PDF bytes → extracted text through the deterministic line pipeline."""
    if not looks_like_pdf(payload):
        raise PdfExtractError("missing %PDF- magic")
    if b"/Encrypt" in payload:
        raise PdfExtractError("encrypted PDF not supported")

    lines: List[str] = []
    for chunk in _content_chunks(payload):
        for text_obj in _TEXT_OBJECT.finditer(chunk):
            lines.extend(_lines_from_text_object(text_obj.group(1)))
    if not lines:
        raise PdfExtractError("no text operators found")
    return join_clean_lines(lines)
