"""Minimal WARC/1.0 reader + writer (Common-Crawl container format).

Pure deterministic kernels (no Spark imports): the real Common-Crawl input
is WARC files, and Spark has no native WARC source — this is exactly the
custom-scan case (`sources/warc.py` distributes files, each task parses
its slice with these kernels).

Scope: the subset Common-Crawl 'response' processing needs —

* record framing per WARC/1.0: header block (CRLF-separated), blank line,
  ``Content-Length`` bytes of body, two CRLFs;
* ``warcinfo``/``request``/``metadata`` records are skipped; ``response``
  records have their HTTP/1.1 response envelope stripped (status line +
  headers) so the returned payload is the raw entity body (HTML/PDF bytes
  — what kernels.page.extract_page consumes);
* malformed records terminate the parse of that FILE slice gracefully
  (records already parsed are returned; the error is surfaced per file by
  the source, quarantine-style).

The writer exists for fixtures and tests: deterministic output, no
wall-clock (caller provides timestamps).
"""

from __future__ import annotations

import datetime as dt
from typing import List, NamedTuple, Optional, Tuple

_CRLF = b"\r\n"
_BLOCK_END = b"\r\n\r\n"


class WarcRecord(NamedTuple):
    uri: Optional[str]
    warc_date: Optional[dt.datetime]
    record_type: str
    http_status: Optional[int]
    payload: bytes


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(_CRLF)[1:]:  # first line = version / status line
        if b":" in line:
            key, _, value = line.partition(b":")
            headers[key.strip().lower().decode("latin-1")] = value.strip().decode("latin-1")
    return headers


def _parse_warc_date(value: Optional[str]) -> Optional[dt.datetime]:
    if not value:
        return None
    try:
        return dt.datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def iter_warc_records(data: bytes) -> Tuple[List[WarcRecord], Optional[str]]:
    """Parse a WARC byte buffer → (records, error_or_None).

    Returns whatever parsed cleanly before the first framing error."""
    records: List[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate record separators / trailing newlines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        header_end = data.find(_BLOCK_END, pos)
        if header_end == -1:
            return records, "unterminated WARC header block"
        header_block = data[pos:header_end]
        if not header_block.startswith(b"WARC/"):
            return records, "missing WARC/ version line"
        headers = _parse_headers(header_block)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return records, "missing or invalid Content-Length"
        body_start = header_end + len(_BLOCK_END)
        body_end = body_start + length
        if body_end > n:
            return records, "truncated record body"
        body = data[body_start:body_end]
        pos = body_end

        record_type = headers.get("warc-type", "unknown")
        status: Optional[int] = None
        payload = body
        if record_type == "response" and body.startswith(b"HTTP/"):
            # response records carry an HTTP envelope to strip; conversion
            # (WET) and other record types are raw payloads
            http_end = body.find(_BLOCK_END)
            if http_end != -1:
                status_line = body.split(_CRLF, 1)[0].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    status = int(status_line[1])
                payload = body[http_end + len(_BLOCK_END) :]
        records.append(
            WarcRecord(
                uri=headers.get("warc-target-uri"),
                warc_date=_parse_warc_date(headers.get("warc-date")),
                record_type=record_type,
                http_status=status,
                payload=payload,
            )
        )
    return records, None


def build_warc(pages: List[dict]) -> bytes:
    """Deterministic WARC/1.0 bytes from pages rows (fixture writer).

    Each page dict needs url, warc_ts (datetime) and html (bytes); a
    leading warcinfo record and HTTP response envelopes are included so
    the reader's skipping/stripping paths are exercised."""
    out = bytearray()

    def record(headers: List[Tuple[str, str]], body: bytes) -> None:
        out.extend(b"WARC/1.0\r\n")
        for key, value in headers + [("Content-Length", str(len(body)))]:
            out.extend(f"{key}: {value}\r\n".encode("latin-1"))
        out.extend(_CRLF)
        out.extend(body)
        out.extend(_BLOCK_END)

    record([("WARC-Type", "warcinfo")], b"software: document_automation_spark fixture\r\n")
    for page in pages:
        stamp = page["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(page['html'])}\r\n".encode()
            + _CRLF
            + page["html"]
        )
        record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", page["url"]),
                ("WARC-Date", stamp),
            ],
            bytes(body),
        )
    return bytes(out)


def build_wet(pages: List[dict]) -> bytes:
    """Deterministic WET bytes (WARC/1.0 ``conversion`` records) from pages
    rows — the Common-Crawl EXTRACTED-TEXT container (*.warc.wet): payload
    is the plain text, no HTTP envelope.  Each page dict needs url,
    warc_ts (datetime) and text (str)."""
    out = bytearray()

    def record(headers: List[Tuple[str, str]], body: bytes) -> None:
        out.extend(b"WARC/1.0\r\n")
        for key, value in headers + [("Content-Length", str(len(body)))]:
            out.extend(f"{key}: {value}\r\n".encode("latin-1"))
        out.extend(_CRLF)
        out.extend(body)
        out.extend(_BLOCK_END)

    record([("WARC-Type", "warcinfo")], b"software: document_automation_spark fixture\r\n")
    for page in pages:
        stamp = page["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        record(
            [
                ("WARC-Type", "conversion"),
                ("WARC-Target-URI", page["url"]),
                ("WARC-Date", stamp),
                ("Content-Type", "text/plain"),
            ],
            page["text"].encode("utf-8"),
        )
    return bytes(out)
