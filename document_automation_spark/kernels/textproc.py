"""Deterministic text-processing kernels (byte-exact contract).

Re-specified from the reference's pure-Python text kernels so that our Spark
job reproduces the observable output byte-for-byte per url.  Parity targets
(behavior only — implementation is our own):

* passage split with overlap      — /root/reference/src/utils.py:165-186
* ad-line filter                  — /root/reference/src/utils.py:189-195
* line assembly (block/line runs) — /root/reference/src/utils.py:197-220
* stripped separator-free join    — /root/reference/src/utils.py:131-162
* document min-length gate        — /root/reference/src/gen-sods-doc-image-ray.py:98-99
* link = basename of path         — /root/reference/src/utils.py:313-341

All string offsets/lengths are Python ``str`` code-point based.  Faithfully
reproduced quirks (deliberately NOT "fixed" — they are part of the contract):

1. The split remainder is kept only when ``len(remainder) > min_chars``
   (STRICT >), so up to ``min_chars`` trailing characters can be dropped.
2. A document whose extracted text has ``len(text) <= min_chars`` yields
   ZERO passages (strict > gate).
3. Line assembly never flushes the final line: the trailing (block, line)
   run is silently dropped (reference loop ends without appending).
4. An ad marker ANYWHERE in a line drops the WHOLE line.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

# Defaults mirror the reference CLI defaults
# (/root/reference/src/gen-sods-doc-image-ray.py:292-296).
DEFAULT_MAX_LEN = 500
DEFAULT_OVERLAP = 10
DEFAULT_MIN_CHARS = 5

# Ad-marker substrings (/root/reference/src/utils.py:190).
AD_MARKERS = ("广告", "热门")  # 广告, 热门


class Passage(NamedTuple):
    """One split window of a document's extracted text."""

    content: str
    char_start: int  # code-point offset, inclusive
    char_end: int  # code-point offset, exclusive
    passage_idx: int


def contains_ad(line: str) -> bool:
    """True if any ad marker occurs anywhere in ``line``."""
    return any(marker in line for marker in AD_MARKERS)


def split_passages(
    text: str,
    max_len: int = DEFAULT_MAX_LEN,
    overlap: int = DEFAULT_OVERLAP,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> List[Passage]:
    """Window ``text`` into overlapping passages with character spans.

    Semantics (parity: /root/reference/src/utils.py:165-186):

    * stride = ``max_len - overlap``
    * ``len(text) <= max_len`` → the whole text as a single passage.
    * otherwise ``n = len(text) // stride`` full windows, window ``w``
      covering ``[w*stride, w*stride + max_len)``; then the remainder
      ``[max_len + (n-1)*stride, len)`` is appended IFF strictly longer
      than ``min_chars``.

    The remainder starts exactly where the last full window ends, so the
    remainder (unlike the windows) does not overlap its predecessor.
    """
    n_chars = len(text)
    if n_chars <= max_len:
        return [Passage(text, 0, n_chars, 0)]

    stride = max_len - overlap
    out: List[Passage] = []
    n_windows = n_chars // stride  # >= 1 because n_chars > max_len > stride
    for w in range(n_windows):
        start = w * stride
        end = start + max_len
        out.append(Passage(text[start:end], start, min(end, n_chars), w))

    rem_start = max_len + (n_windows - 1) * stride
    remainder = text[rem_start:]
    if len(remainder) > min_chars:
        out.append(Passage(remainder, rem_start, n_chars, n_windows))
    return out


def assemble_lines(
    words: Sequence[str],
    line_nums: Sequence[int],
    block_nums: Sequence[int],
) -> List[str]:
    """Group word runs into lines keyed by (block, line); drop ad lines.

    Parity: /root/reference/src/utils.py:197-220.  Words with the same
    (block_num, line_num) as their predecessor are concatenated with NO
    separator.  When the key changes, the finished line is kept unless it
    contains an ad marker.  Quirk #3: the FINAL run is never emitted.
    """
    if len(words) != len(line_nums) or len(words) != len(block_nums):
        raise ValueError("words, line_nums and block_nums must align")
    if not words:
        return []

    lines: List[str] = []
    current = words[0]
    for i in range(1, len(words)):
        same_run = block_nums[i] == block_nums[i - 1] and line_nums[i] == line_nums[i - 1]
        if same_run:
            current += words[i]
        else:
            if not contains_ad(current):
                lines.append(current)
            current = words[i]
    # NOTE: `current` (the final run) is deliberately NOT appended — the
    # reference's loop ends without a flush and we match it byte-for-byte.
    return lines


def join_clean_lines(raw_lines: Sequence[str]) -> str:
    """Strip each line, drop ad lines, concatenate with NO separator.

    Parity: the per-line strip→ad-filter→separator-free-join order of
    /root/reference/src/utils.py:131-162 (``''.join`` at :153).
    """
    kept: List[str] = []
    for raw in raw_lines:
        line = raw.strip()
        if not contains_ad(line):
            kept.append(line)
    return "".join(kept)


def link_from_url(url: str) -> str:
    """Basename derivation: the segment after the last '/'.

    Parity: ``path.split('/')[-1]`` at /root/reference/src/utils.py:330.
    """
    return url.split("/")[-1]


def extract_document(
    text: str,
    max_len: int = DEFAULT_MAX_LEN,
    overlap: int = DEFAULT_OVERLAP,
    min_chars: int = DEFAULT_MIN_CHARS,
    split_doc: bool = True,
) -> List[Passage]:
    """Full post-OCR/extraction document processing: gate + optional split.

    Parity: the default ``--split_doc`` branch of
    /root/reference/src/utils.py:316-330 behind the document gate of
    /root/reference/src/gen-sods-doc-image-ray.py:98-99.  A document with
    ``len(text) <= min_chars`` yields NO passages (quirk #2).
    """
    if len(text) <= min_chars:
        return []
    if not split_doc:
        return [Passage(text, 0, len(text), 0)]
    return split_passages(text, max_len=max_len, overlap=overlap, min_chars=min_chars)
