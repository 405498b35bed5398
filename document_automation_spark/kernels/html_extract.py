"""Deterministic HTML main-content extraction (boilerplate strip).

Fills the slot the reference fills with OCR (/root/reference/src/
gen-sods-doc-image-ray.py:89-95): raw payload bytes → extracted document
text.  Our payloads are Common-Crawl-style HTML, so the kernel is a DOM-ish
boilerplate stripper in the spirit of jusText/trafilatura heuristics:

* whole-subtree drop for non-content tags (script/style/nav/header/footer/
  aside/form/...) and for elements whose class/id matches a boilerplate
  pattern (menu, sidebar, banner, ad, comment, cookie, ...);
* block segmentation at block-level tag boundaries;
* per-block link density: a block whose characters are mostly anchor text
  (> ``MAX_LINK_DENSITY``) is navigation, not content — dropped;
* surviving blocks then flow through the SAME deterministic line pipeline
  as every other payload type: strip each block, drop ad-marker lines,
  concatenate with no separator (``textproc.join_clean_lines``, parity
  /root/reference/src/utils.py:131-162).

Pure stdlib (``html.parser``), no Spark imports, fully deterministic — the
Spark ``mapInPandas`` kernel and the pytest oracle call this same function,
which is what makes per-url output byte-identical by construction.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List

from document_automation_spark.kernels.textproc import join_clean_lines

# Subtrees that never contain main content.
_DROP_TAGS = frozenset(
    {
        "script",
        "style",
        "title",
        "noscript",
        "template",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "button",
        "select",
        "option",
        "textarea",
        "iframe",
        "svg",
        "figure",
        "figcaption",
    }
)

# Tags that delimit text blocks ("lines" for the downstream pipeline).
_BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "article",
        "section",
        "main",
        "body",
        "li",
        "ul",
        "ol",
        "dl",
        "dt",
        "dd",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "table",
        "tr",
        "td",
        "th",
        "blockquote",
        "pre",
        "br",
        "hr",
    }
)

# class/id tokens marking boilerplate containers.
_BOILERPLATE_ATTR = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|sidebar|footer|header|banner|advert|ads?|promo|"
    r"sponsor|comment|breadcrumb|widget|cookie|popup|modal|social|share|"
    r"related|pagination|copyright|disclaimer|subscribe)(?:$|[\s_-])",
    re.IGNORECASE,
)

# A block whose text is more than this fraction anchor text is navigation.
MAX_LINK_DENSITY = 0.5

_WS_RUN = re.compile(r"\s+")

# Void elements: no closing tag, must not be pushed on the drop stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed", "source", "track", "wbr"}
)


class _Block:
    __slots__ = ("chars", "link_chars", "parts")

    def __init__(self) -> None:
        self.chars = 0
        self.link_chars = 0
        self.parts: List[str] = []


class _MainTextParser(HTMLParser):
    """Streaming block collector with subtree-drop and link accounting.

    End tags use matching-pop semantics (pop up to the nearest open tag of
    the same name; a close tag with no open counterpart is ignored), so
    stray ``</script>``/``</div>`` in the wild cannot corrupt the drop or
    anchor state — the failure mode naive pop-on-any-close has."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0  # >0 → inside a dropped subtree
        self._stack: List[tuple] = []  # (tag, dropped) per open element
        self._anchor_depth = 0
        self.blocks: List[_Block] = []
        self._current = _Block()

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        if self._current.parts:
            self.blocks.append(self._current)
            self._current = _Block()

    # -- HTMLParser hooks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        dropped = False
        if tag in _DROP_TAGS:
            dropped = True
        else:
            for name, value in attrs:
                if name in ("class", "id", "role") and value and _BOILERPLATE_ATTR.search(value):
                    dropped = True
                    break
        if tag not in _VOID_TAGS:
            self._stack.append((tag, dropped))
            if dropped:
                self._drop_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _VOID_TAGS:
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for popped_tag, popped_drop in self._stack[i:]:
                    if popped_drop:
                        self._drop_depth -= 1
                    if popped_tag == "a" and self._anchor_depth > 0:
                        self._anchor_depth -= 1
                del self._stack[i:]
                return
        # no matching open tag: stray close, ignored

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth > 0:
            return
        normalized = _WS_RUN.sub(" ", data)
        if not normalized.strip():
            return
        self._current.parts.append(normalized)
        n = len(normalized.strip())
        self._current.chars += n
        if self._anchor_depth > 0:
            self._current.link_chars += n

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def extract_main_text_html(html: str) -> str:
    """HTML → main-content text (deterministic, boilerplate-stripped).

    Returns the separator-free concatenation of surviving blocks, each
    stripped, ad-marker lines dropped (textproc pipeline parity with
    /root/reference/src/utils.py:131-162).
    """
    parser = _MainTextParser()
    parser.feed(html)
    parser.close()

    lines: List[str] = []
    for block in parser.blocks:
        if block.chars == 0:
            continue
        if block.link_chars / block.chars > MAX_LINK_DENSITY:
            continue
        lines.append("".join(block.parts))
    return join_clean_lines(lines)
