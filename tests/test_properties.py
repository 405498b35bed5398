"""Property-based tests (hypothesis) for the byte-exact kernel contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from document_automation_spark.kernels.html_extract import extract_main_text_html
from document_automation_spark.kernels.html_fast import extract_main_text_html_fast
from document_automation_spark.kernels.textproc import (
    contains_ad,
    extract_document,
    join_clean_lines,
    split_passages,
)

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=3000
)


class TestSplitProperties:
    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_spans_reconstruct_exactly(self, text):
        for p in split_passages(text):
            assert text[p.char_start : p.char_end] == p.content

    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_window_invariants(self, text):
        out = split_passages(text)
        assert out, "split always yields at least one window"
        assert out[0].char_start == 0
        for p in out:
            assert len(p.content) <= 500
        # consecutive full windows overlap by exactly 10 chars
        for a, b in zip(out, out[1:]):
            if b.passage_idx < len(text) // 490:  # both full windows
                assert a.char_end - b.char_start == 10
        # at most min_chars trailing characters may be lost
        if len(text) > 500:
            covered_end = max(p.char_end for p in out)
            assert len(text) - covered_end <= 5

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_document_gate(self, text):
        out = extract_document(text)
        if len(text) <= 5:
            assert out == []
        else:
            assert out

    @given(st.lists(st.text(max_size=30), max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_join_clean_lines_never_contains_ads(self, lines):
        joined = join_clean_lines(lines)
        # every surviving stripped line was ad-free; the concatenation can
        # only form a marker across boundaries, never contain a full
        # original ad line
        for line in lines:
            stripped = line.strip()
            if stripped and contains_ad(stripped):
                assert stripped not in joined or not stripped


# HTML fuzz: random interleavings of real tags, text and entities
# (including misnesting, stray close tags, uppercase, comments).  The
# parity contract between the regex tokenizer and the html.parser
# implementation covers well-formed-ish markup; recovery from MALFORMED
# tag syntax (stray quotes inside attr lists, '<a href=x' at EOF) is
# implementation-defined in html.parser itself and intentionally out of
# contract — extraction correctness does not depend on it because the
# Spark job and the pytest oracle share the single kernel function.
_html_fragment = st.one_of(
    st.text(alphabet="abc &;xyz-. \n\t", max_size=20),
    st.sampled_from(
        [
            "<p>", "</p>", "<div class='nav'>", "</div>", "<a href='x'>", "</a>",
            "<br/>", "&amp;", "&lt;", "<script>", "</script>", "<li>", "</li>",
            "<span>", "</span>", "text body ", "广告", "<P CLASS=MENU>", "<!-- c -->",
            "<table>", "<td>", "</td>", "</table>", "<h1>", "</h1>", "</>",
            "<article>", "</article>", "<ul>", "</ul>", "<aside>", "</aside>",
            '<div id="footer-x">', "<b>", "</b>", "&#65;", "热门",
        ]
    ),
)


class TestFastHtmlFuzzParity:
    @given(st.lists(_html_fragment, max_size=40))
    @settings(max_examples=500, deadline=None)
    def test_fast_equals_spec(self, fragments):
        html = "".join(fragments)
        assert extract_main_text_html_fast(html) == extract_main_text_html(html)


class TestPdfProperties:
    """Round-trip fuzz for the PDF kernel: any text we emit through a
    synthesized content stream must come back through extract_text_pdf
    exactly as join_clean_lines of the source lines — compressed or not."""

    lines_strategy = st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )

    @staticmethod
    def _pdf_escape(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def _stream(self, lines):
        shows = "\n".join(f"({self._pdf_escape(ln)}) Tj 0 -14 Td" for ln in lines)
        return f"BT /F1 12 Tf 72 720 Td\n{shows}\nET".encode("utf-8")

    @given(lines_strategy)
    @settings(max_examples=150, deadline=None)
    def test_uncompressed_roundtrip(self, lines):
        from document_automation_spark.kernels.pdf_extract import PdfExtractError, extract_text_pdf

        pdf = b"%PDF-1.4\n" + self._stream(lines) + b"\n%%EOF"
        expected = join_clean_lines(lines)
        try:
            assert extract_text_pdf(pdf) == expected
        except PdfExtractError:
            # legal only when the ad-filter/strip pipeline leaves nothing.
            # (The round-5 hatch tolerated ANY payload containing the word
            # 'stream'; the framing scanner now skips '<<x>>stream'
            # look-alikes that carry neither /Length nor endstream, so the
            # hatch is gone.)
            assert expected == ""

    def test_et_inside_string_regression(self):
        """Round-5 verdict falsifying examples: an 'ET' byte pair inside a
        (string) literal must not terminate the text object."""
        from document_automation_spark.kernels.pdf_extract import extract_text_pdf

        for lines in (
            ["NETWORK news today", "second line"],
            ["", "ET"],
            ["BUDGET and GET and SET offsets"],
            ["has <<x>>stream\ninside", "tail line"],
        ):
            pdf = b"%PDF-1.4\n" + self._stream(lines) + b"\n%%EOF"
            assert extract_text_pdf(pdf) == join_clean_lines(lines)

    def test_unclosed_paren_quarantines(self):
        """Documented trade of the string-aware scanner: a spec-invalid
        UNCLOSED '(' inside a text object fails the whole object (→
        PdfExtractError when nothing else extracts) instead of the old
        silent mid-string truncation at the first ET byte pair."""
        from document_automation_spark.kernels.pdf_extract import (
            PdfExtractError,
            extract_text_pdf,
        )

        pdf = b"%PDF-1.4\nBT (Hello) Tj ( junk ET\n%%EOF"
        try:
            extract_text_pdf(pdf)
            assert False, "expected PdfExtractError"
        except PdfExtractError:
            pass

    @given(lines_strategy)
    @settings(max_examples=150, deadline=None)
    def test_flate_roundtrip_matches_uncompressed(self, lines):
        import zlib

        from document_automation_spark.kernels.pdf_extract import PdfExtractError, extract_text_pdf

        content = self._stream(lines)
        data = zlib.compress(content)
        pdf = (
            b"%PDF-1.4\n4 0 obj<</Length "
            + str(len(data)).encode()
            + b"/Filter/FlateDecode>>stream\n"
            + data
            + b"\nendstream endobj\n%%EOF"
        )
        expected = join_clean_lines(lines)
        try:
            assert extract_text_pdf(pdf) == expected
        except PdfExtractError:
            assert expected == ""
