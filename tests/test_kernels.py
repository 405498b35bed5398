"""Byte-exact golden tests for the pure kernels (SURVEY.md §5 plan).

Every quirk of the reference semantics is pinned here character-by-character
(`assert out == expected` on str/bytes): split window math with the strict->
remainder gate, ad-line drops, the final-line-never-flushed assembly quirk,
separator-free joins, link basename derivation.
"""

from __future__ import annotations

import pytest

from document_automation_spark.kernels import (
    assemble_lines,
    contains_ad,
    extract_document,
    extract_main_text_html,
    extract_text_pdf,
    join_clean_lines,
    link_from_url,
    split_passages,
)
from document_automation_spark.kernels.fingerprint import (
    char_shingles,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
    stable_hash64,
)
from document_automation_spark.kernels.page import extract_page
from document_automation_spark.kernels.pdf_extract import PdfExtractError
from document_automation_spark.kernels.textstats import (
    count_tokens_bpe_ish,
    count_tokens_ws,
    detect_language,
    quality_score,
)


# ---------------------------------------------------------------- split
class TestSplitPassages:
    """Window math parity: /root/reference/src/utils.py:165-186."""

    def test_short_text_single_passage(self):
        out = split_passages("abcdef")
        assert [(p.content, p.char_start, p.char_end) for p in out] == [("abcdef", 0, 6)]

    def test_exact_max_len_single(self):
        text = "x" * 500
        out = split_passages(text)
        assert len(out) == 1
        assert out[0].content == text

    def test_501_drops_last_char(self):
        # n = 501//490 = 1 → one window [0:500]; remainder len 1 ≤ 5 → DROPPED.
        text = "a" * 500 + "Z"
        out = split_passages(text)
        assert len(out) == 1
        assert out[0].content == "a" * 500
        assert "Z" not in "".join(p.content for p in out)

    def test_506_keeps_remainder(self):
        # remainder = text[500:] has len 6 > 5 → kept.
        text = "a" * 500 + "REMAIN"
        out = split_passages(text)
        assert [(p.content, p.char_start, p.char_end) for p in out] == [
            ("a" * 500, 0, 500),
            ("REMAIN", 500, 506),
        ]

    def test_990_two_windows_no_remainder(self):
        # n = 990//490 = 2 → windows [0:500], [490:990]; remainder "" dropped.
        text = "".join(chr(ord("a") + (i % 26)) for i in range(990))
        out = split_passages(text)
        assert len(out) == 2
        assert out[0].content == text[0:500]
        assert out[1].content == text[490:990]
        assert (out[1].char_start, out[1].char_end) == (490, 990)

    def test_996_remainder_kept(self):
        text = "".join(chr(ord("a") + (i % 26)) for i in range(996))
        out = split_passages(text)
        # windows [0:500], [490:990]; remainder [990:996] len 6 > 5 → kept.
        assert len(out) == 3
        assert out[2].content == text[990:996]
        assert (out[2].char_start, out[2].char_end) == (990, 996)

    def test_995_remainder_dropped_strict_gate(self):
        text = "x" * 995
        out = split_passages(text)
        # remainder len 5 is NOT > 5 → dropped (strict gate quirk #1).
        assert len(out) == 2

    def test_overlap_is_ten_chars(self):
        text = "".join(chr(0x4E00 + i % 1000) for i in range(1200))  # CJK
        out = split_passages(text)
        assert out[0].content[-10:] == out[1].content[:10]

    def test_codepoint_spans_reconstruct(self):
        text = "数" * 700 + "据" * 700
        for p in split_passages(text):
            assert text[p.char_start : p.char_end] == p.content

    def test_custom_params(self):
        # max_len 10, overlap 2, min_chars 2 → stride 8; len 21 → n = 2.
        text = "abcdefghijklmnopqrstu"
        out = split_passages(text, max_len=10, overlap=2, min_chars=2)
        # windows [0:10], [8:18]; remainder [18:21] len 3 > 2 → kept.
        assert [p.content for p in out] == ["abcdefghij", "ijklmnopqr", "stu"]
        assert [(p.char_start, p.char_end) for p in out] == [(0, 10), (8, 18), (18, 21)]
        # with min_chars 3 the len-3 remainder fails the STRICT gate.
        assert [p.content for p in split_passages(text, max_len=10, overlap=2, min_chars=3)] == [
            "abcdefghij",
            "ijklmnopqr",
        ]


# ---------------------------------------------------------------- ads / lines
class TestAdsAndLines:
    def test_contains_ad_markers(self):
        assert contains_ad("买广告位")
        assert contains_ad("热门推荐")
        assert not contains_ad("普通内容 ad advert")  # latin 'ad' is NOT a marker

    def test_join_clean_lines_strips_and_drops(self):
        # strip → ad filter → separator-free join (utils.py:131-162 parity).
        out = join_clean_lines(["  hello ", "限时广告投放", " world", "热门榜单"])
        assert out == "helloworld"

    def test_assemble_lines_run_grouping_and_final_drop(self):
        # (block,line): run1 = a+b, run2 = c, run3 = d (FINAL → dropped).
        words = ["a", "b", "c", "d"]
        lines = assemble_lines(words, [1, 1, 2, 3], [1, 1, 1, 1])
        assert lines == ["ab", "c"]  # "d" never flushed (quirk #3)

    def test_assemble_lines_ad_run_dropped(self):
        # run1 "热门" is an ad line → dropped; run2 "x" flushed when run3
        # starts; run3 "y" is the final run → never flushed (quirk #3).
        assert assemble_lines(["热", "门", "x", "y"], [1, 1, 2, 3], [1, 1, 1, 1]) == ["x"]

    def test_assemble_single_word_yields_nothing(self):
        assert assemble_lines(["only"], [1], [1]) == []

    def test_link_from_url(self):
        assert link_from_url("https://h.com/a/b/c.html") == "c.html"
        assert link_from_url("noslash") == "noslash"


# ---------------------------------------------------------------- doc gate
class TestExtractDocument:
    def test_gate_drops_short_docs(self):
        assert extract_document("x" * 5) == []  # len == min_chars → dropped
        assert len(extract_document("x" * 6)) == 1  # strictly longer → kept

    def test_no_split_mode(self):
        out = extract_document("y" * 900, split_doc=False)
        assert len(out) == 1
        assert out[0].content == "y" * 900


# ---------------------------------------------------------------- html
class TestHtmlExtract:
    def test_strips_boilerplate_keeps_article(self):
        html = (
            "<html><head><script>x()</script><style>a{}</style></head><body>"
            "<header>SITE</header><nav><a href='/'>home</a><a href='/x'>x</a></nav>"
            "<article><p>real content here</p></article>"
            "<footer>legal</footer></body></html>"
        )
        assert extract_main_text_html(html) == "real content here"

    def test_link_dense_block_dropped(self):
        html = (
            "<body><div><a href='1'>aaa</a> <a href='2'>bbb</a> <a href='3'>ccc</a></div>"
            "<p>main text body</p></body>"
        )
        assert extract_main_text_html(html) == "main text body"

    def test_boilerplate_class_dropped(self):
        html = "<body><div class='sidebar left'>junk</div><p>keep me</p></body>"
        assert extract_main_text_html(html) == "keep me"

    def test_ad_marker_line_dropped(self):
        html = "<body><p>限时广告推广</p><p>正文内容在此处继续</p></body>"
        assert extract_main_text_html(html) == "正文内容在此处继续"

    def test_multiple_blocks_joined_without_separator(self):
        html = "<body><p> alpha </p><p> beta </p></body>"
        assert extract_main_text_html(html) == "alphabeta"

    def test_entities_decoded(self):
        html = "<body><p>a &amp; b &lt;c&gt;</p></body>"
        assert extract_main_text_html(html) == "a & b <c>"

    def test_malformed_html_no_crash(self):
        assert isinstance(extract_main_text_html("<p>open <div unclosed <b>bold"), str)


class TestFastHtmlParity:
    """The regex tokenizer (hot path) must be byte-identical to the
    html.parser specification on the whole fixture corpus + adversaria."""

    def test_fixture_corpus_byte_identical(self):
        from document_automation_spark.kernels.html_fast import extract_main_text_html_fast
        from document_automation_spark.kernels.pdf_extract import looks_like_pdf
        from document_automation_spark.sources.pages import gen_rows

        for page in gen_rows(range(1500)):
            payload = page["html"]
            if looks_like_pdf(payload):
                continue
            try:
                html = payload.decode("utf-8")
            except UnicodeDecodeError:
                continue
            assert extract_main_text_html_fast(html) == extract_main_text_html(html), page["url"]

    @pytest.mark.parametrize(
        "snippet",
        [
            "<p>open <div unclosed <b>bold",
            "<body><p>a &amp; b &lt;c&gt;</p></body>",
            "<div class='sidebar x'>j</div><p>keep</p>",
            "<a href=x>link text here</a><p>hello world text</p>",
            "<table><tr><td>cell1</td><td>cell2</td></tr></table>",
            "<!-- comment --><p>after comment</p>",
            "<![CDATA[raw]]><p>post cdata</p>",
            "<br/><hr/><p>voids</p><img src=x>",
            "text with no tags at all",
            "<p>nested <span>span</span> tail</p>",
            "<script>var x = '<p>not a para</p>';</script><p>real</p>",
            "<style>p::before{content:'<'}</style><p>styled</p>",
            "<P>UPPER</P><DIV CLASS='NAV'>menu</DIV>",
            "<p>中文内容测试</p><p>限时广告</p>",
            "<title>meta title</title><p>body text</p>",
            "<div id=footer-links><a href=x>y</a></div><p>main</p>",
        ],
    )
    def test_adversarial_snippets(self, snippet):
        from document_automation_spark.kernels.html_fast import extract_main_text_html_fast

        assert extract_main_text_html_fast(snippet) == extract_main_text_html(snippet)


# ---------------------------------------------------------------- pdf
class TestPdfExtract:
    def test_tj_same_baseline_joins(self):
        # two show ops with NO line move between them = one baseline = one
        # line (justified-text emission pattern of real PDF generators)
        pdf = b"%PDF-1.4\nBT (hello ) Tj (world) Tj ET\n%%EOF"
        assert extract_text_pdf(pdf) == "hello world"

    def test_td_breaks_lines(self):
        pdf = b"%PDF-1.4\nBT (hello ) Tj 0 -14 Td (world) Tj ET\n%%EOF"
        assert extract_text_pdf(pdf) == "helloworld"  # separator-free join

    def test_tstar_and_tm_break_lines(self):
        pdf = b"%PDF-1.4\nBT (a) Tj T* (b) Tj 1 0 0 1 72 700 Tm (c) Tj ET"
        assert extract_text_pdf(pdf) == "abc"

    def test_tj_array_extraction(self):
        pdf = b"%PDF-1.4\nBT [(he) -20 (llo)] TJ ET\n%%EOF"
        assert extract_text_pdf(pdf) == "hello"

    def test_flate_decode_stream(self):
        import zlib

        content = b"BT (compressed ) Tj 0 -14 Td (payload text) Tj ET"
        data = zlib.compress(content)
        pdf = (
            b"%PDF-1.4\n4 0 obj<</Length "
            + str(len(data)).encode()
            + b"/Filter/FlateDecode>>stream\n"
            + data
            + b"\nendstream endobj\n%%EOF"
        )
        assert extract_text_pdf(pdf) == "compressedpayload text"

    def test_corrupt_flate_quarantines(self):
        pdf = (b"%PDF-1.4\n4 0 obj<</Filter/FlateDecode>>stream\n"
               b"\x00not-zlib\xff\nendstream endobj")
        with pytest.raises(PdfExtractError, match="FlateDecode"):
            extract_text_pdf(pdf)

    def test_escapes(self):
        pdf = rb"%PDF-1.4\nBT (a\(b\)c\\d) Tj ET"
        assert extract_text_pdf(pdf) == r"a(b)c\d"

    def test_non_pdf_raises(self):
        with pytest.raises(PdfExtractError):
            extract_text_pdf(b"not a pdf")

    def test_compressed_raises(self):
        with pytest.raises(PdfExtractError):
            extract_text_pdf(b"%PDF-1.4 /Filter /FlateDecode stream")


# ---------------------------------------------------------------- page kernel
class TestExtractPage:
    def test_html_page_end_to_end(self):
        html = "<body><article><p>" + "z" * 600 + "</p></article></body>"
        rows = extract_page("https://h/a/p1.html", html.encode())
        assert all(r.error is None for r in rows)
        assert rows[0].n_passages == len(rows) == 2  # 600 → [0:500], rem [500:600]
        assert rows[0].link == "p1.html"
        assert rows[0].content == "z" * 500
        assert rows[1].content == "z" * 100

    def test_broken_payload_quarantined(self):
        rows = extract_page("https://h/bad.html", b"\xff\xfe\x80garbage")
        assert len(rows) == 1
        assert rows[0].error is not None
        assert rows[0].n_passages == 0
        assert rows[0].content is None

    def test_short_doc_zero_rows(self):
        rows = extract_page("https://h/t.html", b"<body><p>tiny</p></body>")
        assert rows == []

    def test_doc_id_deterministic(self):
        html = b"<body><p>stable content body</p></body>"
        a = extract_page("https://h/x.html", html)
        b = extract_page("https://h/x.html", html)
        assert a == b
        assert len(a[0].doc_id) == 64


# ---------------------------------------------------------------- fingerprints
class TestFingerprints:
    def test_stable_hash_is_process_stable(self):
        assert stable_hash64("spark") == stable_hash64("spark")
        assert stable_hash64("spark") != stable_hash64("sparks")

    def test_shingles(self):
        assert char_shingles("abcdef", 5) == ["abcde", "bcdef"]
        assert char_shingles("ab", 5) == ["ab"]
        assert char_shingles("", 5) == []

    def test_minhash_similarity_ordering(self):
        base = "the quick brown fox jumps over the lazy dog " * 5
        near = base.replace("lazy", "sleepy")
        far = "completely different content with other words entirely " * 5
        sig_a, sig_b, sig_c = (minhash_signature(t) for t in (base, near, far))
        sim_ab = sum(x == y for x, y in zip(sig_a, sig_b)) / len(sig_a)
        sim_ac = sum(x == y for x, y in zip(sig_a, sig_c)) / len(sig_a)
        assert sim_ab > 0.5 > sim_ac

    def test_lsh_bands_share_key_for_near_dups(self):
        base = "word salad for locality sensitive hashing test " * 10
        near = base + "tail"
        keys_a = set(lsh_band_keys(minhash_signature(base)))
        keys_b = set(lsh_band_keys(minhash_signature(near)))
        assert keys_a & keys_b

    def test_simhash_hamming(self):
        a = simhash64("identical text for simhash check " * 4)
        b = simhash64("identical text for simhash check " * 4)
        c = simhash64("something else entirely unrelated " * 4)
        assert hamming64(a, b) == 0
        assert hamming64(a, c) > 10

    def test_rolling_fingerprint_matches_manual_fold(self):
        text = "abc"
        expected = ((ord("a") * 31 + ord("b")) * 31 + ord("c")) % 140737488355213
        assert rolling_fingerprint(text) == expected

    def test_jaccard(self):
        assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)
        assert jaccard(set(), set()) == 1.0


# ---------------------------------------------------------------- textstats
class TestTextStats:
    def test_detect_language_scripts(self):
        assert detect_language("这是中文文本内容") == "zh"
        assert detect_language("これはテストです") == "ja"
        assert detect_language("привет мир как дела") == "ru"
        assert detect_language("the cat is in the house and the dog") == "en"
        assert detect_language("der hund ist in dem haus und die katze") == "de"

    def test_token_counts(self):
        assert count_tokens_ws("  a b   c ") == 3
        assert count_tokens_ws("") == 0
        assert count_tokens_bpe_ish("hello, world! 42") == 5  # hello , world ! 42
        assert count_tokens_bpe_ish("中文字") == 3

    def test_quality_score_fields(self):
        q = quality_score("The quick brown fox jumps over the lazy dog near the bank.")
        assert q["n_tokens"] == 12.0
        assert 0.0 <= q["quality"] <= 1.0
        assert q["stopword_ratio"] > 0
        short = quality_score("tiny")
        assert short["quality"] < q["quality"]


class TestPdfReviewRegressions:
    """Pinned fixes from the round-2 adversarial review."""

    def test_leading_dot_reals_are_move_operands(self):
        pdf = b"%PDF-1.4\nBT (a) Tj 1 0 0 1 72 .5 Tm (b) Tj 0 -.5 Td (c) Tj ET"
        # .5 / -.5 reals must flush baselines: three lines, not one
        assert extract_text_pdf(pdf) == "abc"

    def test_undelimited_move_operator_flushes_baseline(self):
        # PDF lexing allows '20Td' / '...20Tm' with NO whitespace before the
        # operator (numbers self-terminate): the move must still flush the
        # line or distinct baselines silently merge (round-2 advice)
        pdf = b"%PDF-1.4\nBT (a) Tj 0 -14Td (b) Tj 1 0 0 1 72 700Tm (c) Tj ET"
        assert extract_text_pdf(pdf) == "abc"
        # fixture shape (delimited) must be unchanged
        pdf2 = b"%PDF-1.4\nBT (a) Tj 0 -14 Td (b) Tj ET"
        assert extract_text_pdf(pdf2) == "ab"

    def test_indirect_length_not_misparsed(self):
        from document_automation_spark.kernels.pdf_extract import _LENGTH

        # backtracking must not shrink '/Length 30 0 R' into length 3
        assert _LENGTH.search(b"/Length 30 0 R") is None
        assert _LENGTH.search(b"/Length 8 2 R") is None  # any generation nr
        assert int(_LENGTH.search(b"/Length 30>>").group(1)) == 30

    def test_text_outside_streams_still_extracted(self):
        import zlib

        data = zlib.compress(b"BT (in-stream ) Tj ET")
        pdf = (
            b"%PDF-1.4\n4 0 obj<</Length "
            + str(len(data)).encode()
            + b"/Filter/FlateDecode>>stream\n"
            + data
            + b"\nendstream endobj\nBT (top-level) Tj ET\n%%EOF"
        )
        assert extract_text_pdf(pdf) == "in-streamtop-level"

    def test_truncated_stream_body_never_scanned_as_text(self):
        import zlib

        data = zlib.compress(b"BT (ok) Tj ET")
        good = (b"%PDF-1.4\n4 0 obj<</Length " + str(len(data)).encode()
                + b"/Filter/FlateDecode>>stream\n" + data + b"\nendstream endobj\n")
        # second stream: unusable Length, body truncated (no endstream) and
        # containing BT..ET-looking binary — must NOT leak into the output
        truncated = b"5 0 obj<</Length 9 0 R>>stream\nBT (garbage\xff\xfe) Tj ET"
        assert extract_text_pdf(b"".join([good, truncated])) == "ok"


class TestGzipPayloads:
    def test_gzip_html_extracts_like_plain(self):
        import gzip

        html = b"<body><article><p>" + b"z" * 600 + b"</p></article></body>"
        plain = extract_page("https://h/a/p.html", html)
        gzipped = extract_page("https://h/a/p.html", gzip.compress(html))
        assert [(r.passage_idx, r.content) for r in plain] == [
            (r.passage_idx, r.content) for r in gzipped
        ]
        assert plain[0].content is not None

    def test_gzip_pdf_dispatches(self):
        import gzip

        pdf = b"%PDF-1.4\nBT (" + b"q" * 600 + b") Tj ET"
        rows = extract_page("https://h/d.pdf", gzip.compress(pdf))
        assert rows and rows[0].error is None
        assert rows[0].content.startswith("qqq")

    def test_corrupt_gzip_quarantined(self):
        rows = extract_page("https://h/x.html", b"\x1f\x8b\x00broken")
        assert len(rows) == 1 and rows[0].error is not None

    def test_multi_member_gzip_fully_decompressed(self):
        import gzip

        half1 = "<body><article><p>" + "a" * 300
        half2 = "b" * 300 + "</p></article></body>"
        payload = gzip.compress(half1.encode()) + gzip.compress(half2.encode())
        rows = extract_page("https://h/mm.html", payload)
        assert rows and rows[0].error is None
        joined = "".join(r.content for r in rows)
        assert "a" * 300 + "b" * 300 in joined  # BOTH members present

    def test_gzip_trailing_garbage_quarantined(self):
        import gzip

        payload = gzip.compress(b"<body><p>hi there friend</p></body>") + b"junkjunk"
        rows = extract_page("https://h/tg.html", payload)
        assert len(rows) == 1 and "trailing garbage" in rows[0].error

    def test_gzip_bomb_capped(self):
        import gzip

        from document_automation_spark.kernels.page import _gunzip_capped

        bomb = gzip.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, tiny compressed
        with pytest.raises(ValueError, match="decompression cap"):
            _gunzip_capped(bomb, max_bytes=1 << 20)



class TestCharsetFallback:
    def test_declared_latin1_decodes(self):
        body = "<body><article><p>" + "café résumé naïve " * 40 + "</p></article></body>"
        payload = ('<meta charset="latin-1">' + body).encode("latin-1")
        rows = extract_page("https://h/l1.html", payload)
        assert rows and rows[0].error is None
        assert "café" in rows[0].content

    def test_declared_gbk_decodes(self):
        body = "<body><article><p>" + "中文网页内容测试数据 " * 60 + "</p></article></body>"
        payload = ('<meta http-equiv="Content-Type" content="text/html; charset=gbk">' + body).encode("gbk")
        rows = extract_page("https://h/g.html", payload)
        assert rows and rows[0].error is None
        assert "中文网页内容" in rows[0].content

    def test_undeclared_binary_still_quarantined(self):
        rows = extract_page("https://h/b.html", b"\xff\xfe\x80garbage")
        assert len(rows) == 1 and rows[0].error is not None

    def test_unknown_declared_codec_quarantined(self):
        payload = b'<meta charset="no-such-codec">\xff\xfe\x80junk'
        rows = extract_page("https://h/u.html", payload)
        assert len(rows) == 1 and rows[0].error is not None

    def test_broken_declared_utf8_quarantined(self):
        payload = b'<meta charset="utf-8">\xff\xfe\x80junk'
        rows = extract_page("https://h/bu.html", payload)
        assert len(rows) == 1 and rows[0].error is not None

    def test_charset_in_link_does_not_trigger_fallback(self):
        payload = b'<a href="/view?charset=iso-8859-1">x</a>\xff\xfe\x80junk'
        rows = extract_page("https://h/cl.html", payload)
        assert len(rows) == 1 and rows[0].error is not None  # still quarantined


class TestFastHtmlFuzzParity:
    """Round-3: the regex tokenizer is fuzz-pinned against the html.parser
    specification — including the malformed-markup classes the round-2
    pattern mis-lexed (quote characters in tag-name position, quoted
    attribute spans without '=')."""

    FRAGS = [
        "<p>", "</p>", "<div class='sidebar'>", "</div>", "<a href=x>",
        "</a>", "text ", "more words here ", "<", ">", "'", '"', "=",
        "<a'>", "</a'>", '<p "x>y">', "<b>", "</b>", "&amp;", "  ",
        "<br/>", "<script>s</script>", "<img src=x>", "<span a='b>c'>",
        "<i =>", "</ p>", "</123>", "<em x=>", "q<r",
        # round-3 review classes: self-closed non-voids, bare values
        # swallowing '/', unterminated quotes, bogus spaced end tags
        "<div/>", "<a/>", "<span class='menu'/>", '<p s=">', "/>",
        "</ p q>", "<p attr='uncl", "<hr/>", "<div x/>", "<a href=x/>",
        "<p a= />", "=x/>",
        # high-effort review classes: NUL bytes (position-dependent
        # validity) and '=' directly after the tag name
        "\x00", "<p\x00>", "<b= b='>", "<b=c>", "= '", "<p \x00=x>",
    ]

    def test_seeded_tag_soup_matches_spec(self):
        import random

        from document_automation_spark.kernels.html_extract import extract_main_text_html
        from document_automation_spark.kernels.html_fast import extract_main_text_html_fast

        rng = random.Random(7)
        for _ in range(800):
            s = "".join(rng.choice(self.FRAGS) for _ in range(rng.randrange(1, 12)))
            assert extract_main_text_html_fast(s) == extract_main_text_html(s), repr(s)

    @pytest.mark.parametrize(
        "snippet",
        [
            "<a'>quote is part of the tag name</a'><p>kept text</p>",
            '<p "x>y">bare quoted attr ends at first gt',
            "<span a='b>c'>quoted value after = may span gt</span><p>t</p>",
            "<em x=>empty value</em>",
            "</ p>tolerant end<p>q</p>",
            '<div class="sidebar"/><p>self-closed boilerplate must not drop this</p>',
            "<a href=x/>bare value eats the slash: open anchor, text dropped by density",
            '<p s=">rest of an unterminated-quote tag is TEXT',
            "<div x/>self-closing after a bare attr name",
            "</ p q>bogus end tag is skipped<p>ok</p>",
            "<p\x00>NUL after name makes the tag invalid (text)",
            "<b= b='>equals right after the name: text, not a tag",
            "<div\x00 class=sidebar>kept, not dropped</div>",
        ],
    )
    def test_malformed_markup_matches_spec(self, snippet):
        from document_automation_spark.kernels.html_extract import extract_main_text_html
        from document_automation_spark.kernels.html_fast import extract_main_text_html_fast

        assert extract_main_text_html_fast(snippet) == extract_main_text_html(snippet)


class TestFastHashIndependence:
    def test_fast_hash64_words_not_affinely_locked(self):
        """crc32 is affine in its init value: hashing the SAME message with
        two inits makes the two 32-bit words xor to a length-only constant
        (only 32 independent bits for fixed-k shingles — would double
        effective SimHash Hamming distances).  The second word must hash a
        DIFFERENT message; pin that the cross-word xor VARIES over
        equal-length inputs."""
        from document_automation_spark.kernels.fingerprint import fast_hash64

        xors = set()
        for i in range(64):
            h = fast_hash64(f"abcd{i % 10}{i // 10}")  # fixed length 6
            xors.add((h >> 32) ^ (h & 0xFFFFFFFF))
        assert len(xors) > 32  # affine lock would make this exactly 1

    def test_fast_hash64_stable_and_64bit(self):
        from document_automation_spark.kernels.fingerprint import fast_hash64

        assert fast_hash64("spark") == fast_hash64("spark")
        vals = {fast_hash64(f"shingle-{i}") for i in range(256)}
        assert len(vals) == 256
        assert any(v >> 32 for v in vals) and any(v & 0xFFFFFFFF for v in vals)


class TestFastHtmlHypothesisParity:
    """Generative differential fuzz (hypothesis): random tag-soup built
    from markup metachars and text must ALWAYS extract byte-identically to
    the html.parser spec — the continuously-exploring complement to the
    seeded fragment fuzz above."""

    def test_random_soup_matches_spec(self):
        from hypothesis import given, settings, strategies as st

        from document_automation_spark.kernels.html_extract import extract_main_text_html
        from document_automation_spark.kernels.html_fast import extract_main_text_html_fast

        soup = st.text(
            alphabet=st.sampled_from(
                list("<>/='\"! -&;abpdiv") + ["\x00", "\t", "\n", "广"]
            ),
            max_size=60,
        )

        @settings(max_examples=300, deadline=None)
        @given(soup)
        def check(s):
            assert extract_main_text_html_fast(s) == extract_main_text_html(s)

        check()
