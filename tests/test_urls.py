"""URL canonicalization + url-level dedup (operators/urls.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from document_automation_spark.operators.urls import canonical_url, dedup_by_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


class TestCanonicalUrl:
    def test_case_port_fragment(self, spark):
        got = _canon(spark, [
            "HTTP://Host.Example.COM:80/Path/Page.html#frag",
            "https://host.example.com:443/x",
            "https://host.example.com:8443/x",
            "http://h.com/a?",
        ])
        assert got == [
            "http://host.example.com/Path/Page.html",  # path case KEPT
            "https://host.example.com/x",
            "https://host.example.com:8443/x",  # non-default port kept
            "http://h.com/a",
        ]

    def test_query_sorting_and_tracking_params(self, spark):
        got = _canon(spark, [
            "https://h.com/p?b=2&a=1",
            "https://h.com/p?a=1&b=2",
            "https://h.com/p?a=1&utm_source=x&b=2&fbclid=abc&gclid=1&msclkid=2",
            "https://h.com/p?utm_campaign=only",
        ])
        assert got[0] == got[1] == got[2] == "https://h.com/p?a=1&b=2"
        assert got[3] == "https://h.com/p"

    def test_bare_host_normalizes_to_root(self, spark):
        """RFC 3986 §6.2.3: empty path on a host-ful url is '/' — the
        homepage crawled as 'http://h.com' and 'http://h.com/' must merge."""
        got = _canon(spark, [
            "http://h.com",
            "http://h.com/",
            "HTTP://H.com:80",
            "http://h.com?b=2&a=1",
        ])
        assert got[0] == got[1] == got[2] == "http://h.com/"
        assert got[3] == "http://h.com/?a=1&b=2"

    def test_semantic_parts_not_merged(self, spark):
        got = _canon(spark, [
            "https://h.com/CaseSensitive",
            "https://h.com/casesensitive",
            "https://h.com/a/",
            "https://h.com/a",
            "https://h.com/p?q=Value",
            "https://h.com/p?q=value",
        ])
        assert len(set(got)) == 6  # none of these may be merged


class TestDedupByUrl:
    def test_newest_crawl_wins(self, spark):
        t = dt.datetime(2024, 8, 1)
        rows = [
            ("http://H.com:80/a?b=2&a=1#x", t, "old"),
            ("http://h.com/a?a=1&b=2", t + dt.timedelta(days=3), "new"),
            ("http://h.com/other", t, "keep"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        out = {r.canonical_url: r.text for r in dedup_by_url(df).collect()}
        assert out == {"http://h.com/a?a=1&b=2": "new", "http://h.com/other": "keep"}

    def test_deterministic_tiebreak(self, spark):
        t = dt.datetime(2024, 8, 1)
        rows = [("http://h.com/a?x=1&utm_source=b", t, "B"),
                ("http://h.com/a?utm_source=a&x=1", t, "A")]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        out = dedup_by_url(df).collect()
        assert len(out) == 1
        assert out[0].text == "A"  # same ts → lowest raw url wins

    def test_fixture_urls_stable(self, spark):
        from document_automation_spark.sources.pages import pages_df

        pages = pages_df(spark, 200, partitions=4)
        out = dedup_by_url(pages)
        # fixture urls are unique per row and already canonical
        assert out.count() == 200
        same = out.filter(F.col("canonical_url") == F.col("url")).count()
        assert same == 200


class TestMalformedUrls:
    """ADVICE round-3: parse_url throws INVALID_URL on malformed urls and
    NULL-canonical rows used to collapse into one window partition."""

    def test_malformed_url_does_not_crash(self, spark):
        got = _canon(spark, [
            "not a url at all",
            "mailto:someone@example.com",
            "warc:/tmp/seg-0.warc#error",
            "://missing-scheme",
        ])
        # total function: unparseable urls canonicalize to themselves
        assert got == [
            "not a url at all",
            "mailto:someone@example.com",
            "warc:/tmp/seg-0.warc#error",
            "://missing-scheme",
        ]

    def test_distinct_hostless_urls_never_merge(self, spark):
        t = dt.datetime(2024, 8, 1)
        rows = [
            ("warc:/data/seg-0.warc#error", None, "q0"),
            ("wet:/data/seg-1.wet#error", None, "q1"),
            ("not a url at all", t, "m0"),
            ("http://h.com/a", t, "real"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        out = dedup_by_url(df)
        # every distinct unparseable url survives — no NULL-partition collapse
        assert out.count() == 4
        assert sorted(r.text for r in out.collect()) == ["m0", "q0", "q1", "real"]

    def test_mixed_batch_with_malformed_rows_still_dedups_real_urls(self, spark):
        t = dt.datetime(2024, 8, 1)
        rows = [
            ("http://H.com/a?b=2&a=1", t, "old"),
            ("http://h.com/a?a=1&b=2", t + dt.timedelta(days=1), "new"),
            ("total junk \x01 url", t, "junk"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        out = {r.text for r in dedup_by_url(df).collect()}
        assert out == {"new", "junk"}


class TestDuplicateRecordCopies:
    """Round-4 review: byte-identical (url, ts) records — the same crawl
    record ingested twice — must collapse to ONE row on the payload-light
    path too (only those few rows pay a payload window)."""

    def test_identical_copies_collapse(self, spark):
        t = dt.datetime(2024, 8, 1)
        rows = [
            ("http://h.com/a", t, "same-payload"),
            ("http://h.com/a", t, "same-payload"),   # exact double-ingest
            ("http://h.com/b", t, "unique"),
            ("http://h.com/a", t + dt.timedelta(days=1), "newer"),  # re-crawl
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        out = dedup_by_url(df, shuffle_payloads=False).collect()
        assert sorted(r.text for r in out) == ["newer", "unique"]
        # parity with the window path
        ref = dedup_by_url(df, shuffle_payloads=True).collect()
        assert sorted(r.text for r in out) == sorted(r.text for r in ref)

    def test_divergent_payloads_same_key_resolve_deterministically(self, spark):
        t = dt.datetime(2024, 8, 1)
        rows = [("http://h.com/x", t, "payload-A"), ("http://h.com/x", t, "payload-B")]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        a = dedup_by_url(df.repartition(1), shuffle_payloads=False).collect()
        b = dedup_by_url(df.repartition(8), shuffle_payloads=False).collect()
        assert len(a) == len(b) == 1
        assert a[0].text == b[0].text  # row-hash order: parallelism-invariant

    def test_null_ts_copies_collapse(self, spark):
        rows = [("warc:/seg#error", None, "q"), ("warc:/seg#error", None, "q")]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        assert dedup_by_url(df, shuffle_payloads=False).count() == 1


class TestFastPathParity:
    def test_fast_path_equals_full_expression(self, spark):
        """The already-canonical guard must be EXACTLY the identity set of
        the full expression: for every url — fast-shaped or not — the
        guarded canonical_url equals _canonical_url_full."""
        from document_automation_spark.operators.urls import (
            _canonical_url_full,
            canonical_url,
        )

        urls = [
            # fast-shaped (guard should hit; full expr must agree)
            "https://example.com/a/b.html",
            "http://example.com/",
            "https://sub.host-name.org/path_with~tilde/%20enc",
            "ftp://files.example.com/pub/x",
            # NOT fast-shaped: every canonicalization rule exercised
            "http://example.com",  # bare host: empty path normalizes to '/'
            "HTTPS://Example.COM:443/a?utm_source=x&b=2&a=1#frag",
            "http://example.com:80/x",
            "http://example.com:8080/x",
            "https://example.com/a?z=1&a=2",
            "https://example.com/a?",
            "http://EXAMPLE.com/CaseInPath",
            "mailto:user@example.com",
            "warc:/seg/file.warc#error",
            "not a url at all",
            "http://[::1]:8080/v6",
            "https://example.com/a#only-frag",
            "",
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(u,) for u in urls], "url string").select(
            "url",
            canonical_url(F.col("url")).alias("guarded"),
            _canonical_url_full(F.col("url")).alias("full"),
        )
        for r in df.collect():
            assert r.guarded == r.full, f"{r.url!r}: {r.guarded!r} != {r.full!r}"

    def test_fast_path_parity_on_generated_corpus(self, spark):
        """Property-style sweep: the guard agrees with the full expression
        on every fixture url plus mechanical mutations (uppercase, ports,
        queries, fragments) of each."""
        from pyspark.sql import functions as F

        from document_automation_spark.operators.urls import (
            _canonical_url_full,
            canonical_url,
        )
        from document_automation_spark.sources.pages import pages_df

        base = pages_df(spark, 300, partitions=4).select("url")
        mutated = base.select(
            F.explode(
                F.array(
                    F.col("url"),
                    F.upper(F.col("url")),
                    F.concat(F.col("url"), F.lit("?b=2&a=1&utm_source=t")),
                    F.concat(F.col("url"), F.lit("#frag")),
                    F.regexp_replace(F.col("url"), "://", "://x:8080@"),
                )
            ).alias("url")
        )
        bad = mutated.filter(
            canonical_url(F.col("url")) != _canonical_url_full(F.col("url"))
        )
        assert bad.count() == 0
