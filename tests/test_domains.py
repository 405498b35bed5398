"""operators/domains: per-host stats + allow/block gating."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from document_automation_spark.operators.domains import (
    NO_HOST,
    domain_stats,
    filter_by_domain,
    host_col,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "https://example.com/a", "x" * 100),
        (2, "https://Example.COM/b", "y" * 300),
        (3, "https://ads.example.com/t", "z" * 50),
        (4, "http://news.site.org/1", "n" * 200),
        (5, "http://news.site.org/1", "m" * 200),  # same url re-crawl
        (6, "not a url at all", "q" * 10),
        (7, "https://spam.biz/x", "s" * 40),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


class TestDomainStats:
    def test_stats(self, spark, docs):
        rows = {r.host: r for r in domain_stats(docs).collect()}
        assert rows["example.com"].n_docs == 2  # case-insensitive host
        assert rows["example.com"].n_chars == 400
        assert rows["ads.example.com"].n_docs == 1
        assert rows["news.site.org"].n_docs == 2
        assert rows["news.site.org"].n_urls == 1  # re-crawl of one url
        assert rows["news.site.org"].docs_per_url == 2.0
        assert rows[NO_HOST].n_docs == 1  # malformed url bucket
        assert sum(r.n_docs for r in rows.values()) == 7  # accounting total

    def test_single_shuffle_plan(self, spark, docs):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            domain_stats(docs).explain("formatted")
        # one shuffle for the groupBy host (+ possibly distinct-url expand),
        # but never a sort-merge join or a second pass over text
        assert "SortMergeJoin" not in buf.getvalue()


class TestRegistrableDomain:
    def test_fold_matrix(self, spark):
        from document_automation_spark.operators.domains import (
            registrable_domain_col,
        )

        cases = [
            ("www.site.co.uk", "site.co.uk"),   # 2-level ccTLD suffix
            ("a.b.site.co.uk", "site.co.uk"),   # deep subdomain, same
            ("site.co.uk", "site.co.uk"),       # already registrable
            ("co.uk", "co.uk"),                 # bare suffix: verbatim
            ("www.example.com", "example.com"),
            ("a.b.c.example.com", "example.com"),
            ("example.com", "example.com"),
            ("localhost", "localhost"),         # dot-less: verbatim
            ("(none)", "(none)"),               # sentinel: verbatim
            ("10.0.0.5", "10.0.0.5"),           # IPv4 literal: verbatim
            ("sub.example.com.au", "example.com.au"),
            ("a.example.com.", "example.com"),  # trailing-dot FQDN
            ("example.com.", "example.com"),
            # edge cases pinned when the fold moved from split()/F.get()
            # to substring_index (codegen-size fix): empty labels from
            # consecutive/leading dots must fold identically
            ("a..com", ".com"),                 # consecutive dots: empty label kept
            (".com", ".com"),                   # leading dot: 2 labels, verbatim
            ("", ""),                           # empty host: verbatim
        ]
        df = spark.createDataFrame(cases, "host string, expect string")
        bad = df.where(
            registrable_domain_col(F.col("host")) != F.col("expect")
        ).collect()
        assert bad == []


    def test_domain_stats_at_domain_level(self, spark):
        from document_automation_spark.operators.domains import domain_stats

        rows = [
            (f"https://sub{i}.farm.com/p{i}", f"text {i}") for i in range(5)
        ] + [("https://solo.example.org/q", "solo text")]
        df = spark.createDataFrame(rows, "url string, text string")
        by_host = {r.host: r.n_docs for r in domain_stats(df).collect()}
        assert len(by_host) == 6 and by_host["solo.example.org"] == 1
        by_dom = {
            r.host: r.n_docs for r in domain_stats(df, level="domain").collect()
        }
        assert by_dom == {"farm.com": 5, "example.org": 1}
        import pytest as _pytest

        with _pytest.raises(ValueError, match="host.*domain"):
            domain_stats(df, level="registrar")


class TestDomainGate:
    def test_blocklist_with_subdomains(self, spark, docs):
        kept, obs = filter_by_domain(docs, blocklist=["example.com", "spam.biz"])
        ids = sorted(r.doc_id for r in kept.collect())
        assert ids == [4, 5, 6]  # 1,2 host match; 3 subdomain match; 7 match
        assert obs.get == {"n_docs_in": 7, "n_docs_blocked": 4}

    def test_blocklist_exact_host_only(self, spark, docs):
        kept, _ = filter_by_domain(
            docs, blocklist=["example.com"], block_subdomains=False
        )
        ids = sorted(r.doc_id for r in kept.collect())
        assert ids == [3, 4, 5, 6, 7]  # ads.example.com survives

    def test_allowlist(self, spark, docs):
        kept, obs = filter_by_domain(docs, allowlist=["example.com"])
        ids = sorted(r.doc_id for r in kept.collect())
        assert ids == [1, 2, 3]  # subdomain allowed too; (none) blocked
        assert obs.get["n_docs_blocked"] == 4

    def test_arg_validation(self, spark, docs):
        with pytest.raises(ValueError, match="exactly one"):
            filter_by_domain(docs)
        with pytest.raises(ValueError, match="exactly one"):
            filter_by_domain(docs, blocklist=["a"], allowlist=["b"])
        with pytest.raises(ValueError, match="non-empty"):
            filter_by_domain(docs, blocklist=[])
        with pytest.raises(ValueError, match="literal cap"):
            filter_by_domain(docs, blocklist=[f"h{i}.com" for i in range(10_001)])

    def test_zero_shuffle_gate(self, spark, docs):
        kept, _ = filter_by_domain(docs, blocklist=["example.com"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            kept.explain("formatted")
        assert "Exchange" not in buf.getvalue()
