"""URL canonicalization + URL-level dedup — the ingest step BEFORE content
dedup in a crawl pipeline (the same url may be crawled many times across
snapshots, and trivially-different urls point at one resource).

Everything is a single JVM column expression (``parse_url`` + string/array
builtins, whole-stage codegen) — no Python in the path, so this runs at
scan speed on 10^12 rows.  Canonicalization rules (deterministic,
deliberately conservative — never merges urls that could differ):

* scheme and host lowercased;
* default ports stripped (``:80`` for http, ``:443`` for https);
* fragment dropped (never reaches the server);
* known tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``) and remaining query parameters SORTED (param order is
  almost never significant; parameter names/values are otherwise kept
  verbatim);
* empty query/fragment separators dropped (``...?`` → ``...``).

Path case/percent-encoding/trailing-slash are NOT normalized: those can
be semantic, and a false merge silently drops real documents.

Malformed / hostless URLs (real crawl data has them; this repo's own
quarantine markers ``warc:<path>#error`` are hostless by construction)
canonicalize to THEMSELVES: ``try_parse_url`` (never throws, unlike
``parse_url`` which aborts the job on the first bad record) yields a null
canonical form, and the expression falls back to the verbatim url — so
distinct unparseable urls never merge, and never crash the ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[a-z]+|fbclid|gclid|msclkid)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` as one codegen'd expression.

    Total: never null, never throws.  A url ``try_parse_url`` cannot
    extract a host from (malformed, or hostless schemes like ``mailto:``
    and this repo's ``warc:...#error`` quarantine markers) is its own
    canonical form — conservative identity beats a crash or a false merge."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    port = F.regexp_extract(url, r"^[^:]+://[^/:?#]+:(\d+)", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.try_parse_url(url, F.lit("QUERY"))
    kept_params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING),
    )
    norm_query = F.array_join(F.sort_array(kept_params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(norm_query == "", F.lit("")).otherwise(F.concat(F.lit("?"), norm_query)),
    )
    # null host (or null scheme) nulls the whole concat → fall back verbatim
    return F.coalesce(canonical, url)


def dedup_by_url(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per canonical url — the NEWEST crawl wins (re-crawls
    supersede; ties broken by the raw url string for determinism).

    Scale shape: one shuffle on the canonical-url hash; the per-group
    window is bounded by the re-crawl count of one url, never the corpus.
    (``canonical_url`` is total — unparseable urls canonicalize to
    themselves — so there is no NULL partition for them to collapse into.)
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("canonical_url")
        .orderBy(F.desc(ts_col), F.asc(url_col))
    )
    return (
        pages.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
