"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §1).

Schema (authoritative shape from BASELINE.json input_hint):
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Every row is a pure function of ``(seed, row_index)`` — NO wall clock, NO
process-local randomness — so runs at ``local[8]`` and ``local[32]`` (or
1000 executors) see byte-identical inputs, which is what makes the scaling
benchmark and the distributed-vs-oracle equivalence tests meaningful.

Payload mix mirrors the fixture spec:
* Zipfian host distribution (a few hosts own ~half the rows → real
  host-level skew for the salting path);
* ~5% tiny uncompressed PDF payloads (magic ``%PDF-``);
* ~3% gzip-wrapped HTML (Content-Encoding: gzip analogue; mtime=0 for
  deterministic bytes) and ~1% legacy-charset (gbk + meta declaration)
  pages — the kernel's transparent-decode paths, exercised end to end;
* ~1% malformed bytes (invalid UTF-8, no PDF magic) → quarantine path
  (reference analogue: broken-image tolerance,
  /root/reference/src/gen-sods-doc-image-ray.py:102-106);
* article lengths spanning the split-kernel edge cases (≤5 dropped by the
  gate, 6..500 single window, 501/990/991/996 remainder-gate edges, long
  multi-window) — see kernels.textproc quirks;
* ~10% rows carry an ad-marker (广告/热门) line that the extractor must drop;
* zh rows use CJK text so code-point slicing is exercised.

Generation is distributed: ``pages_df`` maps the generator over
``spark.range(n)`` partitions with ``mapInPandas`` (Arrow batches), so the
source scales with the cluster instead of bottlenecking on the driver.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Dict, Iterator, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_N_HOSTS = 50
_HOSTS = [f"host{i:02d}.example.com" for i in range(_N_HOSTS)]
# Zipf CDF over hosts: P(rank r) ∝ 1/(r+1).
_WEIGHTS = [1.0 / (r + 1) for r in range(_N_HOSTS)]
_TOTAL_W = sum(_WEIGHTS)
_CDF: List[float] = []
_acc = 0.0
for _w in _WEIGHTS:
    _acc += _w / _TOTAL_W
    _CDF.append(_acc)

_EN_WORDS = (
    "the quick brown fox jumps over lazy dog data spark table scan shuffle "
    "partition merge join filter window batch stream vector column row key value "
    "page crawl extract content article section header text corpus token index"
).split()
_ZH_CHARS = "数据处理分布式集群内存计算引擎查询优化器分区合并连接过滤窗口批流向量列行键值页面抓取抽取内容文章节标题文本语料索引"

# Article target lengths: split-kernel edge cases + typical spread.
_LEN_BUCKETS = [3, 6, 42, 120, 499, 500, 501, 505, 506, 990, 991, 996, 997, 1480, 2500, 5200]

_BASE_TS = dt.datetime(2024, 8, 1, 0, 0, 0)


def _pick_host(rng: random.Random) -> str:
    x = rng.random()
    for i, c in enumerate(_CDF):
        if x <= c:
            return _HOSTS[i]
    return _HOSTS[-1]


def _make_text(rng: random.Random, lang: str, target_len: int) -> str:
    """Deterministic text of EXACTLY ``target_len`` code points."""
    if lang == "zh":
        return "".join(rng.choices(_ZH_CHARS, k=target_len))
    # ~6 chars/word incl. separator → sample enough words in one call
    words = rng.choices(_EN_WORDS, k=target_len // 4 + 2)
    text = " ".join(words)
    if len(text) < target_len:
        text = text + "x" * (target_len - len(text))
    return text[:target_len]


def _make_html(rng: random.Random, article: str, with_ad_line: bool) -> bytes:
    """HTML wrapping ``article`` in one <p>, plus boilerplate the extractor
    must strip (nav/header/footer/sidebar/link-farm) so that the extracted
    main text is exactly ``article`` (with the ad line dropped if present).
    """
    nav_links = "".join(
        f'<a href="/s{i}">section {i}</a> ' for i in range(rng.randrange(3, 8))
    )
    ad_line = "<p>限时优惠广告点击查看</p>" if with_ad_line else ""
    sidebar = "".join(f'<a href="/rel{i}">related link {i}</a>' for i in range(5))
    return (
        "<html><head><title>t</title><style>.x{color:red}</style>"
        "<script>var x=1;</script></head><body>"
        f"<header><h1>Site Banner</h1></header><nav>{nav_links}</nav>"
        '<div class="sidebar">' + sidebar + "</div>"
        f"<article>{ad_line}<p>{article}</p></article>"
        '<div id="footer-links">' + nav_links + "</div>"
        "<footer>© example</footer></body></html>"
    ).encode("utf-8")


def _make_pdf(rng: random.Random, article: str) -> bytes:
    """Minimal uncompressed one-page PDF whose text stream shows ``article``
    split across a few Tj lines (parseable by kernels.pdf_extract)."""
    third = max(1, len(article) // 3)
    lines = [article[i : i + third] for i in range(0, len(article), third)]

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    shows = "\n".join(f"({esc(ln)}) Tj 0 -14 Td" for ln in lines)
    stream = f"BT /F1 12 Tf 72 720 Td\n{shows}\nET"
    body = (
        "%PDF-1.4\n1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
        "2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
        "3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
        f"4 0 obj<</Length {len(stream)}>>stream\n{stream}\nendstream endobj\n"
        "trailer<</Root 1 0 R>>\n%%EOF\n"
    )
    return body.encode("utf-8")


FIXTURE_VERSION = 2  # bump when gen_page output changes: benches key caches on it


def gen_page(i: int, seed: int = 42) -> Dict:
    """Row ``i`` of the synthetic pages table — pure function of (seed, i)."""
    rng = random.Random((seed << 32) ^ i)
    host = _pick_host(rng)
    url = f"https://{host}/p/{seed}/{i}.html"
    warc_ts = _BASE_TS + dt.timedelta(days=i % 14, seconds=rng.randrange(86_400))

    kind_roll = rng.random()
    lang = "zh" if rng.random() < 0.4 else "en"
    target_len = _LEN_BUCKETS[rng.randrange(len(_LEN_BUCKETS))]
    article = _make_text(rng, lang, target_len)
    # `text` column = pre-extracted analogue (Dureader `document` field,
    # /root/reference/src/process_dataset.py:84).
    text = article

    if kind_roll < 0.01:  # malformed payload → quarantine path
        html = b"\xff\xfe\x00broken\x80payload" + bytes([rng.randrange(256) for _ in range(16)])
    elif kind_roll < 0.06:  # PDF payload
        html = _make_pdf(rng, article)
    elif kind_roll < 0.09:  # gzip-wrapped HTML (Content-Encoding: gzip drop)
        import gzip

        plain = _make_html(rng, article, with_ad_line=rng.random() < 0.10)
        html = gzip.compress(plain, mtime=0)  # mtime=0 → deterministic bytes
    elif kind_roll < 0.11 and lang == "zh":  # legacy-charset page (gbk)
        body = _make_html(rng, article, with_ad_line=False).decode("utf-8")
        # strict encode: any non-GBK character sneaking into the template
        # must fail generation loudly, not silently desync html from text
        # (© is the one known non-GBK template char — boilerplate anyway)
        html = ('<meta charset="gbk">' + body.replace("©", "(c)")).encode("gbk")
    else:  # HTML payload
        html = _make_html(rng, article, with_ad_line=rng.random() < 0.10)

    return {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}


def gen_rows(indices, seed: int = 42) -> List[Dict]:
    """Batch generator (shared by the Spark source and the local oracle)."""
    return [gen_page(int(i), seed) for i in indices]


def pages_df(spark: SparkSession, n_rows: int, seed: int = 42, partitions: int = None) -> DataFrame:
    """Distributed deterministic pages table of ``n_rows`` rows.

    ``spark.range`` partitions → ``mapInPandas`` generation, so each
    executor synthesizes its own slice; no driver materialization.
    """
    import pandas as pd

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            rows = gen_rows(batch["id"].tolist(), seed)
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen_batches, PAGES_SCHEMA)
