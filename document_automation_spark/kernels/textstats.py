"""Deterministic text-analysis kernels: language ID, quality score, tokens.

Pure Python (no Spark imports); the Spark layer (operators.text_analysis)
expresses the same logic with built-in ``pyspark.sql.functions`` where
possible (JVM-side) and falls back to these kernels inside pandas UDFs for
the parts SQL can't express; pytest asserts both agree.
"""

from __future__ import annotations

import re
from typing import Dict, List

# Minimal per-script stopword lists for the n-gram language heuristic.
_LANG_HINTS: Dict[str, List[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " von ", " den "],
    "fr": [" le ", " la ", " les ", " et ", " des ", " est "],
    "es": [" el ", " la ", " los ", " que ", " de ", " es "],
}

_CJK = re.compile(r"[一-鿿]")
_HIRAGANA_KATAKANA = re.compile(r"[぀-ヿ]")
_HANGUL = re.compile(r"[가-힯]")
_CYRILLIC = re.compile(r"[Ѐ-ӿ]")

_TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[一-鿿]|[^\sA-Za-z0-9一-鿿]")
_WS_SPLIT = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)

_STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)


def detect_language(text: str) -> str:
    """Script + stopword-n-gram heuristic language ID.

    Scripts win outright (zh/ja/ko/ru); Latin-script languages are scored
    by hint-token hit counts with a deterministic 'en' tie-break.
    """
    if _HIRAGANA_KATAKANA.search(text):
        return "ja"
    if _CJK.search(text):
        return "zh"
    if _HANGUL.search(text):
        return "ko"
    if _CYRILLIC.search(text):
        return "ru"
    padded = f" {text.lower()} "
    best_lang, best_score = "en", -1
    for lang in sorted(_LANG_HINTS):  # sorted → deterministic tie-break
        score = sum(padded.count(h) for h in _LANG_HINTS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0 else "und"


def count_tokens_ws(text: str) -> int:
    """Whitespace token count."""
    stripped = text.strip()
    if not stripped:
        return 0
    return len(_WS_SPLIT.split(stripped))


def count_tokens_bpe_ish(text: str) -> int:
    """BPE-ish regex token count: words / numbers / CJK chars / punct marks."""
    return len(_TOKEN_RE.findall(text))


def quality_score(text: str) -> Dict[str, float]:
    """Length/punctuation/stopword quality features + composite score.

    Composite: start at 1.0; penalize very short texts, punctuation-heavy
    texts, and (for Latin text) a stopword ratio far from natural prose.
    """
    n_chars = len(text)
    tokens = _WS_SPLIT.split(text.strip()) if text.strip() else []
    n_tokens = len(tokens)
    n_punct = len(_PUNCT.findall(text))
    punct_ratio = n_punct / n_chars if n_chars else 0.0
    n_stop = sum(1 for t in tokens if t.lower().strip(".,!?;:") in _STOPWORDS_EN)
    stop_ratio = n_stop / n_tokens if n_tokens else 0.0
    mean_word_len = (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0

    score = 1.0
    if n_chars < 50:
        score -= 0.5
    if punct_ratio > 0.3:
        score -= 0.3
    if mean_word_len > 15 or (n_tokens > 0 and mean_word_len < 2):
        score -= 0.2
    score = max(score, 0.0)

    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "mean_word_len": mean_word_len,
        "quality": score,
    }
