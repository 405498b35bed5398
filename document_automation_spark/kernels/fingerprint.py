"""Deterministic document fingerprints: shingles, MinHash, SimHash, rolling hash.

Pure-Python kernels (no Spark imports) used by both the Spark UDF layer
(operators.dedup / operators.text_analysis) and the pytest oracles, so the
distributed and single-process answers agree exactly.

All hashing is seed-stable across processes (blake2b-based; never Python's
builtin ``hash``, which is randomized per process) — a hard requirement for
a multi-executor cluster where every worker must agree on bucket ids.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List, Sequence

MERSENNE_61 = (1 << 61) - 1
_MAX_HASH = (1 << 61) - 2


def stable_hash64(s: str) -> int:
    """Process-stable 64-bit hash of a string."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def char_shingles(text: str, k: int = 5) -> List[str]:
    """Overlapping character k-grams (code-point based)."""
    if len(text) < k:
        return [text] if text else []
    return [text[i : i + k] for i in range(len(text) - k + 1)]


def _perm_params(num_perm: int, seed: int = 42) -> List[tuple]:
    """Deterministic (a, b) pairs for the universal-hash permutations."""
    params = []
    for i in range(num_perm):
        d = hashlib.blake2b(f"minhash-{seed}-{i}".encode(), digest_size=16).digest()
        a = (int.from_bytes(d[:8], "big") % (MERSENNE_61 - 1)) + 1
        b = int.from_bytes(d[8:], "big") % MERSENNE_61
        params.append((a, b))
    return params


_PERM_CACHE: dict = {}


def minhash_signature(text: str, num_perm: int = 32, k: int = 5, seed: int = 42) -> List[int]:
    """MinHash signature over character k-shingles.

    ``sig[i] = min over shingles of (a_i * h(shingle) + b_i) mod (2^61-1)``.
    Empty text → all-_MAX_HASH sentinel signature.
    """
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    params = _PERM_CACHE[key]

    shingle_hashes = {stable_hash64(s) % MERSENNE_61 for s in char_shingles(text, k)}
    if not shingle_hashes:
        return [_MAX_HASH] * num_perm
    return [min((a * h + b) % MERSENNE_61 for h in shingle_hashes) for (a, b) in params]


def lsh_band_keys(signature: Sequence[int], bands: int = 8) -> List[str]:
    """Split a signature into ``bands`` equal bands; key = band idx + band hash.

    Two documents sharing ANY band key are LSH candidates (the classic
    banding construction: P(candidate) = 1 - (1 - J^r)^b for r rows/band).
    """
    if len(signature) % bands != 0:
        raise ValueError("signature length must be divisible by bands")
    rows = len(signature) // bands
    keys = []
    for b in range(bands):
        band = ",".join(str(v) for v in signature[b * rows : (b + 1) * rows])
        keys.append(f"{b}:{zlib.crc32(band.encode()):08x}")
    return keys


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over character k-shingles (unweighted)."""
    counts = [0] * 64
    for shingle in set(char_shingles(text, k)):
        h = stable_hash64(shingle)
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, base: int = 31, mod: int = 140737488355213) -> int:
    """Polynomial rolling hash over code points: ``h = (h*base + cp) % mod``.

    ``mod`` ≈ 2^47 keeps every intermediate < 2^53, so the identical fold is
    expressible in Spark (``F.aggregate``) and DuckDB (``list_reduce``)
    without bigint overflow — used as a cross-engine oracle check.
    """
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
