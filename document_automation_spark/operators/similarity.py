"""Similarity search over the embeddings table (``embedding:array<float>``).

* ``brute_force_topk``    — exact cosine top-k: broadcast the (small) query
  set against the full corpus, dot products as JVM-side ``F.zip_with`` +
  ``F.aggregate`` folds (no Python in the hot path), ranking window per
  query.  This is the correctness baseline and is already the right plan
  when |queries| is small: one broadcast, zero shuffles of the corpus.
* ``lsh_bucketed_topk``   — the scale path: random-hyperplane LSH (SimHash
  for vectors) assigns each corpus vector to a bucket; a query only scans
  its own bucket (multi-probe = flip ``probe_bits`` bits).  Turns the
  all-pairs scan into |bucket|-sized scans — the IVF/LSH trade: recall < 1
  for a ~2^bits scan reduction.
* ``embedding_near_dup_pairs`` — cosine near-duplicate pairs under a
  blocking key, the embedding leg of the dedup suite.

Hyperplanes are deterministic (seed-derived via blake2b), so every executor
and the pytest oracle agree on bucket ids.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_automation_spark.partitioning import fan_out


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_col(a, b):
    """Cosine similarity of two array<float> columns, computed in double.

    The float32 inputs are widened BEFORE the products — Spark's
    float*float stays float32, which would diverge from a double-math
    oracle; casting the arrays makes every multiply/add an IEEE double op."""
    a_d = a.cast("array<double>")
    b_d = b.cast("array<double>")
    return _dot(a_d, b_d) / (_norm(a_d) * _norm(b_d))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries``: (query_vec_id, query_embedding).  The query side is
    broadcast — the corpus never shuffles; scoring happens map-side in the
    scan stage, then one ranking window on (query, score).

    Norms are precomputed once per row on each side BEFORE the join — with
    |Q| queries the naive formulation folds each corpus vector's norm |Q|
    times and each query norm |corpus| times.
    """
    corpus = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding").cast("array<double>")).alias("e_norm")
    )
    qside = queries.select(
        "query_vec_id",
        "query_embedding",
        _norm(F.col("query_embedding").cast("array<double>")).alias("q_norm"),
    )
    dot = _dot(
        F.col("query_embedding").cast("array<double>"), F.col("embedding").cast("array<double>")
    )
    scored = corpus.crossJoin(F.broadcast(qside)).select(
        "query_vec_id",
        "vec_id",
        F.round(dot / (F.col("q_norm") * F.col("e_norm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic random hyperplanes: unit-free gaussian-ish components
    derived from blake2b — stable across processes and executors."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            digest = hashlib.blake2b(f"hp-{seed}-{p}-{d}".encode(), digest_size=8).digest()
            (u,) = struct.unpack(">Q", digest)
            # map uniform u to a symmetric value in [-1, 1)
            row.append((u / float(1 << 64)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def bucket_ids(embeddings: DataFrame, planes: List[List[float]]) -> DataFrame:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot_p = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(c) for c in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return embeddings.withColumn("bucket", bucket)


def probe_masks(n_planes: int, probe_bits: int) -> List[int]:
    """XOR masks for multiprobe: the base bucket (mask 0) plus every
    bucket within Hamming distance ``probe_bits`` of it, in deterministic
    (distance, mask-value) order."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probe_bits + 1):
        for combo in combinations(range(n_planes), r):
            mask = 0
            for p in combo:
                mask |= 1 << p
            masks.append(mask)
    return masks


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    probe_bits: int = 0,
    n_tables: int = 1,
    include_scanned: bool = False,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket.

    ``include_scanned=True`` appends ``n_scanned`` — distinct candidate
    cosines the query evaluated across its probed buckets (and tables) —
    the scan budget its recall is bought with.

    Equi-join on bucket id replaces the cross join — at 10^12 vectors this
    is the difference between an impossible scan and a 1/2^planes slice.

    ``probe_bits`` = multiprobe radius: each query also probes EVERY
    bucket within that Hamming distance of its own — an exhaustive radius
    fan-out over all Σ C(n_planes, r) sign-flip masks, NOT the classic
    query-directed multiprobe that orders probes by per-plane dot
    magnitude and visits only the most promising few.  Exhaustive is the
    right trade at small radius/planes (every distance-1 bucket is
    probed, so recall ≥ confidence-ordered at the same radius); a
    confidence-ordered variant would matter once n_planes is large enough
    that the full radius fan-out itself becomes the cost.
    The QUERY side fans out —
    Σ C(n_planes, r) extra rows per query — while the corpus is neither
    re-scanned nor re-bucketed: recall rises at the cost of scanning
    ~(1 + n_planes·…)/2^planes of the corpus instead of 1/2^planes.
    ``n_tables`` = independent hash tables (the OTHER classic recall
    lever): each table uses its own seed-derived hyperplanes, candidates
    union across tables and de-duplicate before ranking.  Tables
    multiply the candidate-scan budget roughly linearly but draw
    INDEPENDENT bucket boundaries, so they recover neighbours a single
    table's boundary cut off — where multiprobe only explores buckets
    adjacent to one table's boundary.

    Measured on the sf0.01 fixture via the ``ann_recall_eval`` seat,
    recall@10 at 4 planes: 0.20 base (1/16 of the corpus scanned) →
    0.30 with 2 tables (~2/16 scanned) → 0.48 multiprobe r=1 (5/16
    scanned) — recall tracks the scan budget; per scanned bucket the two
    levers are comparable here, and they compose (tables × probes).
    """
    q = queries.select(
        F.col("query_vec_id"), F.col("query_embedding").alias("embedding")
    )
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + t)
        corpus_b = bucket_ids(embeddings, planes)
        queries_b = bucket_ids(q, planes).select(
            "query_vec_id", F.col("embedding").alias("query_embedding"), "bucket"
        )
        if probe_bits:
            masks = probe_masks(n_planes, probe_bits)
            queries_b = queries_b.withColumn(
                "bucket",
                F.explode(
                    F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
                ),
            )
        per_table.append(
            corpus_b.join(F.broadcast(queries_b), "bucket").select(
                "query_vec_id",
                "vec_id",
                F.round(
                    cosine_col(F.col("query_embedding"), F.col("embedding")), 6
                ).alias("cosine"),
            )
        )
    scored = per_table[0]
    for more in per_table[1:]:
        scored = scored.unionByName(more)
    if n_tables > 1:
        # a (query, vec) pair found by several tables ranks once
        scored = scored.dropDuplicates(["query_vec_id", "vec_id"])
    if include_scanned:
        scored = scored.withColumn(
            "n_scanned", F.count("*").over(Window.partitionBy("query_vec_id"))
        )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out_cols = ["query_vec_id", "vec_id", "cosine", "rank"]
    if include_scanned:
        out_cols.append("n_scanned")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*out_cols)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, block_col: str = "label"
) -> DataFrame:
    """Cosine near-dup pairs within a blocking key (embedding dedup leg).

    Norms precomputed once per vector (not once per PAIR — a blocked
    self-join visits each vector |block| times)."""
    # fan an under-split scan out BEFORE the blocked self-join: the join
    # key has few distinct values (a blocking key, by design), so the
    # scan-side parallelism is what spreads the pair-scoring work
    with_norm = fan_out(embeddings).select(
        "vec_id",
        block_col,
        "embedding",
        _norm(F.col("embedding").cast("array<double>")).alias("nrm"),
    )
    a, b = with_norm.alias("a"), with_norm.alias("b")
    pairs = a.join(b, on=block_col).filter(F.col("a.vec_id") < F.col("b.vec_id"))
    dot = _dot(
        F.col("a.embedding").cast("array<double>"), F.col("b.embedding").cast("array<double>")
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    sample_size: int = 4096,
    seed: int = 42,
    quantize_dp: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    embedding clusters — the near-dup method that catches *paraphrases*
    exact/MinHash/SimHash text fingerprints cannot (same content, fully
    rewritten surface).

    Pipeline: seeded k-means clusters the corpus (``ivf.train_centroids``
    on a deterministic bounded sample — the same centroids every run, any
    parallelism); cosine pairs form ONLY within a cluster; of every pair
    ≥ ``threshold`` the member with the LOWER ``(centroid_sim, vec_id)``
    key survives — the paper's keep-the-farthest-from-centroid rule (most
    marginal member of each semantic group is kept for diversity), made
    single-pass: a vector is dropped iff ANY above-threshold neighbour has
    a smaller key (greedy-rank canonicalization, same family as
    ``dedup.near_dup_dedup(greedy)`` — for clique-shaped groups it equals
    the paper exactly, for chains it drops transitively).

    Scale shape: no all-pairs join anywhere — pairing is an equi-join on
    the cluster id, O(Σ|cluster|²) like the paper's own per-cluster
    pairwise pass; norms and centroid sims are computed once per VECTOR,
    not per pair; cluster assignment is one numpy matmul per Arrow batch
    (``ivf.assign_buckets``); the loser set distincts on vec_id alone.
    ``quantize_dp`` truncates centroid distances before the argmin — the
    cross-engine parity knob the IVF oracle uses.

    The scored projection feeds THREE plan branches (both pair sides and
    the final join), so it is ALWAYS persisted (round 6 — recomputing the
    cluster assignment per branch was three corpus scans); pass
    ``cache_registry=[]`` to receive the handle for a targeted
    ``unpersist()`` after the terminal action.  One-shot-operator
    contract (same as ``minhash_lsh_candidates``): loop callers without a
    registry should ``spark.catalog.clearCache()`` between rounds or the
    per-call pinned projections accumulate.

    Returns ALL input rows with ``bucket``, ``centroid_sim`` (rounded 6)
    and ``kept`` — filter ``kept`` for the dedup corpus, aggregate for
    accounting.
    """
    import numpy as np

    from document_automation_spark.operators.ivf import assign_buckets, train_centroids

    C = train_centroids(
        embeddings, n_centroids=n_clusters, sample_size=sample_size, seed=seed
    )
    # the numpy assignment kernel fuses with the scan — fan an
    # under-split input out so every core runs a worker (no-op at scale)
    assigned = assign_buckets(fan_out(embeddings), C, quantize_dp=quantize_dp)

    cnorm = np.sqrt((C * C).sum(axis=1))
    cent_arr = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in C])
    cnorm_arr = F.array(*[F.lit(float(v)) for v in cnorm])
    cvec = F.element_at(cent_arr, F.col("bucket") + 1)
    emb_d = F.col("embedding").cast("array<double>")
    sim = F.round(
        _dot(emb_d, cvec) / (_norm(emb_d) * F.element_at(cnorm_arr, F.col("bucket") + 1)),
        6,
    )
    # ALWAYS persist: the scored projection feeds THREE plan branches
    # (both pair sides and the final join) — without the persist the
    # cluster assignment (Python kernel + centroid sims) recomputes per
    # branch, three corpus passes for one (the minhash banded-table
    # precedent: intra-operator reuse, freed with the session cache).
    # cache_registry still hands the caller the handle for a targeted
    # unpersist (pipeline callers).
    scored = assigned.withColumn("centroid_sim", sim).persist()
    if cache_registry is not None:
        cache_registry.append(scored)

    # pair ONLY within a cluster; carry each side's (centroid_sim, vec_id)
    # priority key so the loser is decided pair-locally — no window, no
    # iteration.  Norms once per vector, not per pair.
    narrow = scored.select(
        "vec_id",
        "bucket",
        "centroid_sim",
        emb_d.alias("_e"),
        _norm(emb_d).alias("_n"),
    )
    a, b = narrow.alias("a"), narrow.alias("b")
    pairs = (
        a.join(b, "bucket")
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .where(
            F.round(
                _dot(F.col("a._e"), F.col("b._e")) / (F.col("a._n") * F.col("b._n")), 6
            )
            >= threshold
        )
    )
    losers = (
        pairs.where(
            F.struct(F.col("b.centroid_sim"), F.col("b.vec_id"))
            < F.struct(F.col("a.centroid_sim"), F.col("a.vec_id"))
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        scored.join(losers.withColumn("_lost", F.lit(True)), "vec_id", "left")
        .withColumn("kept", F.col("_lost").isNull())
        .drop("_lost")
    )
