"""IVF (inverted-file) approximate nearest neighbour — the centroid-
partitioned scale path the task brief names alongside LSH bucketing.

FAISS's IVF design (the reference's index type, gen-sods-doc-image-ray.py's
FAISSDocumentStore) re-expressed relationally:

* **train**: deterministic seeded k-means (kernels/cluster.kmeans_fit) on a
  bounded sample of corpus vectors — the standard IVF recipe (training set
  ≪ corpus), so the driver holds O(n_centroids × sample_per_centroid)
  vectors, never the corpus;
* **assign**: every corpus vector gets its nearest-centroid bucket via one
  Arrow-batched numpy argmin — a narrow map, no shuffle;
* **probe**: each query expands to its ``n_probe`` nearest centroids and
  the search becomes an EQUI-JOIN on bucket id (exactly like the LSH path:
  candidate generation by join key, never a cross join), followed by exact
  cosine + top-k inside the probed buckets.

Recall/latency trade: n_probe = n_centroids degenerates to exact search
(pinned by test); smaller n_probe scans fewer buckets.  At 100 TB the
assigned table is written bucket-partitioned once and every query run
prunes to its probed buckets at the parquet scan.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_automation_spark.kernels.cluster import kmeans_fit
from document_automation_spark.operators.similarity import cosine_col


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
) -> np.ndarray:
    """(n_centroids, dim) float64 centroid matrix from a deterministic
    sample (lowest vec_ids — stable across runs and partitionings)."""
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty embeddings table")
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    centers, _ = kmeans_fit(X, n_centroids, seed=seed)
    return centers


def _centroid_dists(X: np.ndarray, C: np.ndarray, quantize_dp: int | None) -> np.ndarray:
    """(n, k) centroid 'distances' d = |c|² − 2 x·c (|x|² dropped: constant
    per row, so every argmin/argsort over a row is unchanged).

    ``quantize_dp`` truncates d at that many decimals — the cross-engine
    parity knob: the SQL oracle recomputes d as a left-fold, which differs
    from the matmul in the last float bits, so BOTH engines truncate before
    ranking (trunc, not round: half-even vs half-away tie risk) and break
    ties by centroid index."""
    c2 = (C * C).sum(axis=1)
    d = c2[None, :] - 2.0 * (X @ C.T)
    if quantize_dp is not None:
        d = np.trunc(d * 10.0**quantize_dp) / 10.0**quantize_dp
    return d


def assign_buckets(
    embeddings: DataFrame,
    centers: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quantize_dp: int | None = None,
) -> DataFrame:
    """+bucket column = nearest centroid (L2), one numpy matmul per batch."""
    spark = embeddings.sparkSession
    b_centers = spark.sparkContext.broadcast(centers)
    fields = embeddings.schema.fields
    schema = T.StructType(list(fields) + [T.StructField("bucket", T.IntegerType())])
    cols = [f.name for f in fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_centers.value  # (k, dim)
        for batch in it:
            if len(batch) == 0:
                continue
            X = np.array(list(batch[emb_col]), dtype=np.float64)  # (n, dim)
            d = _centroid_dists(X, C, quantize_dp)
            out = batch[cols].copy()
            # ties (possible after quantization) → lowest centroid index,
            # matching the oracle's ORDER BY (d, cid) row_number
            out["bucket"] = np.argmin(d, axis=1).astype(np.int32)
            yield out

    return embeddings.mapInPandas(batches, schema)


def probe_buckets_df(
    queries: DataFrame,
    centers: np.ndarray,
    n_probe: int,
    emb_col: str = "query_embedding",
    quantize_dp: int | None = None,
) -> DataFrame:
    """Each query row → its ``n_probe`` nearest-centroid buckets, one output
    row per (query, bucket) — the same broadcast-centers narrow map as
    :func:`assign_buckets` (argsort top-n instead of argmin), so probe
    assignment is fully distributed: no driver collect anywhere in the
    query path."""
    spark = queries.sparkSession
    b_centers = spark.sparkContext.broadcast(centers)
    fields = queries.schema.fields
    schema = T.StructType(list(fields) + [T.StructField("bucket", T.IntegerType())])
    cols = [f.name for f in fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_centers.value
        # n_probe > n_centroids degrades to probing everything (the
        # recall-tuning 'probe all and then some' call must not crash)
        eff_probe = min(n_probe, C.shape[0])
        for batch in it:
            if len(batch) == 0:
                continue
            X = np.array(list(batch[emb_col]), dtype=np.float64)
            d = _centroid_dists(X, C, quantize_dp)
            probes = np.argsort(d, axis=1, kind="stable")[:, :eff_probe]  # ties → low cid
            out = batch[cols].iloc[np.repeat(np.arange(len(batch)), eff_probe)].copy()
            out["bucket"] = probes.reshape(-1).astype(np.int32)
            yield out

    return queries.mapInPandas(batches, schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    sample_size: int = 4096,
    seed: int = 42,
    quantize_dp: int | None = None,
    include_scanned: bool = False,
) -> DataFrame:
    """ANN top-k per query via IVF probing.

    ``embeddings``: (vec_id, embedding); ``queries``: (query_vec_id,
    query_embedding).  Returns (query_vec_id, vec_id, cosine, rank);
    ``include_scanned=True`` adds ``n_scanned`` — the number of candidate
    cosines this query evaluated (probed-bucket population), the scan
    budget its recall is bought with.
    """
    centers = train_centroids(embeddings, n_centroids, sample_size, seed)
    assigned = assign_buckets(embeddings, centers, quantize_dp=quantize_dp)
    qdf = probe_buckets_df(
        queries.select("query_vec_id", "query_embedding"),
        centers,
        n_probe,
        quantize_dp=quantize_dp,
    )

    candidates = assigned.join(F.broadcast(qdf), "bucket")  # equi-join, no cross join
    scored = candidates.select(
        "query_vec_id",
        "vec_id",
        F.round(
            cosine_col(F.col("query_embedding"), F.col("embedding")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    if include_scanned:
        scored = scored.withColumn(
            "n_scanned", F.count("*").over(Window.partitionBy("query_vec_id"))
        )
    out_cols = ["query_vec_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")]
    if include_scanned:
        out_cols.append("n_scanned")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*out_cols)
    )
