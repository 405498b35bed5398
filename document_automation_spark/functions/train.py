"""Distributed trainer for the DPR-style ranking objective — the Spark
analogue of the reference's train_dpr_with_haystack.py
(/root/reference/src/train_dpr_with_haystack.py:1-93), which fine-tunes a
HF dual encoder on (question, positive_ctx, hard_negative_ctxs) samples.

No torch exists in this container, so the MODEL is the honest stand-in
(a linear ranker over hashed question×passage interaction features — the
same trade as the hash embedder standing in for the HF encoder); the
TRAINING MECHANICS are the real subject and are fully distributed:

    per epoch:
        driver broadcasts current weights
          → mapInPandas computes per-batch partial gradients of the
            softmax in-candidate-negatives loss (the DPR objective shape:
            -log softmax(score(q, pos) | scores of all candidates))
          → partial gradients reduce by component (posexplode + sum —
            dim rows, never the samples)
          → driver applies the full-batch GD step, repeats.

This is synchronous data-parallel training exactly as a parameter-server-
free Spark job does it: O(dim) bytes per epoch cross the cluster, the
samples never move, and full-batch gradients make the loop deterministic
up to float-sum association (pinned by a parallelism-invariance test at
1e-6).  Swapping the feature map + gradient for a torch model turns this
into Spark-orchestrated mini-batch SGD with the same skeleton.
"""

from __future__ import annotations

import zlib
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_NEGATIVES = 8  # cap candidates per sample (reference batches are small)


def _bow(text: str, dim: int) -> np.ndarray:
    v = np.zeros(dim, dtype="float64")
    for token in (text or "").lower().split():
        v[zlib.crc32(token.encode("utf-8")) % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n else v


def _phi(question: str, passage: str, dim: int) -> np.ndarray:
    """Interaction features: elementwise product of the L2-normalized
    hashed bags — component k is large iff question AND passage share
    mass in bucket k (the linear ranker learns which overlap buckets
    matter)."""
    return _bow(question, dim) * _bow(passage, dim)


def _candidates(row, dim: int) -> Tuple[List[np.ndarray], bool]:
    """[positive_phi, negative_phis...]; ok=False when the sample carries
    no positive or no negatives (no gradient signal)."""
    pos = row["positive_ctxs"]
    negs = row["hard_negative_ctxs"]
    if pos is None or len(pos) == 0 or negs is None or len(negs) == 0:
        return [], False
    q = row["question"]
    feats = [_phi(q, pos[0]["text"], dim)]
    for n in list(negs)[:_MAX_NEGATIVES]:
        feats.append(_phi(q, n["text"], dim))
    return feats, True


def train_ranker(
    samples: DataFrame,
    dim: int = 256,
    epochs: int = 12,
    lr: float = 40.0,
    l2: float = 1e-4,
) -> Tuple[np.ndarray, List[float]]:
    """Full-batch distributed GD on the DPR softmax objective.

    Returns ``(weights, loss_history)``; loss is the mean
    -log P(positive | candidates) over usable samples per epoch.
    The samples DataFrame should be persisted by the caller if it is
    expensive to recompute (it is scanned once per epoch)."""
    spark = samples.sparkSession
    sc = spark.sparkContext
    data = samples.select("question", "positive_ctxs", "hard_negative_ctxs")
    w = np.zeros(dim, dtype="float64")
    history: List[float] = []

    for _ in range(epochs):
        b_w = sc.broadcast(w)

        def grad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv = np.asarray(b_w.value)
            g = np.zeros(dim, dtype="float64")
            loss = 0.0
            n = 0
            for batch in batches:
                for _, row in batch.iterrows():
                    feats, ok = _candidates(row, dim)
                    if not ok:
                        continue
                    X = np.stack(feats)  # (k+1, dim); row 0 = positive
                    s = X @ wv
                    s -= s.max()  # stable softmax
                    p = np.exp(s)
                    p /= p.sum()
                    g += p @ X - X[0]
                    loss += -np.log(max(p[0], 1e-12))
                    n += 1
            out = pd.DataFrame(
                {"idx": np.arange(dim, dtype="int64"), "val": g}
            )
            tail = pd.DataFrame({"idx": [-1, -2], "val": [loss, float(n)]})
            yield pd.concat([out, tail], ignore_index=True)

        parts = data.mapInPandas(grad_batches, "idx long, val double")
        agg = {
            int(r["idx"]): float(r["s"])
            for r in parts.groupBy("idx").agg(F.sum("val").alias("s")).collect()
        }
        n = agg.pop(-2, 0.0)
        loss = agg.pop(-1, 0.0)
        b_w.destroy()
        if n == 0:
            raise ValueError("no trainable samples (positives + hard negatives required)")
        grad = np.zeros(dim, dtype="float64")
        for i, v in agg.items():
            grad[i] = v
        w = w - lr * (grad / n + l2 * w)
        history.append(loss / n)
    return w, history


def rank_eval(samples: DataFrame, weights: np.ndarray, dim: int = 256) -> dict:
    """recall@1 of the ranker over the samples: fraction where the
    positive outranks every hard negative (strict).  One distributed
    pass; ties count as misses (an untrained all-zero ranker scores 0)."""
    spark = samples.sparkSession
    b_w = spark.sparkContext.broadcast(np.asarray(weights, dtype="float64"))

    def eval_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wv = np.asarray(b_w.value)
        hits = 0
        n = 0
        for batch in batches:
            for _, row in batch.iterrows():
                feats, ok = _candidates(row, dim)
                if not ok:
                    continue
                s = np.stack(feats) @ wv
                hits += int(s[0] > s[1:].max())
                n += 1
        yield pd.DataFrame({"hits": [hits], "n": [n]})

    totals = (
        samples.select("question", "positive_ctxs", "hard_negative_ctxs")
        .mapInPandas(eval_batches, "hits long, n long")
        .agg(F.sum("hits").alias("h"), F.sum("n").alias("n"))
        .first()
    )
    n = int(totals["n"] or 0)
    return {
        "n_samples": n,
        "recall_at_1": (int(totals["h"] or 0) / n) if n else 0.0,
    }
