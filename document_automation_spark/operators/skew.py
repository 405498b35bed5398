"""Skew-aware aggregation: two-phase salted group-by + host utilities.

The reference has NO skew handling (SURVEY.md §4 — ``batch_size=1`` is its
only crude guard); at 10^12 Common-Crawl rows, host-level Zipf skew is the
dominant operational risk: one hot host (a few % of all urls) lands on one
reducer and stalls the stage.  Two explicit mechanisms, composable with
AQE's runtime skew-join splitting:

* ``salted_agg`` — the classic two-phase rewrite: ``groupBy(key, salt)``
  partial-aggregates ``n_salt``-way-split hot groups, then a second tiny
  ``groupBy(key)`` merges the partials.  Correct for any algebraic
  aggregate (sum/count/min/max); result is IDENTICAL to the naive plan,
  so the DuckDB oracle is the plain GROUP BY.
* ``hot_keys`` — data-dependent hot-key detection by sampling: salt ONLY
  keys above a frequency threshold (salting cold keys doubles their
  shuffle volume for nothing).
* ``host_of`` — url → host, the natural skew key of web corpora.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url_col: Column) -> Column:
    """url → host (``parse_url`` runs JVM-side, no UDF)."""
    return F.parse_url(url_col, F.lit("HOST"))


def hot_keys(
    df: DataFrame, key_col: str, threshold_fraction: float = 0.01, sample_fraction: float = 0.1
) -> List:
    """Sample-estimate keys owning more than ``threshold_fraction`` of rows.

    One cheap sampled aggregation; the returned list is driver-sized by
    construction (at most 1/threshold_fraction keys can exceed the
    threshold)."""
    sample = df.sample(fraction=sample_fraction, seed=42)
    total = sample.count()
    if total == 0:
        return []
    counts = (
        sample.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= total * threshold_fraction)
        .collect()
    )
    return [row[key_col] for row in counts]


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict,
    n_salt: int = 16,
    salt_only: List | None = None,
) -> DataFrame:
    """Two-phase salted aggregation, result-identical to a plain groupBy.

    ``aggs`` maps output column name → ("sum"|"count"|"min"|"max",
    input column) — the algebraic aggregates whose partials re-merge with
    the same function (count partials re-merge with SUM).

    ``salt_only``: restrict salting to these (hot) key values; cold keys
    get salt 0 and skip the extra split.  Phase 2's input has at most
    ``n_groups × n_salt`` rows — always tiny.
    """
    first_key = F.col(key_cols[0])
    if salt_only is None:
        # partition-id salt: deterministic per task, uniform enough to
        # split any hot group across ~n_salt reducers
        salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salt))
    else:
        salt = F.when(
            first_key.isin(list(salt_only)),
            F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salt)),
        ).otherwise(F.lit(0))

    phase1_aggs = []
    phase2_aggs = []
    for out_name, (fn, col) in aggs.items():
        partial = f"__p_{out_name}"
        if fn == "count":
            phase1_aggs.append(F.count(col if col != "*" else F.lit(1)).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out_name))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out_name))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(partial))
            phase2_aggs.append(F.min(partial).alias(out_name))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(partial))
            phase2_aggs.append(F.max(partial).alias(out_name))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")

    partials = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    return partials.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    n_salt: int = 16,
    salt_only: List | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join, result-identical to ``fact.join(dim, key_cols,
    how)`` for ``inner``/``left`` joins.

    A sort-merge join on a 95%-hot key puts 95% of the fact table into ONE
    reducer; AQE's skew-join split fixes this at runtime, but only for
    shuffle joins it can see the sizes of — this is the explicit/manual
    lever for when AQE is unavailable (plan boundaries, disabled, or a
    storage-partitioned join).  Mechanism: every fact row gets a
    deterministic task-local salt; the dim side is replicated ``n_salt``
    ways (dims are the small side by definition — replication is cheap);
    the join keys on (key…, salt), splitting each hot key across
    ``n_salt`` reducers.  Each fact row still matches exactly one dim
    replica, so multiplicities are unchanged.  ``salt_only`` restricts
    salting to known-hot key values (cold keys keep salt 0 — no extra dim
    replicas matched, no shuffle inflation).

    ``right``/``full`` joins are rejected: an unmatched dim row would
    surface once per replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    first_key = F.col(key_cols[0])
    task_salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salt))
    if salt_only is None:
        fact_salt = task_salt
    else:
        fact_salt = F.when(first_key.isin(list(salt_only)), task_salt).otherwise(
            F.lit(0)
        )
    salted_fact = fact.withColumn("__salt", fact_salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salt)]))
    )
    return salted_fact.join(salted_dim, [*key_cols, "__salt"], how).drop("__salt")
