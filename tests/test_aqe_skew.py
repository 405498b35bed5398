"""AQE runtime skew handling: the second defense layer SCALE.md names.

Builds a join where one key owns ~95% of the left side and asserts the
executed adaptive plan marked the sort-merge join as skew-handled
(``skew=true``) — i.e. AQE actually split the hot partition at runtime.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # thresholds low enough that the test-sized skew triggers the optimization
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hot = spark.range(200_000).select(
            F.lit(7).alias("k"), F.concat(F.lit("payload-"), F.col("id")).alias("v")
        )
        cold = spark.range(10_000).select(
            (F.col("id") % 100).alias("k"),
            F.concat(F.lit("cold-"), F.col("id")).alias("v"),
        )
        left = hot.unionByName(cold)
        # NOTE: no explicit repartition on either side — AQE's skew-join
        # rule only splits ENSURE_REQUIREMENTS shuffles; a user-forced
        # REPARTITION_BY_NUM pins the partitioning and opts out (itself a
        # scale lesson: don't hand-repartition join inputs you want AQE
        # to protect).
        right = spark.range(100).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("d")
        )

        joined = left.join(right, "k")
        rows = joined.collect()  # executes THIS DataFrame's queryExecution
        assert len(rows) == 210_000

        # the cached queryExecution now holds the finalized adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
