"""Evidence for SCALE.md's AQE claim: the session defaults really do turn
a hot-key sort-merge join into an AQE skew-split at runtime — the plan
SCALE.md §Joins promises for fact-fact joins whose stats exceed the
broadcast threshold at 100 TB. Thresholds are lowered so local-scale data
triggers the same re-plan the default 256 MB threshold fires at cluster
scale; the mechanism (not the threshold) is what's under test."""

from __future__ import annotations

import pyspark.sql.functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
}


def test_aqe_splits_hot_key_join(spark):
    saved = {k: spark.conf.get(k) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id"))
             .alias("k"),
            F.col("id").alias("payload"))
        right = spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        j = left.join(right, "k").groupBy().agg(F.count("*").alias("n"))
        [row] = j.collect()
        # every even id collapses onto k=7, which matches right's single
        # k=7 row; odd ids match 1:1
        assert row["n"] == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew split did not engage"
        assert "AQEShuffleRead" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
