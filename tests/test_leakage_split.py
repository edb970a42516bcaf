"""leakage_safe_split (plans/textops.py): the near-dup-cluster-keyed
train/valid/test split. The load-bearing property is structural — every
near-dup cluster lands in exactly ONE split — plus the rollup must
conserve doc counts and report a non-trivial rescued-doc audit on the
test corpus (the counterfactual leakage a naive doc_id-keyed split
would have caused)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_engineering_spark.functions.hashing import h60
from nfl_data_engineering_spark.plans.base import load
from nfl_data_engineering_spark.plans.registry import _BY_NAME
from nfl_data_engineering_spark.plans.textops import _star_verified_pairs
from nfl_data_engineering_spark.operators.dedup import connected_components


def test_no_cluster_spans_splits(spark, sf_dir):
    caches = []
    labels = connected_components(
        _star_verified_pairs(spark, sf_dir, caches), "d1", "d2")
    for c in caches:
        c.unpersist()
    bucket = (h60(F.concat(F.lit("split_"), F.col("label").cast("string")))
              % 10)
    split = (F.when(bucket <= 7, F.lit("train"))
             .when(bucket == 8, F.lit("valid"))
             .otherwise(F.lit("test")))
    spans = (labels.select("label", split.alias("split"))
             .groupBy("label")
             .agg(F.countDistinct("split").alias("k"))
             .filter(F.col("k") > 1).count())
    assert spans == 0


def test_rollup_conserves_docs_and_audits_rescues(spark, sf_dir):
    out = {r["split"]: r for r in
           _BY_NAME["leakage_safe_split"].spark(spark, sf_dir).collect()}
    n_docs = load(spark, sf_dir, "documents").count()
    assert set(out) == {"train", "valid", "test"}
    assert sum(r["n_docs"] for r in out.values()) == n_docs
    # every rescued doc is by definition in a multi-doc cluster
    for r in out.values():
        assert r["n_rescued_docs"] <= r["n_clustered_docs"] <= r["n_docs"]
    # the testdata corpus has near-dup clusters whose members hash to
    # different naive buckets — the audit must see them, else the entry
    # is indistinguishable from the naive split
    assert sum(r["n_rescued_docs"] for r in out.values()) > 0
