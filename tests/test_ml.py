"""MLlib quality-classifier rung (round 9): hashed-token logistic
regression as the fasttext-style curation filter. The junk class is
PLANTED (the synthetic corpus has one shared vocabulary — no organic
signal), so these tests gate that the distributed train/infer machinery
recovers a known signal, not that the corpus is separable."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
from tf_aws_lakeformation_governed_datalake_demo_spark.operators.ml import (
    _labeled,
    train_quality_classifier,
)


def test_quality_classifier_separates_planted_junk(spark, sf_dir):
    """Held-out AUC >= 0.99 and per-class accuracy on the planted
    boilerplate signal — the machinery gate."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    lab = _labeled(spark, sf_dir)
    model = train_quality_classifier(
        lab.filter(F.col("bucket") < 80).select("toks", "label")
    )
    held = model.transform(lab.filter(F.col("bucket") >= 80)).cache()
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(held)
    assert auc >= 0.99, auc
    wrong = held.filter(F.col("prediction") != F.col("label")).count()
    total = held.count()
    assert total > 0 and wrong / total <= 0.02, (wrong, total)
    held.unpersist()


def test_quality_classifier_query_shape(spark, sf_dir):
    """Registry output: one row per class with flag counts — junk
    mostly flagged, clean mostly not (the rows-only driver contract)."""
    rows = {
        r.is_junk: (r.n_docs, r.n_flagged)
        for r in REGISTRY["pipeline_quality_classifier"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {0, 1}
    n0, f0 = rows[0]
    n1, f1 = rows[1]
    assert f1 / n1 >= 0.95  # junk recall
    assert f0 / n0 <= 0.05  # clean false-positive rate
