"""Distributed model training for data curation: the fasttext-style
quality/domain classifier rung of an LLM pipeline (CCNet / GPT-3-style
filtering trains a cheap linear classifier and keeps what scores
"high-quality"), expressed on Spark MLlib so training and inference are
the same cluster job as the rest of the pipeline.

Training is iterative (LBFGS) => no SQL oracle; separability and
calibration are gated in tests/test_ml.py (held-out AUC floor), and the
split is the same content-addressed hashing every curation operator
uses, so train/test membership is reproducible across re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .curation import _md5_bucket
from .registry import query

_N_FEATURES = 1 << 15  # hashed token space (fasttext-bucket analog)


def train_quality_classifier(train: DataFrame):
    """Fit hashed-token logistic regression on (toks array, label
    double). Returns the fitted PipelineModel.

    Scale: HashingTF is stateless and map-only (no vocabulary build —
    the property that makes fasttext-style training one pass); LBFGS
    iterations are Spark jobs over cached hashed features; the model
    is one dense coefficient vector (128 KiB at 2^15 features) that
    broadcasts for inference."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=_N_FEATURES
    )
    lr = LogisticRegression(
        maxIter=20, regParam=0.01, featuresCol="features", labelCol="label"
    )
    return Pipeline(stages=[tf, lr]).fit(train)


#: boilerplate tokens injected into the synthetic "junk" class. The
#: driver corpus is random draws from ONE shared vocabulary (language
#: and source carry no token signal — verified before choosing this
#: design), so the junk class is PLANTED: half the docs get an SEO-spam
#: style boilerplate tail. The classifier must recover the plant from
#: hashed features alone — which exercises exactly the machinery a real
#: quality filter uses (on real corpora the label column comes from
#: human ratings or a reference corpus; everything downstream is
#: identical).
_JUNK_TAIL = " click here buy now subscribe free offer limited deal"


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, toks, label, bucket): docs with even ids
    become the junk class (boilerplate tail appended, label 1); the
    split bucket is content-addressed from the ORIGINAL text, so
    train/test membership survives the corruption and re-ingestion."""
    d = load(spark, sf_dir, "documents")
    corrupted = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(_JUNK_TAIL))
    ).otherwise(F.col("text"))
    return d.select(
        "doc_id",
        F.split(F.lower(corrupted), r"\s+").alias("toks"),
        (F.col("doc_id") % 2 == 0).cast("double").alias("label"),
        _md5_bucket(F.col("text")).alias("bucket"),
    )


@query(
    "pipeline_quality_classifier",
    None,
    "Fasttext-style quality classifier (round-9): hashed-token (2^15) "
    "logistic regression trained on the content-hash 80% split to "
    "separate clean documents from the planted boilerplate-junk class "
    "— the GPT-3/CCNet curation-filter shape (the synthetic corpus "
    "has no organic signal: every language draws from one vocabulary, "
    "so the junk class is planted; a real corpus swaps in rated "
    "labels, everything downstream identical). Iterative LBFGS "
    "training => rows-only driver check; held-out AUC >= 0.99 gated "
    "in tests/test_ml.py. Output: held-out confusion counts.",
)
def pipeline_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one pass to hashed features (stateless, map-only), LBFGS
    over cached features (MLlib treeAggregate — partial gradient
    per partition, log-depth combine), broadcast coefficients for
    inference; nothing driver-side except the 128 KiB model. The
    inference output feeds the same keep/drop plumbing as
    pipeline_quality_filter."""
    lab = _labeled(spark, sf_dir)
    model = train_quality_classifier(
        lab.filter(F.col("bucket") < 80).select("toks", "label")
    )
    held = model.transform(lab.filter(F.col("bucket") >= 80))
    return (
        held.groupBy(F.col("label").cast("long").alias("is_junk"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("prediction") == 1.0).cast("long")).alias(
                "n_flagged"
            ),
        )
        .orderBy("is_junk")
    )
