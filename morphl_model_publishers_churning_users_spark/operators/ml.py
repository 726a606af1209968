"""§2.I — ML pipeline operators (the reference's reason to exist).

Each op exposes one stage of plans/churn.py through the driver contract.
ml_label is SQL-expressible and oracle-checked; the MLlib stages are
rows-only (driver records the weaker check) and property-tested in
tests/test_ml.py (AUC > 0.5, split disjointness, scaling moments).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..plans import churn
from ..registry import register


@register(
    "ml_label",
    oracle="""
SELECT user_id, MAX(ts) AS last_ts,
       CASE WHEN MAX(ts) < TIMESTAMP '2024-01-29 20:00:00' THEN 1 ELSE 0 END AS churned
FROM events GROUP BY user_id
""",
)
def ml_label(spark, sf_dir):
    """Churn labeling — recency threshold over last activity, the
    reference's target definition."""
    labeled = churn.label_churn(churn.user_features(spark, sf_dir))
    return labeled.select("user_id", "last_ts", "churned")


@register("ml_features")  # rows-only: VectorUDT/scaling not SQL-expressible
def ml_features(spark, sf_dir):
    """Feature assembly + standardization (VectorAssembler/StandardScaler
    fitted distributed — the reference scaled on a single node)."""
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    feats = churn.user_features(spark, sf_dir)
    assembled = VectorAssembler(
        inputCols=churn.FEATURE_COLS, outputCol="features_raw"
    ).transform(feats)
    model = StandardScaler(
        inputCol="features_raw", outputCol="features", withMean=True
    ).fit(assembled)
    out = model.transform(assembled)
    arr = vector_to_array("features")
    return out.select(
        "user_id",
        *[F.round(arr.getItem(i), 6).alias(f"f_{name}") for i, name in enumerate(churn.FEATURE_COLS)],
    )


@register("ml_split")  # rows-only: split membership is engine-defined
def ml_split(spark, sf_dir):
    """Deterministic hash-bucket train/test split (cluster-stable, unlike
    randomSplit which depends on partition layout)."""
    labeled = churn.label_churn(churn.user_features(spark, sf_dir))
    train, test = churn.split_train_test(labeled)
    return train.select("user_id", F.lit("train").alias("split")).unionByName(
        test.select("user_id", F.lit("test").alias("split"))
    )


@register("ml_train")  # rows-only: model internals
def ml_train(spark, sf_dir):
    """Distributed LogisticRegression fit; returns the fitted coefficients
    (one row per feature) as evidence of the fit."""
    labeled = churn.label_churn(churn.user_features(spark, sf_dir))
    model, _, _ = churn.fit_with_fallback(labeled)
    lr = model.stages[-1]
    coefs = [(name, float(c)) for name, c in zip(churn.FEATURE_COLS, lr.coefficients)]
    coefs.append(("__intercept__", float(lr.intercept)))
    return spark.createDataFrame(coefs, "feature string, coefficient double")


@register("ml_eval")  # rows-only: metric of a fitted model
def ml_eval(spark, sf_dir):
    """AUC on the held-out hash-bucket split."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    labeled = churn.label_churn(churn.user_features(spark, sf_dir))
    model, _, eval_set = churn.fit_with_fallback(labeled)
    scored = model.transform(eval_set)
    auc = BinaryClassificationEvaluator(
        labelCol="churned", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(scored)
    return spark.createDataFrame([("areaUnderROC", float(auc))], "metric string, value double")


@register("ml_infer")  # rows-only: probabilities are model-dependent
def ml_infer(spark, sf_dir):
    """Batch inference: churn probability for every user (the table the
    reference served from Cassandra via its REST API)."""
    return churn.run(spark, sf_dir)
