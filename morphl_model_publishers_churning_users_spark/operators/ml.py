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
from ._shared import t


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


@register("ml_crossval")  # rows-only: fold metrics are model-dependent
def ml_crossval(spark, sf_dir):
    """Hyperparameter tuning: 3-fold CrossValidator over a regParam grid.
    Fits run sequentially over folds but each fit is distributed — at
    scale, parallelism=k evaluates grid points concurrently. Returns the
    per-gridpoint mean AUC and the chosen value, the tuning evidence the
    reference's hand-picked model never had."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    class MetadataSafeAUC(BinaryClassificationEvaluator):
        """The JVM evaluator validates the rawPrediction column's
        ML-attribute *metadata*, not the vectors: a fold whose training
        data is single-class stamps numClasses=1 metadata even though
        binomial LR still emits length-2 vectors. Stripping the stale
        metadata lets evaluation proceed on the actual vectors."""

        def _evaluate(self, dataset):
            col = self.getRawPredictionCol()
            clean = dataset.withColumn(col, F.col(col).alias(col, metadata={}))
            return super()._evaluate(clean)

    labeled = churn.label_churn(churn.user_features(spark, sf_dir))
    # Stratified fold assignment: hash within each class so every fold
    # sees the minority class whenever it has >= numFolds members (the
    # fixture's positive rate is ~7%; random folds can go single-class).
    labeled = labeled.withColumn(
        "fold",
        F.pmod(F.xxhash64(F.col("user_id"), F.col("churned"), F.lit(7)), F.lit(3)).cast("int"),
    )
    pipeline = churn.build_ml_pipeline()
    lr = pipeline.getStages()[-1]
    grid = ParamGridBuilder().addGrid(lr.regParam, [0.01, 0.5]).build()
    evaluator = MetadataSafeAUC(
        labelCol="churned", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=3,
        foldCol="fold",
        parallelism=2,
        seed=42,
    )
    fitted = cv.fit(labeled)
    best_reg = fitted.bestModel.stages[-1].getRegParam()
    rows = [
        (float(pm[lr.regParam]), float(m), float(pm[lr.regParam]) == float(best_reg))
        for pm, m in zip(grid, fitted.avgMetrics)
    ]
    return spark.createDataFrame(rows, "reg_param double, mean_auc double, is_best boolean")


@register("ml_kmeans_segment")  # rows-only: centroid assignment is engine-specific
def ml_kmeans_segment(spark, sf_dir):
    """User segmentation (the audience-bucketing companion to churn
    scoring): per-user behavioral features → standardized vector →
    distributed KMeans (k=4, fixed seed) → per-segment profile (size +
    mean activity). Training is MLlib-distributed — unlike the
    reference's single-node fit — so the same code segments 10^9 users.
    Sanity (non-empty clusters, stable k) asserted in tests/test_ml.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml import Pipeline

    feats = churn.user_features(spark, sf_dir)
    cols = [c for c in feats.columns if c not in ("user_id", "last_ts")]
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=cols, outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features", withMean=True),
            KMeans(k=4, seed=42, featuresCol="features", predictionCol="segment"),
        ]
    )
    segmented = pipe.fit(feats).transform(feats)
    return (
        segmented.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("n_events"), 6).alias("avg_events"),
        )
        .orderBy("segment")
    )


@register("ml_rf")  # rows-only: tree ensembles aren't SQL-expressible
def ml_rf(spark, sf_dir):
    """Tree-ensemble alternative to the linear model: RandomForest on the
    same churn features — captures non-linear feature interactions the
    LR pipeline can't. Spark ML trees train distributed (per-node split
    search is a shuffle-light aggregate over feature bins; deterministic
    under a fixed seed). Returns per-feature Gini importances — the
    model-level parity artifact for judging against the reference's
    feature ranking."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    labeled = churn.label_churn(churn.user_features(spark, sf_dir))
    assembled = VectorAssembler(
        inputCols=churn.FEATURE_COLS, outputCol="features", handleInvalid="keep"
    ).transform(labeled)
    rf = RandomForestClassifier(
        featuresCol="features", labelCol="churned", numTrees=20, maxDepth=5, seed=42
    )
    model = rf.fit(assembled)
    rows = [
        (name, round(float(imp), 6))
        for name, imp in zip(churn.FEATURE_COLS, model.featureImportances.toArray())
    ]
    return spark.createDataFrame(rows, "feature string, importance double")


@register("ml_pca_embed")  # rows-only: eigendecomposition isn't SQL-expressible
def ml_pca_embed(spark, sf_dir):
    """PCA variance spectrum of the embedding space — the
    dimensionality-reduction readout (how many components carry the
    corpus's variance) that sizes IVF cells and compressed indexes.
    Spark ML PCA: one distributed covariance accumulation (Gramian is a
    map-side-combinable sum of outer products), eigendecomposition on
    the driver — the k×d result is tiny. Component SIGNS are
    eigensolver-arbitrary, so the operator returns the per-component
    explained-variance ratios (sign-free and deterministic), not the
    loadings."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    e = t(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = PCA(k=8, inputCol="features", outputCol="pca").fit(e)
    rows = [
        (i, round(float(v), 6)) for i, v in enumerate(model.explainedVariance.toArray())
    ]
    return spark.createDataFrame(rows, "component int, explained_variance double")
