"""Linear-regression parity (reference M1-M2, SURVEY.md section 2.11).

The reference imports VectorAssembler / LinearRegression /
RegressionEvaluator (``/root/reference/airflow.py:21-23``) for a
notebook-side regression of popularity vs. branch count
(``report.pdf p.9``).  Engine equivalents:

- ``ols_simple``: closed-form one-feature OLS in exact DECIMAL sums —
  oracle-checkable (same arithmetic in any engine) and shuffle-light
  (one aggregate);
- ``linreg_pipeline``: the pyspark.ml pipeline (assembler -> LinearRegression
  with the deterministic "normal" solver -> RMSE/R2), the direct M1-M2
  translation for multi-feature models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_simple(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Single-feature OLS slope/intercept via exact decimal sums:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept = (Sy - slope*Sx)/n.
    All sums are DECIMAL (order-independent); division to double at the edge.
    """
    x = F.col(x_col).cast("decimal(18,2)")
    y = F.col(y_col).cast("decimal(18,2)")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n").cast("decimal(38,6)")
    slope_num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    slope_den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = slope_num / slope_den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    return agg.select(
        F.col("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def linreg_pipeline(train: DataFrame, feature_cols: list[str], label_col: str) -> DataFrame:
    """pyspark.ml pipeline: VectorAssembler -> LinearRegression("normal"
    solver: deterministic closed form) -> one-row metrics DataFrame."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    assembled = assembler.transform(train).select("features", F.col(label_col).alias("label"))
    model = LinearRegression(solver="normal", regParam=0.0).fit(assembled)
    pred = model.transform(assembled)
    rmse = RegressionEvaluator(metricName="rmse").evaluate(pred)
    r2 = RegressionEvaluator(metricName="r2").evaluate(pred)
    spark = train.sparkSession
    # metrics round to 6dp: the normal-equation X^T X accumulates in
    # partition order, so raw rmse/r2 differ in the ~13th significant
    # digit across partition counts (measured local[4] vs local[32]) —
    # the one registry query the full-registry determinism sweep caught.
    # Reported metrics are not comparison keys; 6dp is the edge-rounding
    # convention everywhere else.
    return spark.createDataFrame(
        [(train.count(), round(float(rmse), 6), round(float(r2), 6), len(feature_cols))],
        "n_rows long, rmse double, r2 double, n_features int",
    )


def logreg_embedding_pipeline(
    df: DataFrame, vec_col: str, label_col: str, id_col: str = "vec_id", dim: int = 64
) -> DataFrame:
    """Classification twin of :func:`linreg_pipeline`, used as a LABEL-
    PREDICTABILITY PROBE: train multinomial logistic regression to
    predict a metadata label from the embedding vector and report train
    vs held-out accuracy.  In a curation pipeline this answers "does
    this label leak into (or cluster in) embedding space?" — held-out
    accuracy at chance means the label carries no geometric signal (true
    for this synthetic corpus, asserted in tests); accuracy well above
    chance on, say, `source` would flag provenance leakage before
    training.  The ``array<float>`` column converts to an ml vector
    JVM-side (``array_to_vector`` — no Python row work) and the 80/20
    split is the engine's deterministic md5 hash split (never
    ``rand()``).  Returns one row:
    (n_train, n_test, n_classes, train_accuracy, test_accuracy).

    At 100 TB: LogisticRegression trains by L-BFGS over
    ``treeAggregate`` — gradient partials combine per partition and
    merge in a tree, so cost per iteration is one pass over the cached
    training fold; the embedding vectors never collect to the driver.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    # validate the embedding width up front: a ragged or mis-declared
    # vector column would otherwise surface as an opaque L-BFGS shape
    # error mid-train (fail-fast beats fail-deep on a 100 TB input)
    df = df.filter(F.size(F.col(vec_col)) == dim)

    feat = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
        # deterministic split: md5 of the row key, engine-portable
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("lr"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
            .cast("long") % 5 < 4
        ).alias("is_train"),
    )
    train = feat.filter("is_train").drop("is_train")
    test = feat.filter(~F.col("is_train")).drop("is_train")
    model = LogisticRegression(maxIter=50, regParam=0.01).fit(train)
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    train_acc = ev.evaluate(model.transform(train))
    test_acc = ev.evaluate(model.transform(test))
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                train.count(),
                test.count(),
                int(model.numClasses),
                float(train_acc),
                float(test_acc),
            )
        ],
        "n_train long, n_test long, n_classes int,"
        " train_accuracy double, test_accuracy double",
    )
