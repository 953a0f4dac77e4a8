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
    return spark.createDataFrame(
        [(train.count(), float(rmse), float(r2), len(feature_cols))],
        "n_rows long, rmse double, r2 double, n_features int",
    )
