"""File connectors: parquet (primary), CSV (reference staging format).

The reference stages every inter-task handoff as schemaless headered CSV
on S3 (``/root/reference/airflow.py:746-751, 762-767, 275-298``), which
re-infers types on every read — the NaN/null round-trip hazard SURVEY.md
section 4.3.3 flags.  The engine's rule: *CSV never infers*.  Every read
takes an explicit StructType; empty strings are read as nulls
(``nullValue ''``) which matches how the nulls were written, so a
write -> read round-trip is lossless for null semantics.

Parquet is the analytical format (``airflow.py:704-713`` got there via
driver-side ``toPandas()``; here writes are executor-parallel, optionally
partitioned/bucketed for downstream pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: headered CSV sink (distributed; one file per partition)."""
    df.write.mode(mode).option("header", True).option("nullValue", "").csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S6: CSV scan with a mandatory explicit schema (no inference)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("nullValue", "")
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S9: parquet sink, executor-parallel (never collects to the driver).
    ``partition_by`` enables partition pruning for downstream readers —
    the 100 TB default for time- or tenant-keyed tables."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite") -> None:
    """XML sink (built-in since Spark 4): executor-parallel, one
    document per partition file.  Same rule as CSV: the sink exists for
    interchange with legacy feeds, not as an analytical format."""
    df.write.mode(mode).option("rowTag", row_tag).format("xml").save(path)


def read_xml(
    spark: SparkSession, path: str, schema: T.StructType, row_tag: str = "row"
) -> DataFrame:
    """XML scan with a mandatory explicit schema (no inference) — XML
    inference is a full extra pass over the data at scale."""
    return (
        spark.read.schema(schema).option("rowTag", row_tag).format("xml").load(path)
    )
