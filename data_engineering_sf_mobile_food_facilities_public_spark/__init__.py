"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo
``EstherTong/Data_Engineering_SF_Mobile_Food_Facilities_Public``.

The reference (851-line ``airflow.py``) is a single-node pandas/Postgres
ETL DAG; this package re-expresses every operator it contains (SURVEY.md
section 2) as idiomatic, lazily-planned Spark DataFrame / SQL operations that
are designed to run on a multi-executor cluster at 100 TB scale, plus the
LLM-training-data extensions (dedup, similarity search, text analysis,
multimodal plumbing) called for by BASELINE.json.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, sane shuffle config)
- ``catalog``    fixed StructType registry + parquet loaders + view registration
- ``sources``    csv / json / jdbc / parquet connectors (reference S1-S11)
- ``operators``  joins, dedup, windows, constraints, top-k, replicate,
                 minhash/simhash/embedding near-dup, similarity search
- ``functions``  scalar function library (dates, text analysis, vectors, json)
- ``plans``      whole queries: flagship, TPC-H-ish bench suite, the 11-table
                 SF normalization pipeline
- ``streaming``  Structured Streaming surface for the events table
- ``ml``         VectorAssembler + LinearRegression parity (reference M1-M2)
- ``multimodal`` binary-column (image/audio) plumbing over mapInPandas
"""

__version__ = "0.1.0"
