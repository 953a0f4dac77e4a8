"""Fixed-schema catalog for the engine.

The reference infers schemas upstream (JSON/CSV -> pandas ``object``) and
only fixes types at the Postgres DDL (``/root/reference/airflow.py:330-432``)
— a round-trip hazard SURVEY.md section 1.2 calls out.  This engine is
fixed-schema throughout: one ``StructType`` per table, applied at read time,
so Catalyst gets exact types (and parquet readers get exact column pruning)
from the first scan onward.

Two table families:

- the driver's TPC-H-ish test tables (``/root/testdata/sf*/``) used by the
  oracle-paired operator queries, and
- the SF-domain tables (schedule / permit / yelp and the 11 derived tables)
  from FIXTURES.md, used by the normalization pipeline in ``plans/``.
"""

from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver test tables (TESTDATA.md) — schemas match the parquet files exactly.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


# Spark's vectorized parquet reader rejects TIMESTAMP(NANOS) columns as
# TimestampType.  Rather than hard-coding which files are nanos (a data
# regen silently changed events.ts from ns to us between rounds, which a
# hard-coded table list turned into 1000x-too-small timestamps), the
# loader inspects the parquet FOOTER once per (path, column) and only
# takes the nanos fallback — read as long, integer-div to micros, the
# same truncation DuckDB applies — when the footer actually says ns.


def _nanos_ts_cols(path: str, schema: T.StructType) -> tuple[str, ...]:
    """Timestamp-typed columns that the parquet footer stores as
    TIMESTAMP(NANOS) at ``path``.  Footer-only read (no data pages), one
    file sampled when ``path`` is a directory of parts — a writer that
    mixes units within one dataset is already broken upstream."""
    ts_cols = [f.name for f in schema.fields if isinstance(f.dataType, T.TimestampType)]
    if not ts_cols:
        return ()
    return _footer_nanos_cols(path, tuple(ts_cols))


_REMOTE_SCHEMES_WARNED: set[str] = set()


def _resolve_parquet_file(path: str) -> str | None:
    import glob
    import os

    if "://" in path:
        scheme = path.split("://", 1)[0]
        if scheme == "file":
            path = path.split("://", 1)[1]
        else:
            # s3://, hdfs://, ...: os.path/glob can't see these, so the
            # nanos-unit and column-drift guards CANNOT run.  Degrading
            # silently would reintroduce the round-4 failure mode for
            # remote tables, so say it loudly (once per scheme); the
            # remote path would route through pyarrow.fs when needed.
            if scheme not in _REMOTE_SCHEMES_WARNED:
                _REMOTE_SCHEMES_WARNED.add(scheme)
                import logging

                logging.getLogger(__name__).warning(
                    "parquet footer inspection skipped for %s:// path %s: "
                    "nanos-timestamp detection and schema-drift guards are "
                    "INACTIVE for tables on this filesystem",
                    scheme,
                    path,
                )
            return None
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        parts = sorted(
            p
            for pat in ("*.parquet", "part-*")
            for p in glob.glob(os.path.join(path, pat))
            if os.path.isfile(p)
        )
        return parts[0] if parts else None
    return None


_FOOTER_CACHE: dict[str, object] = {}


def _footer_schema(path: str):
    """Parquet-footer schema at ``path`` (None when unreadable).
    Footer-only — no data pages touched.  Only SUCCESSFUL reads are
    cached: a missing file or transient read error must be re-inspected
    on the next load (a stream defined before its first file lands, a
    retried load), not leave the drift/nanos guards permanently no-op
    for that path."""
    if path in _FOOTER_CACHE:
        return _FOOTER_CACHE[path]
    import pyarrow.parquet as pq

    target = _resolve_parquet_file(path)
    if target is None:
        return None
    try:
        schema = pq.read_schema(target)
    except Exception:
        return None
    if len(_FOOTER_CACHE) >= 256:  # bound like the lru it replaces
        _FOOTER_CACHE.pop(next(iter(_FOOTER_CACHE)))
    _FOOTER_CACHE[path] = schema
    return schema


def _footer_nanos_cols(path: str, ts_cols: tuple[str, ...]) -> tuple[str, ...]:
    import pyarrow as pa

    footer = _footer_schema(path)
    if footer is None:
        return ()
    out = []
    for c in ts_cols:
        if c in footer.names:
            t = footer.field(c).type
            if pa.types.is_timestamp(t) and t.unit == "ns":
                out.append(c)
    return tuple(out)


def _check_declared_columns(path: str, schema: T.StructType, name: str) -> None:
    """Fail-loud guard against silent schema drift: Spark's
    ``read.schema(...)`` null-fills columns absent from the file, so a
    testdata regen that renames or drops a column would otherwise turn
    into silent NULLs mid-query (the same failure mode as the round-4
    timestamp-unit drift, in column form).  Footer names are cached; the
    check costs nothing after the first load of a path."""
    footer = _footer_schema(path)
    if footer is None:
        return
    missing = [f.name for f in schema.fields if f.name not in footer.names]
    if missing:
        raise ValueError(
            f"table '{name}' at {path} is missing declared column(s) "
            f"{missing}; file has {footer.names} — testdata schema drift?"
        )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table with its declared schema.

    Parquet is self-describing, so the schema here acts as an assertion +
    pruning contract rather than inference; mismatches surface at read
    time instead of mid-query.  Timestamp columns the footer declares as
    TIMESTAMP(NANOS) are transparently truncated to micros (see
    ``_nanos_ts_cols``); micros/millis columns read natively.
    """
    schema = TESTDATA_SCHEMAS[name]
    path = f"{sf_dir}/{name}.parquet"
    _check_declared_columns(path, schema, name)
    nanos_cols = _nanos_ts_cols(path, schema)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        read_schema = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name in nanos_cols else f.dataType)
                for f in schema.fields
            ]
        )
        df = spark.read.schema(read_schema).parquet(path)
        for c in nanos_cols:
            # integer div — double division would lose precision at 1e18 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df.select(*[f.name for f in schema.fields])
    return spark.read.schema(schema).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (reference S10,
    ``airflow.py:643-652``) so ``spark.sql`` can address them by name."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# SF-domain schemas (FIXTURES.md A1-A4; DDL airflow.py:330-432).
# ---------------------------------------------------------------------------

SF_SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("permit", T.StringType()),
        T.StructField("applicant", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("locationdesc", T.StringType()),
        T.StructField("locationid", T.LongType()),
        T.StructField("cnn", T.LongType()),
        T.StructField("block", T.StringType()),
        T.StructField("optionaltext", T.StringType()),
        T.StructField("coldtruck", T.StringType()),
        T.StructField("addr_date_create", T.StringType()),
        T.StructField("addr_date_modified", T.StringType()),
        T.StructField("dayorder", T.IntegerType()),
        T.StructField("dayofweekstr", T.StringType()),
        T.StructField("starttime", T.StringType()),
        T.StructField("endtime", T.StringType()),
        T.StructField("start24", T.StringType()),
        T.StructField("end24", T.StringType()),
    ]
)

SF_PERMIT_SCHEMA = T.StructType(
    [
        T.StructField("objectid", T.IntegerType()),
        T.StructField("permit", T.StringType()),
        T.StructField("applicant", T.StringType()),
        T.StructField("facilitytype", T.StringType()),
        T.StructField("cnn", T.LongType()),
        T.StructField("address", T.StringType()),
        T.StructField("fooditems", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("approved", T.StringType()),
        T.StructField("received", T.StringType()),
        T.StructField("expirationdate", T.StringType()),
        T.StructField("priorpermit", T.IntegerType()),
        # Socrata computed-region noise columns, dropped by P2 (airflow.py:163)
        T.StructField(":@computed_region_yftq_j783", T.StringType()),
        T.StructField(":@computed_region_p5aj_wyqh", T.StringType()),
        T.StructField(":@computed_region_rxqg_mtj9", T.StringType()),
        T.StructField(":@computed_region_bh8s_q3mv", T.StringType()),
        T.StructField(":@computed_region_fyvs_ahh9", T.StringType()),
    ]
)

SF_YELP_SCHEMA = T.StructType(
    [
        T.StructField("Yelp_id", T.StringType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Review", T.IntegerType()),
        T.StructField("Rating", T.DoubleType()),
        T.StructField("Address", T.StringType()),
        T.StructField("Phone", T.StringType()),
        T.StructField("Latitude", T.DecimalType(8, 6)),
        T.StructField("Longitude", T.DecimalType(9, 6)),
    ]
)
