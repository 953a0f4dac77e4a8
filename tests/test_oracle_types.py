"""Oracle OUTPUT-TYPE guard — closes the HUGEINT class of driver reds.

The driver's value hash is representation-sensitive: DuckDB types
``sum(BIGINT)`` (and int window sums, ``//`` on them, etc.) as HUGEINT,
which Arrow fetches as ``decimal128(38,0)`` and pandas renders as
float64 — so ``8000`` hashes as ``8000.0`` while Spark's bigint hashes
as ``8000``.  Values match, hashes don't (rounds 7-8 red rows:
``token_budget_mixture``, ``corpus_curation_pipeline``,
``sequence_packing_bins``).  Oracle SQL must therefore be TYPE-exact,
never merely value-equal.

This suite executes every oracle as ``SELECT * FROM (...) LIMIT 0``
through DuckDB, fetches the Arrow schema, and asserts:

1. no output column is HUGEINT (``decimal128(38,0)``/``decimal256``)
   unless the Spark twin's field is genuinely DecimalType; and
2. the per-column type KIND (int/float/decimal/bool/str/date/timestamp/
   binary/list/struct/map) matches the Spark plan's schema, column by
   column — any kind skew is exactly the repr drift the driver's hash
   punishes.

LIMIT 0 means no data is scanned; the Spark side only builds the plan
(``df.schema`` is analysis-time).  Cheap enough to run over all pairs.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.parity import TESTDATA_TABLES

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

_HUGE = ("decimal128(38, 0)", "decimal256")


def _arrow_kind(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _spark_kind(t: T.DataType) -> str:
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, (T.StringType, T.VarcharType, T.CharType)):
        return "str"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.ArrayType):
        return "list"
    if isinstance(t, T.StructType):
        return "struct"
    if isinstance(t, T.MapType):
        return "map"
    if isinstance(t, T.NullType):
        return "null"
    return t.simpleString()


@pytest.fixture(scope="module")
def oracle_schemas():
    """Arrow schema of every oracle at LIMIT 0 (no rows scanned)."""
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_ORACLE}/{t}.parquet')"
            )
        out = {}
        for name, sql in ORACLES.items():
            out[name] = con.execute(
                f"SELECT * FROM ({sql}) __q LIMIT 0"
            ).fetch_arrow_table().schema
        return out
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types(spark, oracle_schemas, name):
    duck = oracle_schemas[name]
    spark_fields = {f.name: f.dataType for f in QUERIES[name](spark, SF_ORACLE).schema}

    assert sorted(f.name for f in duck) == sorted(spark_fields), (
        f"{name}: column-name mismatch oracle={[f.name for f in duck]} "
        f"spark={sorted(spark_fields)}"
    )

    problems = []
    for f in duck:
        stype = spark_fields[f.name]
        if str(f.type).startswith(_HUGE) and not isinstance(stype, T.DecimalType):
            problems.append(
                f"{f.name}: oracle exposes {f.type} (DuckDB HUGEINT) but Spark "
                f"emits {stype.simpleString()} — add CAST(... AS BIGINT) in the "
                f"oracle SQL"
            )
            continue
        dk, sk = _arrow_kind(f.type), _spark_kind(stype)
        if dk != sk:
            problems.append(
                f"{f.name}: kind mismatch oracle={f.type} ({dk}) vs "
                f"spark={stype.simpleString()} ({sk})"
            )
    assert not problems, f"{name}: " + "; ".join(problems)
