"""Differential oracle tests — the same check the driver runs.

For every oracle-paired entry in ``queries()``, run the Spark plan and
the DuckDB SQL on identical parquet and compare row count, column names
and order-insensitive normalized values.  SF dir defaults to sf0.001 for
speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the
driver exactly.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.parity import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    problems = compare(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    # non-SQL-expressible ops: the driver's weaker check — runs, yields >=0 rows
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_panel_prefix_is_stable_and_complete():
    """The driver samples a fixed-size prefix of queries() for its
    CORRECTNESS panel; the curated prefix must stay exactly the
    declared list (a stray registration must not silently displace a
    panel member) and every name must resolve."""
    qs = entrymod.queries()
    names = list(qs)
    assert names[: len(entrymod._PANEL_FIRST)] == entrymod._PANEL_FIRST
    assert len(set(names)) == len(names)
    # the panel keeps full §2 + sf_* + one-per-family coverage
    assert [n for n in entrymod._PANEL_FIRST if n.startswith("sf_")] == [
        n for n in names[:50] if n.startswith("sf_")
    ]
    assert len(entrymod._PANEL_FIRST) == 50
    # the two blocks must stay disjoint, and every rotating member must be
    # oracle-paired (the rotation exists to get STRONG external checks on
    # new work, not rows-only ones)
    assert not set(entrymod._PANEL_CORE) & set(entrymod._PANEL_ROTATING)
    oracles = entrymod.oracle_sql()
    assert all(n in oracles for n in entrymod._PANEL_ROTATING)
