"""End-to-end gate: every __spark_entry__ query matches its DuckDB
oracle at sf0.001 (mirrors the driver's CORRECTNESS check)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from oracle_check import TABLES, compare

from conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = fn(spark, SF_DIR)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check
        return
    res = compare(name, df, duck.sql(oracles[name]))
    assert res["rows_match"], res
    assert res["schema_match"], res
    assert res["values_match"], res


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
