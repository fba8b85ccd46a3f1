"""Driver-contract gates over __spark_entry__: every declared query
must survive the driver's canonicalizer (pandas sort over collected
cells — list/dict cells are unhashable and crash the compare, the
exact r04 embed_quantize failure), and every query with an oracle must
agree on column names (the compare sorts columns by name before
hashing values, so a name mismatch hash-fails even on equal values).
These run on SCHEMAS only — no query executes."""

import os
import re

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


def test_declared_queries_have_scalar_schemas(spark, entry_mod):
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        offending = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if offending:
            bad[name] = offending
    assert not bad, f"non-scalar columns crash the driver compare: {bad}"


def test_every_oracle_key_is_declared(entry_mod):
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs, f"orphan oracle keys: {sorted(oracles - qs)}"
    # Full-strength contract: every declared query has an exact oracle.
    assert qs <= oracles, f"rows-only keys: {sorted(qs - oracles)}"


def test_oracle_sql_selects_matching_columns(spark, entry_mod):
    """Cheap static screen: every Spark column name appears as a word
    in its oracle SQL (aliases must match on both sides; the full
    value compare runs in oracle_check.py / the driver)."""

    oracles = entry_mod.oracle_sql()
    bad = {}
    for name, fn in entry_mod.queries().items():
        sql = oracles[name].lower()
        cols = [c.lower() for c in fn(spark, SF_DIR).columns]
        missing = [
            c for c in cols if not re.search(rf"[^a-z0-9_]{re.escape(c)}[^a-z0-9_]", f" {sql} ")
        ]
        if missing:
            bad[name] = missing
    assert not bad, f"columns absent from oracle SQL: {bad}"
