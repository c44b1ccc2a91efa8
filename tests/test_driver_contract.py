"""Driver-contract guards.

Round 1 lost two queries to the driver's result canonicalizer crashing
on array-typed columns. These tests enforce the contract statically:
every ``queries()`` entry must produce a FLAT schema (no array/struct/
map reaches the driver), every oracle must be syntactically valid
DuckDB SQL (EXPLAIN — no execution), and oracle keys must be a subset
of query keys."""

import os
import sys

import duckdb
import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as E
    return E


def test_all_query_schemas_are_flat(spark, entrymod):
    bad = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)          # plan only; nothing executes
        nested = [f.name for f in df.schema.fields
                  if isinstance(f.dataType, (ArrayType, StructType,
                                             MapType))]
        if nested:
            bad[name] = nested
    assert not bad, bad


def test_oracle_keys_subset_of_queries(entrymod):
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, os_ - qs
    # since round 3 every query carries an oracle (cross-execution
    # twins cover the seeded sketch/ANN ops, generative-formula SQL
    # covers media_decode) — keep it that way
    assert qs - os_ == set(), qs - os_


def test_all_oracles_are_valid_duckdb(entrymod):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, t + ".parquet")
        if os.path.exists(p):
            con.execute("CREATE VIEW %s AS SELECT * FROM "
                        "read_parquet('%s')" % (t, p))
    errors = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as exc:
            errors[name] = repr(exc)[:200]
    assert not errors, errors


def test_entry_schema_stable(spark, entrymod):
    df = entrymod.entry(spark)
    assert sorted(f.name for f in df.schema.fields) == \
        ["context", "datatype", "lang", "object", "objtype",
         "predicate", "source_url", "subject"]
