"""Corpus-size sweep of the driver's kg_* parity: the driver gate runs
everything at KG_N=200, so a bug that only appears at another corpus
shape (a TOC page crossing the 1000-row cap, a pagerank graph with a
different dangling set, annotation closures of different depth) would
ship green. This sweep re-runs representative kg queries against their
DuckDB oracles at a different n through the exact driver surface
(monkeypatched KG_N — both sides re-derive from it at call time).
"""

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEP_N = 1500
QUERIES = ["kg_toc", "kg_toc_pagesets", "kg_pagerank", "kg_annotations",
           "kg_news_feed_entries", "kg_stale", "kg_search", "kg_faceted",
           "kg_describe_rfc",
           # incremental CC (component shapes change with n) and the
           # temporal islands (interval structure changes with n)
           "kg_entities_delta", "kg_triple_intervals"]


@pytest.fixture(scope="module")
def entrymod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_sweep", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.KG_N = SWEEP_N
    # derive both dicts ONCE (oracle_sql re-parses every SPARQL twin
    # and re-checks the kg cache; 9 parametrized cases share them)
    return mod.queries(), mod.oracle_sql()


def canon(pdf):
    cols = sorted(pdf.columns)
    out = pdf[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_kg_query_parity_at_sweep_n(spark, entrymod, name):
    queries, oracles = entrymod
    spdf = queries[name](spark, "/root/testdata/sf0.01").toPandas()
    con = duckdb.connect()
    odf = con.sql(oracles[name]).df()
    assert len(spdf) == len(odf), (name, len(spdf), len(odf))
    assert len(spdf) > 0, "%s returned nothing at n=%d" % (name, SWEEP_N)
    a, b = canon(spdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), "%s diverges at n=%d" % (name, SWEEP_N)
