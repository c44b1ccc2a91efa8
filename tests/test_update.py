"""SPARQL Update subset: hand-checked op semantics, DuckDB twin
parity, sequence semantics, and the unsupported-form guards."""

import duckdb
import pytest

from ferenda_spark.sparql import SparqlError
from ferenda_spark.update import apply_update, parse_update, update_sql

EX = "http://example.org/"
PFX = "PREFIX ex: <%s>\nPREFIX dct: <http://purl.org/dc/terms/>\n" % EX
SCHEMA = ("subject string, predicate string, object string, "
          "objtype string, lang string, datatype string, "
          "source_url string, context string")
COLS = ("subject", "predicate", "object", "objtype", "lang",
        "datatype", "source_url", "context")

DATA = [
    (EX + "d1", "http://purl.org/dc/terms/title", "Doc One", "literal",
     "en", None, EX + "d1.html", "kg"),
    (EX + "d1", "http://purl.org/dc/terms/references", EX + "d2",
     "uri", None, None, EX + "d1.html", "kg"),
    (EX + "d2", "http://purl.org/dc/terms/title", "Doc Two", "literal",
     None, None, EX + "d2.html", "old"),
]


def _spo(df):
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def _frame(spark):
    return spark.createDataFrame(DATA, SCHEMA)


def _parity(spark, df, update, tmp_path):
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    got = {tuple(r) for r in apply_update(df, update).collect()}
    sql = update_sql("read_parquet('%s/*.parquet')" % p, update, COLS)
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want
    return got


def test_insert_delete_data(spark, tmp_path):
    up = PFX + """
        INSERT DATA { ex:d3 dct:title "Doc Three"@sv .
                      ex:d3 dct:references ex:d1 } ;
        DELETE DATA { ex:d2 dct:title "Doc Two" }
    """
    rows = _parity(spark, _frame(spark), up, tmp_path)
    spo = {(s, p, o) for s, p, o, *_ in rows}
    assert (EX + "d3", "http://purl.org/dc/terms/title",
            "Doc Three") in spo
    assert (EX + "d2", "http://purl.org/dc/terms/title",
            "Doc Two") not in spo
    by_spo = {(s, p, o): rest for s, p, o, *rest in rows}
    ot, lang, dt, src, ctx = by_spo[
        (EX + "d3", "http://purl.org/dc/terms/title", "Doc Three")]
    assert (ot, lang, dt, src, ctx) == ("literal", "sv", None, None,
                                        None)
    ot2 = by_spo[(EX + "d3", "http://purl.org/dc/terms/references",
                  EX + "d1")][0]
    assert ot2 == "uri"


def test_modify_where(spark, tmp_path):
    """Rewrite titles of documents that reference something: delete
    the title, insert a marker with the old value's subject."""
    up = PFX + """
        DELETE { ?s dct:title ?t }
        INSERT { ?s ex:wasTitled ?t . ?s ex:flag "ref" }
        WHERE  { ?s dct:references ?o . ?s dct:title ?t }
    """
    rows = _parity(spark, _frame(spark), up, tmp_path)
    spo = {(s, p, o) for s, p, o, *_ in rows}
    assert (EX + "d1", EX + "wasTitled", "Doc One") in spo
    assert (EX + "d1", EX + "flag", "ref") in spo
    assert (EX + "d1", "http://purl.org/dc/terms/title",
            "Doc One") not in spo
    # d2 doesn't reference anything — untouched
    assert (EX + "d2", "http://purl.org/dc/terms/title",
            "Doc Two") in spo


def test_delete_where_and_clear(spark, tmp_path):
    up = PFX + "DELETE WHERE { ?s dct:title ?t }"
    rows = _parity(spark, _frame(spark), up, tmp_path)
    assert {(s, p, o) for s, p, o, *_ in rows} == {
        (EX + "d1", "http://purl.org/dc/terms/references", EX + "d2")}
    up2 = "CLEAR GRAPH <old>"
    rows2 = _parity(spark, _frame(spark), up2, tmp_path)
    assert all(ctx != "old" for *_, ctx in rows2)
    assert len(rows2) == 2
    assert apply_update(_frame(spark), "CLEAR ALL").count() == 0


def test_insert_existing_is_noop_and_sequence(spark, tmp_path):
    """Graphs are sets: re-inserting keeps the ORIGINAL row (with its
    lineage columns); a later op sees the earlier op's output."""
    up = PFX + """
        INSERT DATA { ex:d1 dct:title "Doc One" } ;
        DELETE { ?s dct:title ?t } WHERE { ?s ex:nothing ?t }
    """
    rows = _parity(spark, _frame(spark), up, tmp_path)
    assert len(rows) == 3           # unchanged, original row kept
    assert (EX + "d1", "http://purl.org/dc/terms/title", "Doc One",
            "literal", "en", None, EX + "d1.html", "kg") in rows
    # sequence: op2's WHERE runs against op1's output
    up2 = PFX + """
        INSERT DATA { ex:d9 ex:flag "x" } ;
        DELETE WHERE { ?s ex:flag ?v }
    """
    rows2 = _parity(spark, _frame(spark), up2, tmp_path)
    assert not any(p == EX + "flag" for _, p, _o, *_ in rows2)


def test_variable_object_objtype_inference(spark, tmp_path):
    up = PFX + """
        INSERT { ?o ex:inbound ?s } WHERE { ?s dct:references ?o }
    """
    rows = _parity(spark, _frame(spark), up, tmp_path)
    by_spo = {(s, p, o): rest for s, p, o, *rest in rows}
    assert by_spo[(EX + "d2", EX + "inbound", EX + "d1")][0] == "uri"


def test_unsupported_forms_raise():
    for bad in [
        "WITH <g> DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }",
        "INSERT DATA { ?s <p> <o> }",
        "DELETE WHERE { ?s <p> ?o FILTER(?o > 3) }",
        "CLEAR",
        "",
    ]:
        with pytest.raises(SparqlError):
            parse_update(bad)


def test_unbound_template_var_raises_at_parse_time():
    """Symmetric guard: an unbound template variable fails at parse
    time in BOTH backends (not just Spark compile)."""
    with pytest.raises(SparqlError, match="nope"):
        parse_update(
            "PREFIX ex: <http://e.org/>\n"
            "INSERT { ?s ex:q ?nope } WHERE { ?s ex:p ?o }")
    # bound through OPTIONAL / VALUES / subquery is legal
    parse_update(
        "PREFIX ex: <http://e.org/>\n"
        "DELETE { ?s ex:p ?v } WHERE { ?s ex:p ?o "
        "OPTIONAL { ?s ex:r ?v } }")
