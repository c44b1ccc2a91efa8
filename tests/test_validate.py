"""SHACL-lite validation: one hand-built violation per constraint
kind, conforming data yields zero rows, DuckDB twin parity, and the
multi-class no-double-count rule."""

import duckdb

from ferenda_spark.namespaces import RDF_TYPE
from ferenda_spark.operators.validate import (Shape, sql_validate_shapes,
                                              validate_shapes)

EX = "http://example.org/"
SCHEMA = ("subject string, predicate string, object string, "
          "objtype string, datatype string")

SHAPES = [
    Shape("TitleShape", EX + "Doc", EX + "title",
          min_count=1, max_count=1, node_kind="literal"),
    Shape("IdShape", EX + "Doc", EX + "id",
          pattern=r"^ID[0-9]+$", datatype=EX + "idtype"),
    Shape("StatusShape", EX + "Doc", EX + "status",
          in_list=("draft", "final")),
    Shape("RefShape", EX + "Doc", EX + "ref", node_kind="uri"),
]

DATA = [
    # d1 conforms fully
    (EX + "d1", RDF_TYPE, EX + "Doc", "uri", None),
    (EX + "d1", EX + "title", "Fine", "literal", None),
    (EX + "d1", EX + "id", "ID42", "literal", EX + "idtype"),
    (EX + "d1", EX + "status", "draft", "literal", None),
    (EX + "d1", EX + "ref", EX + "d2", "uri", None),
    # d2: minCount(title)=0, pattern+datatype violations, in violation,
    # nodeKind violation on ref
    (EX + "d2", RDF_TYPE, EX + "Doc", "uri", None),
    (EX + "d2", EX + "id", "bogus", "literal", None),
    (EX + "d2", EX + "status", "unknown", "literal", None),
    (EX + "d2", EX + "ref", "not-a-uri", "literal", None),
    # d3: maxCount(title) violated (2 titles); title as uri → nodeKind
    (EX + "d3", RDF_TYPE, EX + "Doc", "uri", None),
    (EX + "d3", EX + "title", "One", "literal", None),
    (EX + "d3", EX + "title", EX + "t", "uri", None),
    # untargeted node: same problems, but not a Doc → no rows
    (EX + "x1", EX + "id", "bogus", "literal", None),
]


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_violations_per_kind(spark):
    df = spark.createDataFrame(DATA, SCHEMA)
    got = _rows(validate_shapes(df, SHAPES))
    assert got == sorted([
        (EX + "d2", "TitleShape", "minCount", "0"),
        (EX + "d2", "IdShape", "pattern", "bogus"),
        (EX + "d2", "IdShape", "datatype", "bogus"),
        (EX + "d2", "StatusShape", "in", "unknown"),
        (EX + "d2", "RefShape", "nodeKind", "not-a-uri"),
        (EX + "d3", "TitleShape", "maxCount", "2"),
        (EX + "d3", "TitleShape", "nodeKind", EX + "t"),
    ])
    assert not any(f.startswith(EX + "d1") or f.startswith(EX + "x")
                   for f, *_ in got)


def test_duckdb_twin_parity(spark, tmp_path):
    df = spark.createDataFrame(DATA, SCHEMA)
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    sql = sql_validate_shapes("read_parquet('%s/*.parquet')" % p, SHAPES)
    oracle = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert oracle == _rows(validate_shapes(df, SHAPES))


def test_multi_class_subject_counts_once(spark):
    """A subject typed with TWO target classes must still count its
    values once per (focus, path) — minCount=2 unsatisfied by one
    value, maxCount=1 NOT tripped by the class duplication."""
    shapes = [
        Shape("A2", EX + "A", EX + "p", min_count=2),
        Shape("B1", EX + "B", EX + "p", max_count=1),
    ]
    data = [
        (EX + "s", RDF_TYPE, EX + "A", "uri", None),
        (EX + "s", RDF_TYPE, EX + "B", "uri", None),
        (EX + "s", EX + "p", "v", "literal", None),
    ]
    got = _rows(validate_shapes(
        spark.createDataFrame(data, SCHEMA), shapes))
    assert got == [(EX + "s", "A2", "minCount", "1")]
