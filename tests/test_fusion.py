"""Hand-computed goldens for the knowledge-fusion operators
(operators/fusion.py): functional-property conflict detection and
majority-vote value resolution. The kg_conflicts / kg_fused driver
queries add the DuckDB cross-engine check over the KG corpus."""

import pytest

from ferenda_spark.operators.fusion import (fuse_triples,
                                            functional_conflicts)

TITLE = "http://purl.org/dc/terms/title"
ISSUED = "http://purl.org/dc/terms/issued"
CREATOR = "http://purl.org/dc/terms/creator"

COLS = "source_url string, subject string, predicate string, " \
       "object string, objtype string"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # s1 title: 'A' asserted by two sources, 'B' by one → fused 'A'
        ("u1", "s1", TITLE, "A", "literal"),
        ("u2", "s1", TITLE, "A", "literal"),
        ("u3", "s1", TITLE, "B", "literal"),
        # s1 issued: single value, multiply asserted → no conflict
        ("u1", "s1", ISSUED, "2020", "literal"),
        ("u2", "s1", ISSUED, "2020", "literal"),
        # s2 title: 1-1 tie → min object 'C' wins
        ("u1", "s2", TITLE, "D", "literal"),
        ("u2", "s2", TITLE, "C", "literal"),
        # s2 creator: multi-valued but NOT in the functional set
        ("u1", "s2", CREATOR, "x", "uri"),
        ("u1", "s2", CREATOR, "y", "uri"),
        # s3 title: same value re-asserted by the same source twice
        ("u1", "s3", TITLE, "E", "literal"),
        ("u1", "s3", TITLE, "E", "literal"),
    ]
    return spark.createDataFrame(rows, COLS)


def test_conflict_report(spark, triples):
    got = [tuple(r) for r in
           functional_conflicts(triples, [TITLE, ISSUED]).collect()]
    assert got == [
        ("s1", TITLE, 2, 3, "A", "B"),
        ("s2", TITLE, 2, 2, "C", "D"),
    ]


def test_conflicts_excludes_non_functional(spark, triples):
    preds = {r.predicate for r in
             functional_conflicts(triples, [TITLE, ISSUED]).collect()}
    assert CREATOR not in preds


def test_fusion_majority_and_tiebreak(spark, triples):
    got = [tuple(r) for r in fuse_triples(triples, [TITLE]).collect()]
    assert got == [
        ("s1", TITLE, "A", "literal", 2, 2),   # majority 2-1
        ("s2", TITLE, "C", "literal", 1, 2),   # tie → min object
        ("s3", TITLE, "E", "literal", 1, 1),   # re-assertion collapses
    ]


def test_fusion_single_value_support(spark, triples):
    got = [tuple(r) for r in fuse_triples(triples, [ISSUED]).collect()]
    assert got == [("s1", ISSUED, "2020", "literal", 2, 1)]
