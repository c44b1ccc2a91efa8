"""Strongly connected components: known shapes, both hybrid branches,
DuckDB mutual-reachability parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.graphops import scc, sql_scc


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _got(df):
    return {r["node"]: r["scc_id"] for r in df.collect()}


def test_scc_known_shapes(spark):
    # two triangles joined by a one-way bridge + a dangling tail
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("c", "x"),            # bridge: one direction only
             ("z", "t")]            # DAG tail
    want = {"a": "a", "b": "a", "c": "a",
            "x": "x", "y": "x", "z": "x", "t": "t"}
    assert _got(scc(_edges(spark, pairs))) == want
    # figure-8: two 2-cycles sharing f1 → ONE component
    pairs = [("f0", "f1"), ("f1", "f0"), ("f1", "f2"), ("f2", "f1")]
    assert _got(scc(_edges(spark, pairs))) == {
        "f0": "f0", "f1": "f0", "f2": "f0"}
    # pure DAG → all singletons; self-loop → its own singleton
    pairs = [("p", "q"), ("q", "r"), ("s", "s")]
    assert _got(scc(_edges(spark, pairs))) == {
        "p": "p", "q": "q", "r": "r", "s": "s"}


def test_scc_branches_agree(spark):
    # deterministic mixed graph: partial permutation (cycles + paths)
    # + chains; distributed Trim+FW-BW peel (threshold=0) must equal
    # driver Tarjan row for row
    n = 120
    pairs = ([("v%03d" % v, "v%03d" % ((7 * v + 3) % n))
              for v in range(n) if v % 3 != 2] +
             [("v%03d" % v, "v%03d" % ((v + 1) % n))
              for v in range(n) if v % 10 < 3])
    e = _edges(spark, pairs)
    drv = _got(scc(e))
    dist = _got(scc(e, driver_threshold=0))
    assert drv == dist
    # sanity: the graph actually has nontrivial components
    from collections import Counter
    sizes = Counter(drv.values())
    assert max(sizes.values()) >= 2


def test_scc_duckdb_parity(spark, tmp_path):
    n = 90
    pairs = ([("v%03d" % v, "v%03d" % ((7 * v + 3) % n))
              for v in range(n) if v % 3 != 2] +
             [("c0", "c1"), ("c1", "c2"), ("c2", "c0")])
    e = _edges(spark, pairs)
    p = str(tmp_path / "e.parquet")
    e.write.mode("overwrite").parquet(p)
    got = sorted(_got(scc(e)).items())
    oracle = duckdb.sql(sql_scc(
        "SELECT src, dst FROM read_parquet('%s/*.parquet')" % p)
    ).fetchall()
    assert got == [(a, b) for a, b in oracle]


def test_type_inference_vote_and_tiebreak(spark):
    from ferenda_spark.operators.graphops import type_inference
    edges = _edges(spark, [
        ("u", "a"), ("u", "b"), ("u", "c"),   # u: 2 X votes, 1 Y -> X
        ("v", "a"), ("v", "d"),               # v: 1 X, 1 Y -> tie -> X
        ("w", "z"),                           # both untyped: no row
        ("a", "t")])                          # a is typed -> excluded
    types = spark.createDataFrame(
        [("a", "X"), ("b", "X"), ("c", "Y"), ("d", "Y"), ("t", "X")],
        "node string, cls string")
    got = {r["node"]: (r["inferred_type"], r["votes"])
           for r in type_inference(edges, types).collect()}
    # u majority, v tie-broken to the asc class, w/z untyped-only and
    # absent, a/t already typed and absent
    assert got == {"u": ("X", 2), "v": ("X", 1)}


def test_weighted_sssp_golden_and_branches(spark):
    from ferenda_spark.operators.graphops import weighted_sssp
    # heavy direct edge vs lighter two-hop detour: a->c direct 10,
    # a->b->c = 2+3 wins; d unreachable; parallel edges min-collapse
    e = spark.createDataFrame(
        [("a", "c", 10.0), ("a", "b", 2.0), ("b", "c", 3.0),
         ("a", "b", 5.0), ("x", "d", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in weighted_sssp(e, seeds).collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 5.0}
    # branch equality (driver Jacobi vs distributed rounds)
    dist = {r["node"]: r["dist"]
            for r in weighted_sssp(e, seeds, driver_threshold=0).collect()}
    assert dist == got


def test_weighted_sssp_duckdb_parity(spark, tmp_path):
    from ferenda_spark.operators.graphops import (sql_weighted_sssp,
                                                  weighted_sssp)
    n = 120
    pairs = [("v%03d" % v, "v%03d" % ((7 * v + 3) % n),
              float(v % 5 + 1)) for v in range(n)] + \
            [("v%03d" % v, "v%03d" % ((v + 1) % n), float(v % 3 + 1))
             for v in range(0, n, 2)]
    e = spark.createDataFrame(pairs, "src string, dst string, w double")
    p = str(tmp_path / "e.parquet")
    e.write.mode("overwrite").parquet(p)
    seeds = spark.createDataFrame([("v000",), ("v055",)], "node string")
    got = [(r["node"], r["dist"])
           for r in weighted_sssp(e, seeds).collect()]
    import duckdb
    oracle = duckdb.sql(sql_weighted_sssp(
        "SELECT src, dst, w FROM read_parquet('%s/*.parquet')" % p,
        "SELECT 'v000' AS node UNION ALL SELECT 'v055'")).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_condensation_levels_and_parity(spark, tmp_path):
    from ferenda_spark.operators.graphops import (condensation,
                                                  sql_condensation)
    # triangle {a,b,c} -> x -> 2-cycle {y,z}: three components,
    # levels 0/1/2, member counts 3/1/2
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("c", "x"), ("x", "y"), ("y", "z"), ("z", "y")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["component"]: (r["level"], r["n_members"])
           for r in condensation(e).collect()}
    assert got == {"a": (0, 3), "x": (1, 1), "y": (2, 2)}
    # hybrid branch equality (driver vs distributed level loop)
    dist = {r["component"]: (r["level"], r["n_members"])
            for r in condensation(e, driver_threshold=0).collect()}
    assert dist == got
    # parity on the mixed corpus (cycles + chains + injected knots)
    n = 90
    pairs = ([("v%03d" % v, "v%03d" % ((7 * v + 3) % n))
              for v in range(n) if v % 3 != 2] +
             [("c0", "c1"), ("c1", "c2"), ("c2", "c0")])
    e = spark.createDataFrame(pairs, "src string, dst string")
    p = str(tmp_path / "e.parquet")
    e.write.mode("overwrite").parquet(p)
    got = [(r["component"], r["level"], r["n_members"])
           for r in condensation(e).collect()]
    import duckdb
    oracle = duckdb.sql(sql_condensation(
        "SELECT src, dst FROM read_parquet('%s/*.parquet')" % p
    )).fetchall()
    assert got == [tuple(r) for r in oracle]
