"""HyperANF neighborhood function: exactness on small graphs (linear
counting near-exact at tiny balls), monotonicity/saturation, DuckDB
unrolled-CTE parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.graphops import anf_neighborhood, sql_anf


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_anf_path_graph_counts(spark):
    # directed path a->b->c->d: true N(0)=4, N(1)=7, N(2)=9,
    # N(3)=N(inf)=10 — estimates carry HLL error (1-2 register
    # collisions move a 4-element ball by ±1), so assert the CURVE:
    # within ±2 of truth pointwise, strictly growing to saturation,
    # then exactly flat (the register fixpoint is exact even though
    # the estimate is approximate)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out = {r["t"]: r["est_pairs"]
           for r in anf_neighborhood(e, rounds=4).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    truth = {0: 4, 1: 7, 2: 9, 3: 10}
    for t, want in truth.items():
        assert abs(out[t] - want) <= 2, (t, out[t], want)
    assert out[0] < out[1] < out[2] < out[3]
    assert out[4] == out[3]              # saturated: fixpoint reached


def test_anf_cycle_saturates(spark):
    # 5-cycle: every ball reaches all 5 nodes by t=4 → true N(4)=25;
    # every node has the IDENTICAL ball, so N(4) = 5 · one 5-element
    # HLL estimate (a register collision puts it near 21) — assert
    # the tolerance band, the 5-fold structure, and exact saturation
    pairs = [("c%d" % i, "c%d" % ((i + 1) % 5)) for i in range(5)]
    out = {r["t"]: r["est_pairs"]
           for r in anf_neighborhood(_edges(spark, pairs),
                                     rounds=5).collect()}
    assert 18 <= out[4] <= 32
    assert abs(out[4] / 5 - round(out[4] / 5, 3)) < 1e-9
    assert out[5] == out[4]


def test_anf_duckdb_parity(spark, tmp_path):
    n = 90
    pairs = ([("v%03d" % v, "v%03d" % ((7 * v + 3) % n))
              for v in range(n) if v % 3 != 2] +
             [("v%03d" % v, "v%03d" % ((v + 1) % n))
              for v in range(n) if v % 10 < 3])
    e = _edges(spark, pairs)
    p = str(tmp_path / "e.parquet")
    e.write.mode("overwrite").parquet(p)
    got = [(r["t"], r["est_pairs"])
           for r in anf_neighborhood(e, rounds=5).collect()]
    oracle = duckdb.sql(sql_anf(
        "SELECT src, dst FROM read_parquet('%s/*.parquet')" % p,
        rounds=5)).fetchall()
    assert got == [(a, b) for a, b in oracle]
    # repartitioning changes nothing (max + integer sums)
    got2 = [(r["t"], r["est_pairs"])
            for r in anf_neighborhood(e.repartition(13),
                                      rounds=5).collect()]
    assert got2 == got


def test_anf_centrality_path_and_parity(spark, tmp_path):
    from ferenda_spark.operators.graphops import (anf_centrality,
                                                  sql_anf_centrality)
    # path a->b->c->d: true H(a)=1+1/2+1/3≈1.83, H(d)=0 (no out-ball);
    # estimates carry HLL error — assert the ORDER and the zero
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["node"]: (r["harmonic"], r["reach"])
           for r in anf_centrality(e, rounds=4).collect()}
    # d's ball never grows → harmonic EXACTLY 0 (telescoping
    # differences of a constant); reach carries the linear-counting
    # bias of a singleton ball (32·ln(32/31) − 1 ≈ 0.016)
    assert got["d"][0] == 0.0 and abs(got["d"][1]) < 0.05
    assert got["a"][0] > got["b"][0] > got["c"][0] > got["d"][0]
    assert abs(got["a"][0] - 1.83) < 0.8
    # twin parity on the mixed graph, digit for digit
    n = 90
    pairs = ([("v%03d" % v, "v%03d" % ((7 * v + 3) % n))
              for v in range(n) if v % 3 != 2] +
             [("v%03d" % v, "v%03d" % ((v + 1) % n))
              for v in range(n) if v % 10 < 3])
    e = _edges(spark, pairs)
    p = str(tmp_path / "e.parquet")
    e.write.mode("overwrite").parquet(p)
    got = [(r["node"], r["harmonic"], r["reach"])
           for r in anf_centrality(e, rounds=5).collect()]
    import duckdb
    oracle = duckdb.sql(sql_anf_centrality(
        "SELECT src, dst FROM read_parquet('%s/*.parquet')" % p,
        rounds=5)).fetchall()
    assert got == [tuple(r) for r in oracle]
