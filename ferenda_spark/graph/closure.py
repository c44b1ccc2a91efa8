"""Transitive closure to fixpoint — the dcterms:isPartOf* analog.

The reference's annotation query uses a SPARQL property path
``?s dcterms:isPartOf* <uri>`` (ref res/sparql/annotations.rq:12-17,
driver ferenda/documentrepository.py:2557-2612). Both iterative
variants run to FIXPOINT by default — the same semantics as the SQL
twin's recursive CTE, so the three codepaths (all-pairs closure,
seeded BFS, DuckDB oracle) can never diverge on deep chains. The loop
terminates because the frontier is anti-joined against everything
seen: pair/node sets grow strictly, bounded by |V|² / |V|.
``max_depth`` remains available as an explicit bound for callers that
want one (bounded SPARQL quantifiers pass their own n).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(edges: DataFrame, src: str = "src", dst: str = "dst",
                       max_depth: int | None = None) -> DataFrame:
    """edges(src,dst) → all (src,dst) pairs reachable in 1..max_depth
    hops (reflexive pairs excluded); ``max_depth=None`` = fixpoint."""
    base = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .where(F.col("a") != F.col("b")).distinct()
            .localCheckpoint(eager=True))
    paths = base
    frontier = base
    rounds = itertools.count() if max_depth is None else range(max_depth - 1)
    for _ in rounds:
        nxt = (frontier.alias("p")
               .join(base.alias("e"), F.col("p.b") == F.col("e.a"))
               .select(F.col("p.a").alias("a"), F.col("e.b").alias("b"))
               .where(F.col("a") != F.col("b"))
               .distinct()
               .localCheckpoint(eager=True))
        frontier = (nxt.join(paths, ["a", "b"], "left_anti")
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        paths = paths.union(frontier).localCheckpoint(eager=True)
    return paths.distinct()


def ispartof_closure(triples: DataFrame) -> DataFrame:
    """triples → (part, ancestor) closure over dcterms:isPartOf."""
    edges = (triples
             .where(F.col("predicate") ==
                    F.lit("http://purl.org/dc/terms/isPartOf"))
             .select(F.col("subject").alias("src"),
                     F.col("object").alias("dst")))
    return transitive_closure(edges).select(
        F.col("a").alias("part"), F.col("b").alias("ancestor"))


def reachable_nodes(edges: DataFrame, start: str, reverse: bool = False,
                    src: str = "src", dst: str = "dst",
                    max_depth: int | None = None) -> DataFrame:
    """Single-column (n) DataFrame: nodes reachable FROM ``start`` in
    1..max_depth hops — or nodes that can REACH it when ``reverse``;
    ``max_depth=None`` = fixpoint (same depth semantics as
    :func:`transitive_closure`, so the seeded/all-pairs hybrid switch
    in sparql.py cannot change query results).

    The seeded twin of :func:`transitive_closure` for property paths
    with one constant endpoint (``?s dcterms:references+ <uri>`` — the
    describe/annotations shape): each round broadcast-joins the tiny
    frontier against the edge scan, so cost tracks the visited
    neighborhood, never the all-pairs closure of the whole graph."""
    a, b = (dst, src) if reverse else (src, dst)
    base = (edges.select(F.col(a).alias("s"), F.col(b).alias("d"))
            .distinct().localCheckpoint(eager=True))
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(start,)], "n string") \
        .localCheckpoint(eager=True)
    seen = frontier
    out = None
    rounds = itertools.count() if max_depth is None else range(max_depth)
    for _ in rounds:
        nxt = (base.join(F.broadcast(frontier),
                         base["s"] == frontier["n"])
               .select(F.col("d").alias("n")).distinct()
               .localCheckpoint(eager=True))
        frontier = nxt.join(seen, "n", "left_anti") \
                      .localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        seen = seen.union(frontier).localCheckpoint(eager=True)
        out = frontier if out is None else out.union(frontier)
    if out is None:
        return spark.createDataFrame([], "n string")
    # start itself can never appear: seen is seeded with it, so a
    # cycle's re-reach is anti-joined away before entering out —
    # matching transitive_closure's reflexive-pair exclusion
    return out.distinct()


def grouped_transitive_closure(edges: DataFrame, group: str = "g",
                               src: str = "src", dst: str = "dst"
                               ) -> DataFrame:
    """Per-group transitive closure to fixpoint: edges (group, src,
    dst) → all (group, a, b) pairs reachable within ONE group — the
    GRAPH ?var property-path semantics (one closure per named graph,
    computed in a single shared iteration keyed on (group, node)
    rather than one job per graph). Same fixpoint/termination argument
    as :func:`transitive_closure`; per-document graphs keep each
    group's pair set tiny, so the uniform (group, node) join keys are
    the skew defense."""
    base = (edges.select(F.col(group).alias("g"), F.col(src).alias("a"),
                         F.col(dst).alias("b"))
            .where(F.col("a") != F.col("b")).distinct()
            .localCheckpoint(eager=True))
    paths = base
    frontier = base
    while True:
        nxt = (frontier.alias("p")
               .join(base.alias("e"),
                     (F.col("p.b") == F.col("e.a")) &
                     (F.col("p.g") == F.col("e.g")))
               .select(F.col("p.g").alias("g"), F.col("p.a").alias("a"),
                       F.col("e.b").alias("b"))
               .where(F.col("a") != F.col("b"))
               .distinct()
               .localCheckpoint(eager=True))
        frontier = (nxt.join(paths, ["g", "a", "b"], "left_anti")
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        paths = paths.union(frontier).localCheckpoint(eager=True)
    return paths.distinct()
