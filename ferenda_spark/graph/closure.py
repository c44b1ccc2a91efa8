"""Bounded transitive closure — the dcterms:isPartOf* analog.

The reference's annotation query uses a SPARQL property path
``?s dcterms:isPartOf* <uri>`` (ref res/sparql/annotations.rq:12-17,
driver ferenda/documentrepository.py:2557-2612). Document part trees are
shallow (depth <= 3 in the fixtures), so a bounded iterative self-join to
fixpoint is exact and cheap; the depth cap also bounds shuffle rounds at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(edges: DataFrame, src: str = "src", dst: str = "dst",
                       max_depth: int = 8) -> DataFrame:
    """edges(src,dst) → all (src,dst) pairs reachable in 1..max_depth
    hops (reflexive pairs excluded)."""
    base = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .where(F.col("a") != F.col("b")).distinct()
            .localCheckpoint(eager=True))
    paths = base
    frontier = base
    for _ in range(max_depth - 1):
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
                    max_depth: int = 32) -> DataFrame:
    """Single-column (n) DataFrame: nodes reachable FROM ``start`` in
    1..max_depth hops — or nodes that can REACH it when ``reverse``.

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
    for _ in range(max_depth):
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
