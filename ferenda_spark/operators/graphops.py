"""Citation-graph analytics over the triple table.

The reference's GraphAnalyze computes pagerank/HITS/degree
distributions over the dcterms:references citation graph with networkx
on the driver (ref ferenda/sources/general/graphanalyze.py:31-62,
412-560). The distributed form is plain DataFrame iteration — no
GraphFrames dependency:

- :func:`citation_edges` — (src, dst) from dcterms:references triples
- :func:`degrees` — in/out degree per node
- :func:`pagerank` — power iteration with damping; each round is one
  groupBy-sum join (map-side partial aggregation; dangling mass
  redistributed analytically)

Scale notes: every iteration shuffles contributions keyed by dst —
uniform unless the citation graph has hubs, which AQE skew-split
handles; iterations are bounded (default 15, plenty for convergence at
damping 0.85); per-round localCheckpoint keeps lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DCTERMS_REFERENCES = "http://purl.org/dc/terms/references"


def citation_edges(triples: DataFrame,
                   predicate: str = DCTERMS_REFERENCES) -> DataFrame:
    """→ (src, dst) distinct citation edges."""
    return (triples
            .where((F.col("predicate") == predicate) &
                   (F.col("objtype") == "uri"))
            .select(F.col("subject").alias("src"),
                    F.col("object").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct())


def degrees(edges: DataFrame) -> DataFrame:
    """→ (node, out_degree, in_degree); nodes with either role appear."""
    out_d = edges.groupBy(F.col("src").alias("node")) \
                 .agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("node")) \
                .agg(F.count(F.lit(1)).alias("in_degree"))
    return (out_d.join(in_d, "node", "full")
            .na.fill(0, ["out_degree", "in_degree"])
            .orderBy("node"))


def pagerank(edges: DataFrame, damping: float = 0.85,
             max_iter: int = 15, round_to: int = 6) -> DataFrame:
    """→ (node, rank) over the directed edge set, power iteration.

    Ranks are normalized so they sum to the node count (networkx-style
    probabilities × n would differ; this matches the classic
    PR(v) = (1-d) + d·Σ PR(u)/out(u) formulation with dangling-mass
    redistribution, iterated to ``max_iter``).
    """
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    # edges annotated once; reused every round
    ed = edges.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(max_iter):
        contribs = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("out_degree"))
                            .alias("contrib")))
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("c"))
        # dangling nodes (no outgoing edges) leak their mass; the
        # classic formulation redistributes it uniformly
        dangling = (ranks.join(out_deg.withColumnRenamed("src", "node"),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .collect()[0][0])
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping) +
                          F.lit(damping) *
                          (F.coalesce(F.col("c"), F.lit(0.0)) +
                           F.lit(dangling / n_nodes))).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", F.round("rank", round_to).alias("rank")) \
                .orderBy(F.desc("rank"), "node")


def keyword_hubs(triples: DataFrame,
                 subject_pred: str = "http://purl.org/dc/terms/subject"
                 ) -> DataFrame:
    """Keyword-hub aggregation: one row per distinct dcterms:subject
    value with the documents that carry it (the skos:Concept hub the
    reference materializes one document per term —
    ref ferenda/sources/general/keyword.py:106-240; sanitize rules
    :163-172 drop []{}|#<>& and trim).

    → (term, n_docs, docs sorted array).
    """
    sanitized = F.trim(F.regexp_replace("object", r"[\[\]{}|#<>&]", ""))
    return (triples
            .where(F.col("predicate") == subject_pred)
            .select(sanitized.alias("term"),
                    F.col("subject").alias("doc"))
            .where(F.col("term") != "")
            .groupBy("term")
            .agg(F.countDistinct("doc").alias("n_docs"),
                 F.sort_array(F.collect_set("doc")).alias("docs"))
            .orderBy("term"))
