"""Distributed XHTML+RDFa rendering (the generate-stage sink) and its
round-trip verification stage.

``render_xhtml_stage`` maps the wide extraction result (one row per
document with nested triples/resources — operators/extract.py) to
(url, uri, xhtml) in a single Arrow-batched stage: serialization is
per-document pure Python (ferenda_spark.xhtml), embarrassingly
parallel, no shuffle; at production scale the output lands in the lake
next to the triples table exactly as the reference writes one
``parsed/*.xhtml`` file per basefile (ref
ferenda/documentrepository.py:1387-1629).

``roundtrip_triples`` re-parses the rendered strings with the engine's
own HTML parser and RDFa extractor and flattens the result back to the
triples-table schema — the reference's render self-check
(ref ferenda/decorators.py:209-235) as a dataframe: the output must
equal ``triples_table(extracted)`` row-for-row, which the
``kg_xhtml_roundtrip`` driver query checks against a hard oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

RENDER_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("uri", StringType()),
    StructField("xhtml", StringType()),
])

_TRIPLE_SCHEMA = StructType([
    StructField("subject", StringType()),
    StructField("predicate", StringType()),
    StructField("object", StringType()),
    StructField("objtype", StringType()),
    StructField("lang", StringType()),
    StructField("datatype", StringType()),
    StructField("source_url", StringType()),
])


def render_xhtml_stage(extracted: DataFrame) -> DataFrame:
    """wide extraction result → (url, uri, xhtml)."""
    from ..xhtml import render_document

    def run(batches):
        for pdf in batches:
            rows = []
            for url, uri, lang, title, triples, resources in zip(
                    pdf["url"], pdf["uri"], pdf["lang"], pdf["title"],
                    pdf["triples"], pdf["resources"]):
                rows.append({
                    "url": url, "uri": uri,
                    "xhtml": render_document(
                        uri, lang, title, list(triples),
                        [(r["resource_uri"], r["text"])
                         for r in resources]),
                })
            yield pd.DataFrame(rows, columns=RENDER_SCHEMA.fieldNames())

    cols = extracted.select("url", "uri", "lang", "title",
                            "resources", "triples")
    return cols.mapInPandas(run, RENDER_SCHEMA)


def roundtrip_triples(rendered: DataFrame, context: str = "") -> DataFrame:
    """(url, xhtml) → triples-table rows re-extracted from the rendered
    RDFa (subject, predicate, object, objtype, lang, datatype,
    source_url, context)."""
    from ..htmltree import parse_html
    from ..rdfa import extract_rdfa

    def run(batches):
        for pdf in batches:
            rows = []
            for url, uri, xhtml in zip(pdf["url"], pdf["uri"],
                                       pdf["xhtml"]):
                root = parse_html(xhtml.encode("utf-8"))
                for t in extract_rdfa(root, uri):
                    d = t._asdict()
                    d["source_url"] = url
                    rows.append(d)
            yield pd.DataFrame(rows, columns=_TRIPLE_SCHEMA.fieldNames())

    return (rendered.select("url", "uri", "xhtml")
            .mapInPandas(run, _TRIPLE_SCHEMA)
            .withColumn("context", F.lit(context)))


def nquads_lines(triples: DataFrame) -> DataFrame:
    """→ one-column (line) N-Quads serialization of the triple table —
    the graph-publishing dump sink (the distributed twin of
    rdfio.to_ntriples, asserted equal in tests) as ONE codegen
    projection: no UDFs, no shuffle, ready for
    ``df.write.text(path)``. Rows with a non-empty context emit the
    quad form ``<s> <p> o <g> .``; default-graph rows emit triples.
    Escaping follows N-Triples canonical rules (backslash first, then
    quote/newline/CR/tab) — the same chain as rdfio._nt_escape and
    the DuckDB twin."""

    def esc(c):
        for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
            c = F.replace(c, F.lit(a), F.lit(b))
        return c

    lang = F.coalesce(F.col("lang"), F.lit(""))
    dtype = F.coalesce(F.col("datatype"), F.lit(""))
    ctx = F.coalesce(F.col("context"), F.lit(""))
    obj = F.when(
        F.col("objtype") == "uri",
        F.concat(F.lit("<"), F.col("object"), F.lit(">"))
    ).otherwise(F.concat(
        F.lit('"'), esc(F.col("object")), F.lit('"'),
        F.when(lang != "", F.concat(F.lit("@"), lang))
         .when(dtype != "", F.concat(F.lit("^^<"), dtype, F.lit(">")))
         .otherwise(F.lit(""))))
    return triples.select(F.concat(
        F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"),
        F.lit("> "), obj,
        F.when(ctx != "", F.concat(F.lit(" <"), ctx, F.lit(">")))
         .otherwise(F.lit("")),
        F.lit(" .")).alias("line"))
