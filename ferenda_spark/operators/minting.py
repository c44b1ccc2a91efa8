"""Distributed coin-URI minting over the triple table.

The reference mints per-document at parse/relate time
(sameas_minter.space.coin_uri per resource, ref lagen/nu/sameas.py:
84-99; engine ferenda/thirdparty/coin.py). Set-at-a-time: URIs are a
per-document-graph function (relToBase recursion only ever follows
edges inside one document's graph), so minting is a
``groupBy(source_url).applyInPandas`` — one shuffle on source_url
(uniform keys: one group per document), then pure-Python minting per
group with the broadcast URISpace.

Scale notes: group size is bounded by triples-per-document (~25 in the
corpus, never corpus-scale), so no skew; the space config is a few KB,
rebuilt once per executor from the broadcast TTL text and cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

MINT_SCHEMA = StructType([
    StructField("source_url", StringType()),
    StructField("subject", StringType()),
    StructField("minted", StringType()),
    StructField("rank", IntegerType()),
])

_SPACE_CACHE: dict[int, object] = {}


def _space_for(ttl: str):
    from ..coin import URISpace
    key = hash(ttl)
    if key not in _SPACE_CACHE:
        _SPACE_CACHE[key] = URISpace.from_turtle(ttl)
    return _SPACE_CACHE[key]


def mint_rows(ttl: str, source_url: str, triples) -> list[dict]:
    """Pure per-document minting — shared by the Spark stage and the
    single-threaded oracle materialization (kgcache)."""
    space = _space_for(ttl)
    out = []
    for subject, uris in sorted(space.compute_uris(list(triples)).items()):
        for rank, uri in enumerate(uris, 1):
            out.append({"source_url": source_url, "subject": subject,
                        "minted": uri, "rank": rank})
    return out


def mint_uris(triples: DataFrame, space_ttl: str) -> DataFrame:
    """→ (source_url, subject, minted, rank): every URI the space can
    mint for every subject, rank 1 = highest-priority template."""
    import pandas as pd

    from ..model import Triple

    def run(key, pdf):
        ts = [Triple(r.subject, r.predicate, r.object, r.objtype,
                     r.lang, r.datatype)
              for r in pdf.itertuples(index=False)]
        return pd.DataFrame(mint_rows(space_ttl, key[0], ts),
                            columns=MINT_SCHEMA.fieldNames())

    cols = ["source_url", "subject", "predicate", "object", "objtype",
            "lang", "datatype"]
    return (triples.select(*cols)
            .groupBy("source_url").applyInPandas(run, MINT_SCHEMA))


def sameas_alias_triples(minted: DataFrame,
                         context: str = "") -> DataFrame:
    """rank-1 minted URIs → owl:sameAs alias triples, union-ready with
    the triple table (the sameas_minter emission,
    ref lagen/nu/sameas.py:84-99)."""
    return (minted.where(F.col("rank") == 1)
            .select(F.col("subject"),
                    F.lit("http://www.w3.org/2002/07/owl#sameAs")
                     .alias("predicate"),
                    F.col("minted").alias("object"),
                    F.lit("uri").alias("objtype"),
                    F.lit("").alias("lang"),
                    F.lit("").alias("datatype"),
                    "source_url",
                    F.lit(context).alias("context")))


def default_space_ttl() -> str:
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "res", "corpus.space.ttl")
    with open(p) as f:
        return f.read()
