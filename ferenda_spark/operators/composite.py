"""Composite-source selection — the CompositeRepository analog.

The reference's CompositeRepository tries subrepos in priority order
per document until one parses successfully, then copies the winning
parsed/distilled files up (ref ferenda/compositerepository.py:185-270).
Set-at-a-time: union the per-source extraction outputs, rank rows per
url by (success, source priority), keep the winner — one window, no
per-document control flow.

Scale notes: the window shuffles on url (uniform); each source's
extraction remains its own embarrassingly-parallel stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def composite_extract(sources: list[tuple[str, DataFrame]],
                      key: str = "url",
                      status_col: str = "status") -> DataFrame:
    """``sources``: [(source_name, extracted_df)] in PRIORITY order
    (first wins among successes). → the union with two extra columns
    (``source``, ``source_rank``) reduced to one winning row per key;
    rows where every source failed keep the highest-priority failure
    (the reference raises after exhausting subrepos — downstream
    lineage records the failure, ref compositerepository.py:248-270).
    """
    tagged = []
    for rank, (name, df) in enumerate(sources):
        tagged.append(df.withColumn("source", F.lit(name))
                        .withColumn("source_rank", F.lit(rank)))
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    w = Window.partitionBy(key).orderBy(
        # successes first, then declared priority
        F.when(F.col(status_col) == "ok", 0).otherwise(1),
        F.col("source_rank"))
    return (allrows.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn"))
