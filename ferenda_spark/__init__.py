"""ferenda_spark — a PySpark-native knowledge-graph construction engine.

Re-creates the query/data-processing capabilities of the reference system
(eckberg/ferenda: download → parse → relate → generate over unstructured
document collections) as distributed dataflow over Spark DataFrames:

- ``pages`` table (url, warc_ts, html, text, lang) is the corpus
  (replaces per-file download storage, ref ferenda/documentstore.py:209-343)
- a vectorized Arrow UDF stage reproduces HTML clean / structural
  segmentation / plaintext extraction / triple distillation
  (ref ferenda/documentrepository.py:1125-1333, 2131-2149)
- relate becomes DataFrame joins + writes of ``triples`` / ``resources`` /
  ``deps`` tables (ref ferenda/documentrepository.py:1813-2077)
- entity linking + owl:sameAs canonicalization are broadcast-join +
  connected-components stages (ref ferenda/documentrepository.py:478-525)

All per-document logic is pure Python invoked only from Arrow-batched
UDFs; everything cross-document is declarative DataFrame/SQL.
"""

__version__ = "0.1.0"
