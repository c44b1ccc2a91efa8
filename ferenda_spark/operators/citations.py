"""Citation mining: find citations in text columns and mint URIs.

The reference pairs a pyparsing grammar (CitationParser, ref
ferenda/citationparser.py) with a URIFormatter registry (ref
ferenda/uriformatter.py:7-53) and rewrites element trees in place.
The set-at-a-time form emits a citation TABLE instead — one row per
match with the formatted URI — which joins back onto the
resources/triples tables (dcterms:references at corpus scale).

Patterns are named regexes applied in priority order with
remove-then-scan overlap resolution: after a higher-priority pattern's
matches are collected, its spans are deleted before the next pattern
scans — so "Section 2 of RFC 5" yields one rfc_section citation, not
an extra bare-rfc one. This rule is deliberately chosen because it is
expressible identically in SQL (regexp_replace + regexp_extract_all),
giving the operator a hard oracle; the reference's leftmost-longest
pyparsing scan resolves these corpus patterns the same way.

Scale notes: pure projection (mapInPandas, no shuffle); patterns and
the formatter registry are tiny and broadcast with the closure.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


class URIFormatter:
    """Registry of (name, callable) formatters; mirrors the reference
    API (ref ferenda/uriformatter.py:32-53). Each callable receives
    the match's named-group dict and returns a URI or None."""

    def __init__(self, *formatters):
        self._formatters = dict(formatters)

    def format(self, name: str, groups: dict) -> str | None:
        formatter = self.formatterfor(name)
        if formatter:
            return formatter(groups)
        return None

    def addformatter(self, key, func) -> None:
        self._formatters[key] = func

    def formatterfor(self, key):
        return self._formatters.get(key, None)


CITE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("resource_uri", StringType()),
    StructField("name", StringType()),
    StructField("cite", StringType()),
    StructField("uri", StringType()),
])


def extract_citations(df: DataFrame, patterns: list[tuple[str, str]],
                      formatter: URIFormatter,
                      text_col: str = "text",
                      url_col: str = "url",
                      uri_col: str = "resource_uri") -> DataFrame:
    """→ (url, resource_uri, name, cite, uri): every citation match in
    ``text_col``, priority-ordered patterns, remove-then-scan."""
    from .util import ensure_parallelism
    compiled = [(name, re.compile(pat)) for name, pat in patterns]

    def run(batches):
        for pdf in batches:
            rows = []
            for url, res_uri, text in zip(pdf[url_col], pdf[uri_col],
                                          pdf[text_col]):
                remaining = text or ""
                for name, rx in compiled:
                    for m in rx.finditer(remaining):
                        rows.append({
                            "url": url, "resource_uri": res_uri,
                            "name": name, "cite": m.group(0),
                            "uri": formatter.format(name, m.groupdict()),
                        })
                    remaining = rx.sub("", remaining)
            yield pd.DataFrame(rows, columns=CITE_SCHEMA.fieldNames())

    # text_col may BE one of the key columns (e.g. mining the url
    # column itself) — select each column once
    cols = list(dict.fromkeys([url_col, uri_col, text_col]))
    return ensure_parallelism(df.select(*cols)) \
        .mapInPandas(run, CITE_SCHEMA)


# corpus patterns: the RFC citation shapes the synthetic f3 documents
# carry (≙ the reference's rfc citation grammar,
# ref ferenda/sources/tech/rfc.py citation_patterns)
CORPUS_PATTERNS = [
    ("rfc_section", r"Section (?P<section>\d[\d.]*) of \[?RFC ?(?P<rfc>\d+)\]?"),
    ("rfc", r"\[?RFC ?(?P<rfc>\d+)\]?"),
]


def corpus_formatter(base: str = "http://example.org/res/doc/"
                     ) -> URIFormatter:
    return URIFormatter(
        ("rfc_section",
         lambda g: "%s%s#S%s" % (base, g["rfc"], g["section"])),
        ("rfc", lambda g: "%s%s" % (base, g["rfc"])),
    )
