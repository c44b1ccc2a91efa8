"""Stock URI formatters — the ready-made half of the citation
machinery (ref ferenda/uriformats.py:14-58; registry surface in
operators/citations.URIFormatter, ref ferenda/uriformatter.py:7-53).

Each formatter takes the match's named-group dict (the reference feeds
it pyparsing ParseResults; the Spark operator feeds it
``m.groupdict()`` — both are string→string mappings) and returns a
URI string. They run inside the Arrow-batched citation stage, so they
must stay pure and broadcastable — no I/O, no state.
"""

from __future__ import annotations

from urllib.parse import quote


def generic(d: dict) -> str:
    """Any dict → an example.org URL with the dict as its querystring
    (ref ferenda/uriformats.py:14-25). Key order follows the dict —
    for regex group dicts that is group-definition order, which is
    what makes the output deterministic and SQL-twinnable.

    >>> generic({'foo': '1', 'bar': '2'})
    'http://example.org/?foo=1&bar=2'
    """
    querystring = "&".join(quote(k) + "=" + quote(v)
                           for k, v in d.items() if v is not None)
    return "http://example.org/?%s" % querystring


def url(d: dict) -> str:
    """Dict with ``scheme``, ``netloc``, ``path`` (optionally
    ``query`` and/or ``fragment``) → the corresponding URL
    (ref ferenda/uriformats.py:28-44).

    >>> url({'scheme': 'https', 'netloc': 'example.org', 'path': '/t'})
    'https://example.org/t'
    """
    d = {k: v for k, v in d.items() if v is not None}
    out = "%(scheme)s://%(netloc)s%(path)s" % d
    if d.get("query"):
        out += "?%s" % d["query"]
    if d.get("fragment"):
        out += "#%s" % d["fragment"]
    return out


def eulaw(d: dict) -> str:
    """CELEX-based URI from LegalactType/Directive/ArticleId groups.
    Not implemented in the reference either (ref
    ferenda/uriformats.py:47-58 raises NotImplementedError) — kept so
    the registry surface matches 1:1."""
    raise NotImplementedError(
        "eulaw is not implemented (the reference's own eulaw formatter "
        "raises NotImplementedError)")
