"""XHTML 1.1 + RDFa serialization of an extracted document.

The reference's parse stage ends in ``render_xhtml``: the parsed
document (body elements + metadata graph) is serialized to XHTML 1.1
with RDFa attributes, and the *distilled* triple graph is produced by
re-parsing that very serialization (ref ferenda/documentrepository.py:
1387-1629 ``render_xhtml``/``render_xhtml_tree``; ref
ferenda/decorators.py:209-235 — the ``makedocument``/``render``
decorator runs the serialize → re-parse → graph-compare loop as a
self-check). That round trip is the reference's own completeness
invariant for the sink: every triple the parser emitted must survive
serialization.

This module is the engine's equivalent sink. ``render_document``
serializes one extracted document (its URI, language, title, triple
set and per-resource text) to an XHTML+RDFa string such that
``rdfa.extract_rdfa(htmltree.parse_html(rendered))`` returns exactly
the document's triple set — checked per document by the
``kg_xhtml_roundtrip`` driver query (hard oracle: the re-extracted
triples must hash-equal the triples table) and by unit tests with
hostile literals (quotes, angle brackets, newlines, unicode).

Layout (mirrors the reference's rendered shape — metadata up front,
content parts as sections):

- ``<head><title>`` carries the document title (presentation only; the
  title *triple* is emitted in the metadata block like every other).
- one ``<div class="meta" about="{subject}">`` per distinct subject in
  first-seen order; each triple of that subject becomes one child:
  ``<span typeof>`` for rdf:type, ``<a rel href>`` for URI objects,
  ``<span property content [datatype|xml:lang]>`` for literals. Every
  literal span sets ``xml:lang`` explicitly (empty disables RDFa lang
  inheritance), so the re-parse reproduces lang tags bit-for-bit.
- one ``<section about="{resource_uri}"><p>{text}</p></section>`` per
  extracted resource — the document content. No RDFa attributes besides
  ``about``, so the text contributes no triples.

URIs are compacted to CURIEs via the fixed namespace table when a
prefix matches (``namespaces.qname``), else written in full — RDFa's
SafeCURIE/IRI fallback, which ``rdfa.expand_curie`` mirrors on the way
back.
"""

from __future__ import annotations

from .namespaces import NS, RDF_TYPE, qname

_DOCTYPE = ('<?xml version="1.0" encoding="utf-8"?>\n'
            '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.1//EN" '
            '"http://www.w3.org/TR/xhtml11/DTD/xhtml11.dtd">')


def xml_escape(value: str, quot: bool = False) -> str:
    value = (value.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))
    if quot:
        value = value.replace('"', "&quot;")
    return value


def _attr(name: str, value: str) -> str:
    return ' %s="%s"' % (name, xml_escape(value, quot=True))


def _curie(uri: str) -> str:
    """Compact to prefix:local when a registered prefix matches; full
    URIs pass through expand_curie unchanged on re-parse."""
    q = qname(uri)
    return q


def _triple_element(t) -> str:
    """One RDFa child element for a triple whose subject is established
    by the enclosing @about div."""
    pred, obj = t["predicate"], t["object"]
    if t["objtype"] == "uri":
        if pred == RDF_TYPE:
            return "      <span%s/>" % _attr("typeof", _curie(obj))
        return "      <a%s%s/>" % (_attr("rel", _curie(pred)),
                                   _attr("href", obj))
    parts = [_attr("property", _curie(pred)), _attr("content", obj)]
    if t["datatype"]:
        parts.append(_attr("datatype", _curie(t["datatype"])))
    else:
        # explicit xml:lang per literal ("" disables inheritance), so
        # the re-parse reproduces the lang column exactly
        parts.append(_attr("xml:lang", t["lang"] or ""))
    return "      <span%s/>" % "".join(parts)


def render_document(uri: str, lang: str, title: str | None,
                    triples, resources) -> str:
    """→ XHTML 1.1 + RDFa string for one document.

    ``triples``: iterable of dicts/NamedTuples with keys (subject,
    predicate, object, objtype, lang, datatype); ``resources``:
    iterable of (resource_uri, text) pairs."""
    rows = [t._asdict() if hasattr(t, "_asdict") else dict(t)
            for t in triples]
    by_subject: dict[str, list[dict]] = {}
    order: list[str] = []
    for t in rows:
        s = t["subject"]
        if s not in by_subject:
            by_subject[s] = []
            order.append(s)
        by_subject[s].append(t)

    out = [_DOCTYPE,
           '<html xmlns="http://www.w3.org/1999/xhtml"%s%s>'
           % ("".join(_attr("xmlns:%s" % p, n) for p, n in sorted(NS.items())),
              _attr("xml:lang", lang or "")),
           "  <head>",
           "    <title>%s</title>" % xml_escape(title or ""),
           "  </head>",
           "  <body%s>" % _attr("about", uri)]
    for subject in order:
        out.append('    <div class="meta"%s>' % _attr("about", subject))
        out.extend(_triple_element(t) for t in by_subject[subject])
        out.append("    </div>")
    for resource_uri, text in resources or ():
        out.append("    <section%s>" % _attr("about", resource_uri))
        out.append("      <p>%s</p>" % xml_escape(text or ""))
        out.append("    </section>")
    out.append("  </body>")
    out.append("</html>")
    return "\n".join(out)


__all__ = ["render_document", "xml_escape"]
