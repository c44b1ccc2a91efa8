"""Turtle (subset) reader and N-Triples writer.

The reference's distilled goldens (test/files/*/distilled/*.ttl) are
blank-node-free Turtle; the comparison gate is graph-set equality
(ref ferenda/testutil.py:58-117 assertEqualGraphs). This module reads
that subset — @prefix, 'a', ';' / ',' continuation, <uri>, prefixed
names, quoted literals with @lang or ^^datatype — and writes N-Triples
(the dump.nt analog, ref ferenda/documentrepository.py:1741-1811).
"""

from __future__ import annotations

import re

from .model import Triple

_TOKEN = re.compile(r"""
      (?P<comment>\#[^\n]*)
    | (?P<prefix>@prefix)
    | (?P<uri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtsep>\^\^)
    | (?P<number>-?\d+(?:\.\d+)?(?=[\s;,.\]]))
    | (?P<punct>[;,.\[\]])
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.\-%#/]*)
    | (?P<a>\ba\b)
    | (?P<ws>\s+)
""", re.VERBOSE)

_ESCAPES = {"\\n": "\n", "\\t": "\t", "\\r": "\r",
            '\\"': '"', "\\\\": "\\"}


def _unescape(s: str) -> str:
    return re.sub(r"\\[ntr\"\\]", lambda m: _ESCAPES[m.group(0)], s)


def _tokens(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError("ttl tokenize error at %r" % text[pos:pos + 40])
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield m


def parse_turtle(text: str) -> list[Triple]:
    """Parse the Turtle subset the engine consumes, including anonymous
    blank nodes ``[ p o ; … ]`` (nested), which the coin URISpace
    configs use heavily (ref lagen/nu/res/uri/*.space.ttl). Blank nodes
    become ``_:bN`` identifiers with objtype ``bnode``."""
    prefixes: dict[str, str] = {}
    triples: list[Triple] = []
    toks = list(_tokens(text))
    n_bnodes = [0]

    def term(j):
        """Returns (value, kind, next_j); kind in uri/literal/bnode."""
        t = toks[j]
        if t.group(0) == "[":
            n_bnodes[0] += 1
            bid = "_:b%d" % n_bnodes[0]
            j += 1
            if toks[j].group(0) != "]":
                j = po_list(bid, j)
            assert toks[j].group(0) == "]", toks[j].group(0)
            return bid, "bnode", j + 1
        if t.lastgroup == "uri":
            return t.group("uri")[1:-1], "uri", j + 1
        if t.lastgroup == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "uri", j + 1
        if t.lastgroup == "number":
            raw = t.group("number")
            dt = ("http://www.w3.org/2001/XMLSchema#decimal" if "." in raw
                  else "http://www.w3.org/2001/XMLSchema#integer")
            return (raw, "", dt), "literal", j + 1
        if t.lastgroup == "literal":
            value = _unescape(t.group("literal")[1:-1])
            lang = ""
            datatype = ""
            j += 1
            if j < len(toks) and toks[j].lastgroup == "langtag":
                lang = toks[j].group("langtag")[1:]
                j += 1
            elif j < len(toks) and toks[j].lastgroup == "dtsep":
                dt, _, j = term(j + 1)
                datatype = dt
            return (value, lang, datatype), "literal", j
        if t.group("local") is not None:
            prefix = t.group("pname") or ""
            return prefixes[prefix] + t.group("local"), "uri", j + 1
        raise ValueError("unexpected token %r" % t.group(0))

    def po_list(subject, j):
        """Predicate-object list for ``subject``; stops before the
        closing '.' or ']'."""
        while True:
            predicate, _, j = term(j)
            while True:
                obj, kind, j = term(j)
                if kind == "literal":
                    value, lang, datatype = obj
                    triples.append(Triple.literal(subject, predicate, value,
                                                  lang, datatype))
                else:
                    triples.append(Triple(subject, predicate, obj,
                                          "uri" if kind == "uri" else "bnode"))
                if toks[j].group(0) == ",":
                    j += 1
                    continue
                break
            if toks[j].group(0) == ";":
                j += 1
                # allow trailing ';' before '.' or ']'
                if toks[j].group(0) in (".", "]"):
                    break
                continue
            break
        return j

    i = 0
    while i < len(toks):
        if toks[i].lastgroup == "prefix":
            prefix = toks[i + 1].group("pname") or ""
            uri, _, i = term(i + 2)
            prefixes[prefix] = uri
            assert toks[i].group(0) == "."
            i += 1
            continue
        subject, _, i = term(i)
        i = po_list(subject, i)
        assert toks[i].group(0) == ".", toks[i].group(0)
        i += 1
    return triples


def _nt_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
             .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def to_ntriples(triples) -> str:
    """Deterministic (sorted) N-Triples serialization — the engine's
    dump.nt analog."""
    lines = []
    for t in sorted(triples, key=lambda t: t.sortkey()):
        if t.objtype == "uri":
            obj = "<%s>" % t.object
        else:
            obj = '"%s"' % _nt_escape(t.object)
            if t.lang:
                obj += "@" + t.lang
            elif t.datatype:
                obj += "^^<%s>" % t.datatype
        lines.append("<%s> <%s> %s ." % (t.subject, t.predicate, obj))
    return "\n".join(lines) + ("\n" if lines else "")
