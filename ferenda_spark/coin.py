"""Coin URI-minting engine: template-driven canonical/alternate URIs.

From-scratch re-implementation of the COIN scheme the reference vendors
(ref ferenda/thirdparty/coin.py:14-236) driven by the same Turtle
config shape (ref ferenda/sources/legal/se/res/uri/
swedishlegalsource.space.ttl; used for owl:sameAs aliasing in
lagen/nu/sameas.py:15-52). Semantics matched feature-for-feature:

- template ordering by (priority, type-specificity, #bindings)
  descending (ref coin.py:37-40);
- ``coin:forType`` gating on rdf:type (ref coin.py:135-139);
- per-binding ``coin:variable``/``coin:match``/``coin:slugFrom`` —
  slugFrom follows the bound value to a slug literal in the data graph,
  falling back to the space graph (ref coin.py:219-233);
- ``coin:relToBase``/``coin:relFromBase``: the base URI comes from a
  related resource — used directly when inside the URI space, else
  minted recursively (ref coin.py:182-201);
- ``coin:uriTemplate`` / ``coin:fragmentTemplate`` expansion with
  ``{+base}`` (raw) and ``{var}`` (slug-transformed), fragment
  separator when the base already carries a fragment
  (ref coin.py:149-179);
- slug transform: ToLowerCase, char ``replace`` pairs,
  ``spaceReplacement``, ``stripPattern`` (ref coin.py:57-97).

Everything is pure data + pure functions, so the engine broadcasts to
executors and the same code runs single-threaded for the oracle
materialization (kgcache).
"""

from __future__ import annotations

import re

from .model import Triple
from .namespaces import RDF_TYPE
from .rdfio import parse_turtle

COIN = "http://purl.org/court/def/2009/coin#"


class GraphIndex:
    """Minimal rdflib-Graph stand-in over a Triple list: subject-keyed
    predicate→objects index plus reverse lookup."""

    def __init__(self, triples):
        self.spo: dict[str, dict[str, list[Triple]]] = {}
        self.po_s: dict[tuple[str, str], list[str]] = {}
        for t in triples:
            self.spo.setdefault(t.subject, {}) \
                .setdefault(t.predicate, []).append(t)
            self.po_s.setdefault((t.predicate, t.object), []).append(t.subject)

    def value(self, s: str, p: str) -> str | None:
        ts = self.spo.get(s, {}).get(p)
        return ts[0].object if ts else None

    def objects(self, s: str, p: str) -> list[str]:
        return [t.object for t in self.spo.get(s, {}).get(p, [])]

    def subjects(self, p: str, o: str) -> list[str]:
        return self.po_s.get((p, o), [])

    def subject_set(self):
        return self.spo.keys()


class SlugTransform:
    """ref coin.py:57-97 SlugTransformer (unsupported coin:apply
    transforms are skipped, as the reference does)."""

    def __init__(self, graph: GraphIndex, node: str | None):
        self.lower = False
        self.replacements: list[tuple[str, str]] = []
        self.space_repl = "+"
        self.strip = None
        if node is None:
            return
        for ap in graph.objects(node, COIN + "apply"):
            if ap == COIN + "ToLowerCase":
                self.lower = True
        for pair in graph.objects(node, COIN + "replace"):
            char, _, repl = pair.partition(" ")
            self.replacements.append((char, repl))
        sr = graph.value(node, COIN + "spaceReplacement")
        if sr is not None:
            self.space_repl = sr
        sp = graph.value(node, COIN + "stripPattern")
        if sp is not None:
            self.strip = re.compile(sp)

    def __call__(self, value: str) -> str:
        if self.lower:
            value = value.lower()
        for char, repl in self.replacements:
            value = value.replace(char, repl)
        value = value.replace(" ", self.space_repl)
        if self.strip:
            value = self.strip.sub("", value)
        return value


class Binding:
    """ref coin.py:206-233."""

    def __init__(self, graph: GraphIndex, node: str):
        self.property = graph.value(node, COIN + "property")
        self.variable = (graph.value(node, COIN + "variable")
                         or uri_leaf(self.property))
        self.slug_from = graph.value(node, COIN + "slugFrom")
        self.match = graph.value(node, COIN + "match")

    def find_match(self, data: GraphIndex, space: GraphIndex, subject: str):
        # deterministic choice among multi-valued properties: the
        # reference takes rdflib's arbitrary set order
        # (resource.value(), ref coin.py:220); a distributed engine
        # needs a stable pick, so min() — documented deviation
        values = data.objects(subject, self.property)
        value = min(values) if values else None
        if self.slug_from:
            if value is None:
                return None
            # the data graph may hold only metadata, not the slug
            # database — fall back to the space graph (ref coin.py:222-229)
            value = (data.value(value, self.slug_from)
                     or space.value(value, self.slug_from))
        if self.match is not None and value != self.match:
            return None
        return value


class Template:
    """ref coin.py:99-204."""

    def __init__(self, space: "URISpace", node: str):
        g = space.graph
        self.space = space
        self.priority = int(g.value(node, COIN + "priority") or 0)
        self.for_type = g.value(node, COIN + "forType")
        self.uri_template = g.value(node, COIN + "uriTemplate")
        self.fragment_template = g.value(node, COIN + "fragmentTemplate")
        self.rel_to_base = g.value(node, COIN + "relToBase")
        self.rel_from_base = g.value(node, COIN + "relFromBase")
        self.bindings = [Binding(g, b)
                         for b in g.objects(node, COIN + "binding")]
        st = g.value(node, COIN + "slugTransform")
        self.slug_transform = (SlugTransform(g, st) if st
                               else space.slug_transform)
        assert self.uri_template or self.fragment_template

    def coin_uri(self, data: GraphIndex, subject: str,
                 _depth: int = 0) -> str | None:
        if self.for_type and self.for_type not in data.objects(
                subject, RDF_TYPE):
            return None
        matches = {}
        for binding in self.bindings:
            value = binding.find_match(data, self.space.graph, subject)
            if value is None:
                return None
            matches[binding.variable] = value
        return self._build(self._base(data, subject, _depth), matches)

    def _base(self, data: GraphIndex, subject: str, depth: int):
        """ref coin.py:182-201 get_base/guarded_base."""
        base = self.space.base

        def guarded(other: str):
            if other.startswith(base) and not other.startswith("_:"):
                return other
            if depth >= 8:      # recursion guard (cyclic isPartOf data)
                return None
            return self.space.coin_uri_or_none(data, other, depth + 1)

        if self.rel_to_base:
            for o in sorted(data.objects(subject, self.rel_to_base)):
                return guarded(o)
            return None
        if self.rel_from_base:
            for s in sorted(data.subjects(self.rel_from_base, subject)):
                return guarded(s)
            return None
        return base

    def _build(self, base: str | None, matches: dict) -> str | None:
        """ref coin.py:149-179 build_uri."""
        if not base:
            return None
        if self.uri_template:
            expanded = self.uri_template
        else:
            sep = ("#" if "#" not in base
                   else self.space.fragment_separator)
            expanded = base + sep + self.fragment_template
        expanded = expanded.replace("{+base}", base)
        for var, value in matches.items():
            expanded = expanded.replace("{%s}" % var,
                                        self.slug_transform(value))
        if expanded.startswith("/"):
            expanded = expanded[1:]
        if expanded.startswith(("http://", "https://")):
            return expanded
        return "%s/%s" % (base, expanded)


class URISpace:
    """The template registry; mint with :meth:`coin_uri` (first match
    in priority order) or :meth:`coin_uris` (all)."""

    def __init__(self, triples: list[Triple], space_uri: str | None = None):
        g = GraphIndex(triples)
        self.graph = g
        if space_uri is None:
            hits = g.subjects(RDF_TYPE, COIN + "URISpace")
            if not hits:
                raise ValueError("no coin:URISpace in config")
            space_uri = hits[0]
        self.uri = space_uri
        self.base = g.value(space_uri, COIN + "base") or ""
        self.fragment_separator = g.value(
            space_uri, COIN + "fragmentSeparator") or "-"
        self.slug_transform = SlugTransform(
            g, g.value(space_uri, COIN + "slugTransform"))
        self.templates = [Template(self, t)
                          for t in g.objects(space_uri, COIN + "template")]
        # (priority, type-specificity, #vars) descending (ref coin.py:37-40)
        self.templates.sort(
            key=lambda t: (t.priority, t.for_type is not None,
                           len(t.bindings)),
            reverse=True)

    @classmethod
    def from_turtle(cls, text: str, space_uri: str | None = None):
        return cls(parse_turtle(text), space_uri)

    def coin_uris(self, data: GraphIndex, subject: str, depth: int = 0):
        for template in self.templates:
            uri = template.coin_uri(data, subject, depth)
            if uri:
                yield uri

    def coin_uri(self, data: GraphIndex, subject: str) -> str:
        for uri in self.coin_uris(data, subject):
            return uri
        raise ValueError("Couldn't mint uri for %s" % subject)

    def coin_uri_or_none(self, data: GraphIndex, subject: str,
                         depth: int = 0) -> str | None:
        for uri in self.coin_uris(data, subject, depth):
            return uri
        return None

    def compute_uris(self, triples: list[Triple]) -> dict[str, list[str]]:
        """URIMinter.compute_uris (ref coin.py:19-25): all mintable
        URIs per subject of the data graph."""
        data = GraphIndex(triples)
        out = {}
        for s in data.subject_set():
            uris = list(self.coin_uris(data, s))
            if uris:
                out[s] = uris
        return out


def uri_leaf(uri: str) -> str | None:
    """Last path/fragment segment of a URI (ref coin.py:236-242)."""
    for char in ("#", "/", ":"):
        if uri.endswith(char):
            break
        base, sep, leaf = uri.rpartition(char)
        if sep and leaf:
            return leaf
    return None
