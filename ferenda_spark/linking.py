"""Entity linking: label → canonical resource URI.

The reference's linking primitive is ``lookup_resource``
(ref ferenda/documentrepository.py:478-525): exact label match against the
commondata graph, else ``difflib.get_close_matches(label, candidates, 1,
cutoff=0.8)``, else KeyError. This module provides

- :class:`ResourceLookup` — the same semantics as a pure, broadcastable
  object (difflib itself is used, so scoring parity is exact), and
- helpers to load a commondata label table from Turtle.

The distributed form (exact broadcast join first, 3-gram candidate
generation + batched difflib scorer for the misses) lives in
``operators/linking.py``.
"""

from __future__ import annotations

import difflib

from .namespaces import expand_curie
from .rdfio import parse_turtle

FOAF_NAME = "http://xmlns.com/foaf/0.1/name"


class ResourceLookup:
    """Label → URI with difflib fuzzy fallback (cutoff 0.8)."""

    def __init__(self, entries):
        """entries: iterable of (uri, predicate_uri, label)."""
        self._by_pred: dict[str, dict[str, str]] = {}
        for uri, pred, label in entries:
            self._by_pred.setdefault(pred, {})[label] = uri

    @classmethod
    def from_dict(cls, table: dict) -> "ResourceLookup":
        """From {(predicate_curie, label): uri} pairs."""
        return cls(((uri, expand_curie(pred), label)
                    for (pred, label), uri in table.items()))

    @classmethod
    def from_turtle(cls, text: str) -> "ResourceLookup":
        triples = parse_turtle(text)
        return cls((t.subject, t.predicate, t.object)
                   for t in triples if t.objtype == "literal")

    def lookup(self, label: str, predicate: str = FOAF_NAME,
               cutoff: float = 0.8) -> str:
        predicate = expand_curie(predicate)
        resources = self._by_pred.get(predicate, {})
        if label in resources:
            return resources[label]
        fuzz = difflib.get_close_matches(label, resources.keys(), 1, cutoff)
        if fuzz:
            return resources[fuzz[0]]
        raise KeyError("No good match for '%s'" % label)

    def labels(self, predicate: str = FOAF_NAME) -> dict[str, str]:
        return dict(self._by_pred.get(expand_curie(predicate), {}))


def difflib_ratio(a: str, b: str) -> float:
    """The exact score get_close_matches ranks by — SequenceMatcher with
    the quick-ratio pre-filters applied the same way difflib does."""
    m = difflib.SequenceMatcher(None, a, b)
    if m.real_quick_ratio() < 1.0 and m.quick_ratio() < 1.0:
        pass  # still fall through to ratio(); filters only skip work
    return m.ratio()


def close_enough(label: str, candidate: str, cutoff: float = 0.8) -> bool:
    """True iff get_close_matches would keep ``candidate`` for ``label``:
    all three staged ratios must clear the cutoff (difflib semantics)."""
    m = difflib.SequenceMatcher(None, candidate, label)
    return (m.real_quick_ratio() >= cutoff and
            m.quick_ratio() >= cutoff and
            m.ratio() >= cutoff)


def trigrams(s: str) -> set[str]:
    """Padded character 3-grams, lowercased — the candidate-generation
    key: two strings sharing zero trigrams cannot reach difflib ratio
    0.8 for realistic label lengths."""
    s = " " + s.lower() + " "
    return {s[i:i + 3] for i in range(len(s) - 2)}


class TrigramIndex:
    """Inverted trigram → entry index over a label dictionary.

    Probing unions the posting lists of the query's trigrams, so the
    per-miss cost is O(candidates sharing ≥1 trigram), sublinear in
    dictionary size — not a scan of every entry (the broadcast-side
    index the distributed scorer builds once per executor).
    """

    def __init__(self, items):
        """items: iterable of (label, uri)."""
        self.entries = list(items)
        self.exact = {label: uri for label, uri in self.entries}
        self.index: dict[str, list[int]] = {}
        for i, (label, _uri) in enumerate(self.entries):
            for g in trigrams(label):
                self.index.setdefault(g, []).append(i)

    def best_fuzzy(self, label: str, cutoff: float = 0.8):
        """→ (matched_label, uri, ratio) or None, with scoring and
        tie-breaking identical to difflib.get_close_matches: ranked by
        (ratio, candidate) so equal-ratio ties resolve to the
        lexicographically larger label (heapq.nlargest on tuples)."""
        cand_ids: set[int] = set()
        for g in trigrams(label):
            cand_ids.update(self.index.get(g, ()))
        best = None
        for i in cand_ids:
            dlabel, uri = self.entries[i]
            if not close_enough(label, dlabel, cutoff):
                continue
            r = difflib_ratio(dlabel, label)
            if best is None or (r, dlabel) > (best[2], best[0]):
                best = (dlabel, uri, r)
        return best

    def resolve(self, label: str, cutoff: float = 0.8):
        """→ (matched_label, uri, method) or None: exact hit first,
        else the fuzzy fallback — lookup_resource set-at-a-time
        (ref ferenda/documentrepository.py:478-525)."""
        if label in self.exact:
            return (label, self.exact[label], "exact")
        hit = self.best_fuzzy(label, cutoff)
        if hit:
            return (hit[0], hit[1], "fuzzy")
        return None
