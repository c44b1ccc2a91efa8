"""Canonical URI minting and its inverse.

ref ferenda/documentrepository.py:642-717 (canonical_uri/dataset_uri/
basefile_from_uri) and the coin-URI slug machinery
(ref ferenda/thirdparty/coin.py:57-97 SlugTransformer).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urlparse


class RepoConfig:
    """The slice of the reference's per-repo configuration the pipeline
    needs (ref ferenda/documentrepository.py:90-96 'ridiculous amount of
    properties' — we keep only the data-bearing ones). Broadcast to
    executors; pure data."""

    def __init__(self,
                 alias: str = "base",
                 url: str = "http://localhost:8000/",
                 lang: str = "en",
                 rdf_type: str = "http://xmlns.com/foaf/0.1/Document",
                 generator: str = "ferenda.documentrepository.DocumentRepository",
                 content_selector: str = "body",
                 filter_selectors: tuple[str, ...] = ("script",)):
        self.alias = alias
        self.url = url
        self.lang = lang
        self.rdf_type = rdf_type
        # prov:wasGeneratedBy value; the reference emits the qualified
        # class name (ref ferenda/documentrepository.py:636-640) — kept
        # configurable so fixture parity and production naming both work
        self.generator = generator
        self.content_selector = content_selector
        self.filter_selectors = filter_selectors

    def canonical_uri(self, basefile: str) -> str:
        """ref ferenda/documentrepository.py:642-655."""
        return "%sres/%s/%s" % (self.url, self.alias, basefile)

    def dataset_uri(self, param: str | None = None, value: str | None = None) -> str:
        """ref ferenda/documentrepository.py:657-691."""
        uri = "%sdataset/%s" % (self.url, self.alias)
        if param and value:
            uri += "?%s=%s" % (param, quote(value))
        return uri

    def basefile_from_uri(self, uri: str) -> str | None:
        """ref ferenda/documentrepository.py:694-717."""
        prefix = self.url + "res/"
        if uri.startswith(prefix):
            path = uri[len(prefix):]
            if "/" in path:
                alias, basefile = path.split("/", 1)
                if "#" in basefile:
                    basefile = basefile.split("#")[0]
                elif "." in basefile:
                    basefile = basefile.split(".")[0]
                if alias == self.alias:
                    return basefile
        return None


def basefile_from_url(url: str) -> str:
    """Derive the repo-scoped document id from a source URL. The synthetic
    pages table uses ``http://<host>/<alias>/<basefile>`` layout
    (FIXTURES.md §1); strip scheme/host/alias and any suffix."""
    path = urlparse(url).path.lstrip("/")
    if "/" in path:
        path = path.split("/", 1)[1]
    if path.endswith((".html", ".htm", ".txt")):
        path = path.rsplit(".", 1)[0]
    return path


_SLUG_STRIP = re.compile(r"[^\w\s\-+]", re.UNICODE)


def slugify(value: str, space: str = "+") -> str:
    """Coin-style slug: lowercase, strip non-word chars, spaces →
    spaceReplacement (default '+') (ref ferenda/thirdparty/coin.py:57-97).
    """
    value = _SLUG_STRIP.sub("", value.lower())
    return space.join(value.split())


def coin_uri(template: str, bindings: dict[str, str], base: str = "") -> str:
    """Expand a coin uriTemplate: ``{+base}`` inserts the space base
    unescaped, ``{var}`` inserts the slugged binding
    (ref ferenda/thirdparty/coin.py:100-236 Template.coin_uri).
    Raises KeyError when a binding is missing (template not applicable).
    """
    out = []
    i = 0
    while i < len(template):
        ch = template[i]
        if ch == "{":
            j = template.index("}", i)
            var = template[i + 1:j]
            if var == "+base":
                out.append(base)
            elif var.startswith("+"):
                out.append(bindings[var[1:]])
            else:
                out.append(slugify(bindings[var]))
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)
