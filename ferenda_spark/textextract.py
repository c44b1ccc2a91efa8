"""Plaintext extraction — the byte-identical-per-url invariant.

Reproduces the reference's fulltext pipeline over one document:

- resource enumeration ``_relate_fulltext_resources``: the body plus every
  first-seen descendant carrying ``@about`` (dedup by about value,
  document order); a node with only ``@id`` resolves to
  ``body@about + "#" + id`` (ref ferenda/documentrepository.py:2044-2086)
- per-resource plaintext ``_extract_plaintext``: node text plus the
  recursive text of children that are not themselves resources and not
  ``class="verbatim"``, plus node tail; each element contributes
  ``strip() + trailing-space``  (ref ferenda/documentrepository.py:2131-2149;
  the trailing-space tag tuple ``("a" "b","i","span")`` compares bare names
  against *namespaced* etree tags there, so every element gets the space —
  reproduced by always appending it)
- ``normalize_space``: NBSP→space, then whitespace-run collapse
  (ref ferenda/util.py:286-294)

Golden values: ref test/testDocRepo.py:1041-1067.
"""

from __future__ import annotations

from .htmltree import Node


def normalize_space(s: str) -> str:
    """ref ferenda/util.py:286-294 — str.split() semantics exactly."""
    return " ".join(s.replace("\xa0", " ").split())


def enumerate_resources(body: Node) -> list[Node]:
    """[body] + first-seen @about descendants, document order
    (ref ferenda/documentrepository.py:2079-2086). Nodes with @id but no
    @about get about resolved against the body's @about
    (ref :2044-2053) — mutates those nodes' attrs like the reference does.
    """
    res: list[Node] = []
    seen: set[str] = set()
    body_about = body.get("about") or ""
    for node in body.iter():
        if node is body:
            continue
        about = node.get("about")
        if not about and node.get("id") and body_about:
            about = body_about + "#" + node.get("id")
            node.attrs["about"] = about
        if about and about not in seen:
            seen.add(about)
            res.append(node)
    return [body] + res


def extract_plaintext(node: Node, resources: list[Node]) -> str:
    """ref ferenda/documentrepository.py:2131-2149 (pre-normalize form)."""
    resource_ids = {id(r) for r in resources}
    return _extract(node, resource_ids)


def _extract(node: Node, resource_ids: set[int]) -> str:
    plaintext = node.text or ""
    for sub in node.children:
        if id(sub) not in resource_ids and sub.get("class") != "verbatim":
            plaintext += _extract(sub, resource_ids)
        # a skipped (resource/verbatim) child's tail is not visited,
        # matching etree semantics where tail lives on the child
    if node.tail:
        plaintext += node.tail
    return plaintext.strip() + " "


def resource_texts(body: Node) -> list[tuple[str, str]]:
    """(about_uri, normalized_text) per resource, document order.

    The driver loop of relate_fulltext minus indexing
    (ref ferenda/documentrepository.py:2030-2077): head is skipped by
    construction (we enumerate under body), resources lacking both @about
    and @id are skipped.
    """
    resources = enumerate_resources(body)
    out = []
    for resource in resources:
        about = resource.get("about")
        if not about:
            continue
        text = normalize_space(extract_plaintext(resource, resources))
        out.append((about, text))
    return out
