"""Minimal document-element tree + golden-compatible XML serializer.

The reference's element classes are list subclasses carrying public
attributes (ref ferenda/elements/elements.py:96-240); its
``serialize()`` emits one XML element per node, ``<str>`` for plain
strings, and pretty-prints with a pair of indent helpers derived from a
public snippet (ref elements.py:969-1000) whose recursive variant only
sets the tail of the *last* sibling — so nested siblings render
adjacent (``</Paragraph><Subsection …``). The FSM-corpus goldens
(test/files/fsmparser/*.xml) encode that exact quirk, so this
serializer reproduces it deliberately.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

ATTR_ORDER = ["ordinal", "title", "type", "id"]


class Element(list):
    """List-of-children with keyword attributes."""

    def __init__(self, children=None, **attrs):
        super().__init__(children or [])
        self.attrs = attrs

    def __getattr__(self, name):
        try:
            return self.attrs[name]
        except KeyError:
            raise AttributeError(name)


class Body(Element):
    pass


class Section(Element):
    pass


class Subsection(Element):
    pass


class Subsubsection(Element):
    pass


class Paragraph(Element):
    pass


class Preformatted(Element):
    pass


class OrderedList(Element):
    pass


class UnorderedList(Element):
    pass


class ListItem(Element):
    pass


def _to_etree(node) -> ET.Element:
    if isinstance(node, str):
        e = ET.Element("str")
        if node:
            e.text = node
        return e
    e = ET.Element(node.__class__.__name__)
    keys = sorted(node.attrs,
                  key=lambda k: (ATTR_ORDER.index(k)
                                 if k in ATTR_ORDER else len(ATTR_ORDER), k))
    for k in keys:
        if node.attrs[k] is not None:
            e.set(k, str(node.attrs[k]))
    for child in node:
        e.append(_to_etree(child))
    return e


def _indent_root(elem, level=0):
    # ref elements.py:972-982 — root level: every child gets a tail
    i = "\n" + level * "  "
    if len(elem) > 0:
        if not elem.text or not elem.text.strip():
            elem.text = i + "  "
        for e in elem:
            _indent_child(e, level + 1)
            if not e.tail or not e.tail.strip():
                e.tail = i + "  "
        if not e.tail or not e.tail.strip():
            e.tail = i


def _indent_child(elem, level=0):
    # ref elements.py:989-1000 — the loop variable shadows ``elem``,
    # so only the LAST child's tail is set; the goldens depend on it
    i = "\n" + level * "  "
    if len(elem):
        if not elem.text or not elem.text.strip():
            elem.text = i + "  "
        for elem in elem:
            _indent_child(elem, level + 1)
        if not elem.tail or not elem.tail.strip():
            elem.tail = i
    else:
        if level and (not elem.tail or not elem.tail.strip()):
            elem.tail = i


def serialize(root) -> str:
    """XML serialization byte-compatible with the reference's
    elements.serialize (ref elements.py:53-61, 866-921)."""
    t = _to_etree(root)
    _indent_root(t)
    return ET.tostring(t, "utf-8").decode("utf-8") + "\n"
