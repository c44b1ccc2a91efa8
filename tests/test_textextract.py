"""Byte-identical plaintext extraction — golden strings transcribed from
the reference suite (ref test/testDocRepo.py:1041-1067, fixture
test/files/base/parsed/123/a.xhtml)."""

from ferenda_spark.htmltree import parse_html, select_content
from ferenda_spark.textextract import normalize_space, resource_texts

A_XHTML = """<?xml version='1.0' encoding='utf-8'?>
<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
  <head about="http://example.org/base/123/a">
    <title property="dcterms:title">Example</title>
  </head>
  <body about="http://example.org/base/123/a">
    <p>This is part of the main document, but not of any sub-resource.</p>
    <div about="http://example.org/base/123/a#S1">
      <p>This is part of document-part section 1</p>
      <div about="http://example.org/base/123/a#S1.1">
        <p>This is the text in subsection 1.1</p>
      </div>
    </div>
    <div about="http://example.org/base/123/a#S2">
      <p>This is the second main document part</p>
    </div>
    <p>This is the tail end of the main document</p>
  </body>
</html>
"""

GOLDEN = [
    ("http://example.org/base/123/a",
     "This is part of the main document, but not of any sub-resource. "
     "This is the tail end of the main document"),
    ("http://example.org/base/123/a#S1",
     "This is part of document-part section 1"),
    ("http://example.org/base/123/a#S1.1",
     "This is the text in subsection 1.1"),
    ("http://example.org/base/123/a#S2",
     "This is the second main document part"),
]


def test_resource_texts_golden():
    body = select_content(parse_html(A_XHTML.encode("utf-8")))
    assert resource_texts(body) == GOLDEN


def test_normalize_space():
    # ref ferenda/util.py:286-294 doctest
    assert normalize_space(" This is  a long \n string\n") == "This is a long string"
    assert normalize_space("nbsp\xa0here") == "nbsp here"


def test_verbatim_and_id_resources():
    html = b"""<html><body about="http://x/doc">
      <p>head <span class="verbatim">HIDDEN</span> tail</p>
      <div id="part"><p>id-addressed part</p></div>
    </body></html>"""
    body = select_content(parse_html(html))
    texts = dict(resource_texts(body))
    # the verbatim span's tail is swallowed with it: etree tails belong to
    # the skipped child (ref ferenda/documentrepository.py:2138-2141)
    assert texts["http://x/doc"] == "head"
    assert texts["http://x/doc#part"] == "id-addressed part"


def test_inline_tail_joins_without_space():
    # etree semantics: a child's tail is stripped together with its text
    # (ref ferenda/documentrepository.py:2131-2149)
    html = b'<html><body about="http://x/d"><p>A<span>b</span>c</p></body></html>'
    body = select_content(parse_html(html))
    assert dict(resource_texts(body))["http://x/d"] == "Abc"


def test_script_filtered():
    html = b"""<html><body about="http://x/d">
    <p>keep</p><script>drop();</script></body></html>"""
    body = select_content(parse_html(html))
    assert dict(resource_texts(body))["http://x/d"] == "keep"
