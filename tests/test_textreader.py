"""TextReader parity against the reference's own test suite and
fixture files (≙ test/testTextReader.py over test/files/textreader)."""

import os
import sys

import pytest

from ferenda_spark.textreader import TextReader

PREFIX = "/root/reference/test/files/textreader"

pytestmark = pytest.mark.skipif(not os.path.isdir(PREFIX),
                                reason="reference tree not available")


@pytest.fixture(params=["file", "string"])
def f(request):
    if request.param == "file":
        return TextReader(PREFIX + "/LICENSE.txt", linesep=TextReader.UNIX)
    with open(PREFIX + "/LICENSE.txt", encoding="ascii") as fp:
        return TextReader(string=fp.read(), linesep=TextReader.UNIX)


def test_readline(f):
    assert f.readline() == "A. HISTORY OF THE SOFTWARE"
    assert f.readline() == "=========================="


def test_iterate_file(f):
    assert f.bof() and not f.eof()
    for _line in f:
        pass
    assert not f.bof() and f.eof()


def test_readparagraph(f):
    assert f.readparagraph() == ("A. HISTORY OF THE SOFTWARE\n"
                                 "==========================")
    assert f.readparagraph().startswith(
        "Python was created in the early 1990s by Guido van Rossum")
    # the next paragraph after this cue is separated by THREE newlines
    f.cuepast("to make these releases possible.")
    assert f.readparagraph()[:23] == "B. TERMS AND CONDITIONS"


def test_readchunk(f):
    f.readchunk("(")
    assert f.readchunk(")") == "CWI, see http://www.cwi.nl"


def test_peekline(f):
    assert f.peekline() == "A. HISTORY OF THE SOFTWARE"
    assert f.peekline(4) == ("Python was created in the early 1990s by "
                             "Guido van Rossum at Stichting")
    assert f.peekline() == "A. HISTORY OF THE SOFTWARE"  # pos unchanged


def test_peekparagraph(f):
    assert f.peekparagraph() == ("A. HISTORY OF THE SOFTWARE\n"
                                 "==========================")
    assert f.peekparagraph(2).startswith("Python was created")


def test_prevline(f):
    f.readparagraph()
    f.readparagraph()
    assert f.prevline(3) == ("principal author, although it includes many "
                             "contributions from others.")
    assert f.prevline(6) == ("Python was created in the early 1990s by "
                             "Guido van Rossum at Stichting")


def test_cue_cuepast_readto(f):
    f.cue("Guido")
    assert f.readline() == "Guido van Rossum at Stichting"
    f.seek(0)
    f.cuepast("Guido")
    assert f.readline() == " van Rossum at Stichting"
    f.seek(0)
    assert f.readto("SOFTWARE") == "A. HISTORY OF THE "


def test_autostrip(f):
    f.autostrip = True
    assert f.peekline(28) == \
        "Release         Derived     Year        Owner       GPL-"
    f.autostrip = False
    assert f.peekline(28) == \
        "    Release         Derived     Year        Owner       GPL-"


def test_autodewrap(f):
    f.autodewrap = True
    assert f.readparagraph() == \
        "A. HISTORY OF THE SOFTWARE =========================="


def test_autodehyphenate():
    f = TextReader(string="some-\nthing hyphen-\nated", linesep="\n")
    f.autodehyphenate = True
    assert f.readparagraph() == "something hyphenated"


def test_iterate_paragraph_chunks(f):
    assert sum(1 for _ in f.getiterator(f.readchunk, f.linesep * 2)) == 44


def test_subreader_pages():
    f = TextReader(PREFIX + "/test_base64.py", linesep=TextReader.UNIX)
    p = f.getreader(f.readpage)
    assert p.readline() == "import unittest"
    with pytest.raises(IOError):
        p.peekline(32)           # cannot read ahead into page 2
    with pytest.raises(IOError):
        p.cue("LegacyBase64TestCase")
    f.seek(0)
    f.readpage()
    p = f.getreader(f.readpage)
    p.readline()
    assert p.readline() == "class LegacyBase64TestCase(unittest.TestCase):"
    with pytest.raises(IOError):
        p.prevline(4)            # cannot read back into page 1


def test_edge_cases(f):
    with pytest.raises(IOError):
        f.peekline(4711)
    with pytest.raises(IOError):
        f.prevline(4711)
    assert len(f.read(1)) == 1
    f.read(sys.maxsize)
    assert len(f.read(1)) == 0
    assert f.readline() == ""
    f.seek(0)
    with pytest.raises(IOError):
        f.cue("I am a little teapot")


def test_readline_until_eof(f):
    prev = None
    for line in f:
        prev = line
    assert prev == ("OF OR IN CONNECTION WITH THE USE OR PERFORMANCE "
                    "OF THIS SOFTWARE.")
    assert f.readline() == ""
