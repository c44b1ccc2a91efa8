"""Triple P/R vs the reference's RFC fixture suite — the BASELINE.json
headline gate (P/R >= 0.95 against testDocRepo-derived goldens).

Inputs/goldens are read from the read-only reference checkout at test
time (nothing is copied into this repo); skipped when absent.
"""

import glob
import os

import pytest

from ferenda_spark.linking import ResourceLookup
from ferenda_spark.rdfio import parse_turtle
from ferenda_spark.rfcdoc import parse_rfc
from ferenda_spark.uris import RepoConfig

REF = "/root/reference/test/files/repo/rfc"
COMMONDATA = "/root/reference/ferenda/sources/tech/res/extra/rfc.ttl"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture tree not available")

CFG = RepoConfig(alias="rfc", url="http://localhost:8000/",
                 generator="ferenda.sources.tech.rfc.RFC")


def _lookup():
    rl = ResourceLookup.from_turtle(open(COMMONDATA).read())
    return rl.lookup


def _cases():
    return sorted(glob.glob(REF + "/downloaded/*.txt"))


def _pr(path, lookup):
    basefile = os.path.basename(path)[:-4]
    goldenpath = "%s/distilled/%s.ttl" % (REF, basefile)
    if not os.path.exists(goldenpath):
        return None
    golden = set(parse_turtle(open(goldenpath).read()))
    text = open(path, encoding="utf-8", errors="replace").read()
    mine = set(parse_rfc(text, basefile, CFG, commondata=lookup).triples)
    return mine, golden


@pytest.mark.parametrize("path", _cases(),
                         ids=[os.path.basename(p)[:-4] for p in _cases()])
def test_rfc_triples_pr(path):
    res = _pr(path, _lookup())
    if res is None:
        pytest.skip("no golden")
    mine, golden = res
    tp = len(mine & golden)
    assert tp / len(mine) >= 0.95, sorted(mine - golden)
    assert tp / len(golden) >= 0.95, sorted(golden - mine)


def test_rfc_micro_pr():
    lookup = _lookup()
    tp = mine_n = golden_n = 0
    for path in _cases():
        res = _pr(path, lookup)
        if res is None:
            continue
        mine, golden = res
        tp += len(mine & golden)
        mine_n += len(mine)
        golden_n += len(golden)
    assert mine_n and golden_n
    assert tp / mine_n >= 0.95
    assert tp / golden_n >= 0.95
