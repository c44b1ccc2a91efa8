"""Natural-sort keys for ordinals ("2" < "10", "1.9" < "1.10").

The reference compares ordinals with split_numalpha/numcmp ("10 a §" →
['', 10, ' a §'], ref ferenda/util.py:191-230) so OrdinalElement
siblings sort numerically (ref ferenda/elements/elements.py:512-530).

Two forms here:

- :func:`split_numalpha` — exact parity with the reference's python
  (used inside UDFs / tests)
- :func:`ordinal_sortkey` — a NATIVE column expression for the common
  dotted-ordinal case ("1.2.10"): zero-pad each digit run so plain
  string ordering equals natural ordering; stays in whole-stage codegen
  for TOC/window sorts at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUMALPHA = re.compile(r"(\d+)")


def split_numalpha(s: str) -> list:
    """ref ferenda/util.py:191-211: alternating [str, int, str, ...],
    always starting (possibly empty) with a string."""
    return [int(p) if p.isdigit() else p for p in _NUMALPHA.split(s)]


def numcmp_key(s: str) -> list:
    """A sortable key for mixed alpha/num strings: tag each part so
    str/int never compare directly (python3-safe numcmp)."""
    return [(1, p) if isinstance(p, int) else (0, p)
            for p in split_numalpha(s)]


def ordinal_sortkey(col, width: int = 6) -> Column:
    """Native expression: '1.2.10' → '000001.000002.000010'."""
    return F.concat_ws(
        ".", F.transform(F.split(col, r"\."),
                         lambda x: F.lpad(x, width, "0")))
