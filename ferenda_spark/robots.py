r"""robots.txt parsing kernels (RFC 9309, the Robots Exclusion
Protocol) — the crawl-side admission rule every Common-Crawl-style
pipeline applies before a page may enter the lake.

Reference analog: ferenda's ``download()`` fetches politely one URL at
a time (ref ferenda/documentrepository.py:571-723) and leaves REP to
the operator; at crawl scale admission is a set-at-a-time verdict join
(:func:`ferenda_spark.operators.crawl.robots_filter`), and these
kernels are its per-robots-file parse step.

Supported subset, documented against RFC 9309:

- lines are ``name: value`` records; ``#`` starts a comment; blank and
  unparseable lines are ignored; directive names are case-insensitive;
- groups: consecutive ``User-agent`` lines name a group; the group's
  rules run until the next ``User-agent`` line that follows at least
  one rule. A group applies to a crawler when one of its agent tokens
  equals the crawler's token case-insensitively, or is ``*``. Per RFC
  9309 §2.2.1, ALL groups for the matched token combine; groups for
  the wildcard are used only when no exact-token group exists
  (substring/prefix user-agent matching is NOT implemented — tokens
  compare whole);
- rules: ``Allow`` / ``Disallow`` path patterns with ``*`` wildcards
  and the ``$`` end anchor (§2.2.3); an empty pattern is a no-op;
  unknown directives (Crawl-delay, Sitemap, …) are ignored;
- precedence (§2.2.2): the matching rule with the LONGEST pattern
  wins; on a length tie Allow wins; no matching rule → allowed; no
  robots.txt at all → allowed (callers encode that as a missing host
  row).

``rule_pattern`` translates one rule into an anchored regex that means
the same thing in Java regex and RE2 (only ``\``-escaped punctuation,
``.*`` for ``*``, a ``$`` anchor only when the rule ends with one), so
the distributed matcher can evaluate it engine-side.
"""

from __future__ import annotations

import re


def rule_pattern(rule: str) -> str:
    """One Allow/Disallow path pattern → anchored regex string."""
    anchored = rule.endswith("$")
    core = rule[:-1] if anchored else rule
    body = ".*".join(re.escape(part) for part in core.split("*"))
    return "^" + body + ("$" if anchored else "")


def parse_robots(text: str, agent: str = "*") -> list[tuple]:
    """robots.txt text → [(allow, rule, pattern, priority)] for the
    given crawler token, RFC 9309 group selection (see module doc).
    ``priority`` is the rule-pattern length — the §2.2.2 specificity
    key the matcher maximizes."""
    agent = agent.lower()
    exact: list[tuple] = []
    star: list[tuple] = []
    cur_agents: list[str] = []
    rule_seen = True            # so the first User-agent starts a group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        name, value = line.split(":", 1)
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if rule_seen:
                cur_agents = []
                rule_seen = False
            cur_agents.append(value.lower())
        elif name in ("allow", "disallow"):
            rule_seen = True
            if not value:
                continue        # empty pattern is a no-op
            entry = (name == "allow", value, rule_pattern(value),
                     len(value))
            if agent in cur_agents:
                exact.append(entry)
            elif "*" in cur_agents:
                star.append(entry)
    return exact if exact else star
