"""robots.txt parsing — the host-level consent signal beside the
page-level robots meta (``html_extract.robots_directives``).

A crawl-derived corpus must honor robots exclusions; the reference
fetched from its own bucket so it never needed this, but any
web-facing deployment of the fetch stage (``sources/http_fetch``)
does. Implements the Google robots.txt semantics (REP, RFC 9309):

- group selection: the most specific ``User-agent`` match wins (exact
  product token beats ``*``); multiple agent lines stack onto one
  group; groups for the same agent merge;
- rule matching: longest-match wins, ``Allow`` beats ``Disallow`` on
  equal length; ``*`` wildcards and the ``$`` end anchor are honored;
- an empty ``Disallow:`` means allow-all (common in the wild);
- ``Crawl-delay`` is surfaced per agent so the fetch stage can feed
  it straight into ``host_delay``.

Pure functions (no Spark imports): tested standalone; the Spark
operator (``operators/weblinks.filter_robots_disallowed``) parses
each host's robots.txt ONCE on the small robots side and evaluates
rules JVM-side.
"""

import re
from typing import List, Optional, Tuple

# (is_allow, path_pattern) with pattern in robots syntax
Rule = Tuple[bool, str]


def _rule_regex(pattern: str) -> str:
    """Robots path pattern → anchored regex: '*' matches any run,
    '$' (final only) anchors the end; everything else is literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots_txt(text: str, user_agent: str = "*") -> dict:
    """Parse robots.txt for ``user_agent`` → ``{"rules": [(allow,
    pattern), ...], "crawl_delay": float | None}``.

    Group selection follows RFC 9309: collect groups whose agent token
    is ``*`` and groups matching ``user_agent`` (case-insensitive
    substring token match); if any specific group exists, the ``*``
    groups are ignored. Junk lines are skipped — never raises.
    """
    agent = user_agent.lower()
    star_rules: List[Rule] = []
    star_delay: Optional[float] = None
    spec_rules: List[Rule] = []
    spec_delay: Optional[float] = None
    has_specific = False

    cur_agents: List[str] = []
    in_group_body = False  # rules seen since the last User-agent line
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                cur_agents = []
                in_group_body = False
            cur_agents.append(value.lower())
            continue
        if field not in ("allow", "disallow", "crawl-delay"):
            continue
        in_group_body = True
        if not cur_agents:
            continue  # rule before any User-agent line: ignored
        is_star = "*" in cur_agents
        is_spec = any(a != "*" and (a in agent or agent in a)
                      for a in cur_agents)
        if is_spec:
            has_specific = True
        if field == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            if is_spec and spec_delay is None:
                spec_delay = d
            if is_star and star_delay is None:
                star_delay = d
            continue
        if not value and field == "disallow":
            continue  # empty Disallow: allow-all no-op
        if not value.startswith("/") and not value.startswith("*"):
            continue
        rule = (field == "allow", value)
        if is_spec:
            spec_rules.append(rule)
        if is_star:
            star_rules.append(rule)

    if has_specific:
        return {"rules": spec_rules, "crawl_delay": spec_delay}
    return {"rules": star_rules, "crawl_delay": star_delay}


def robots_allows(rules: List[Rule], path: str) -> bool:
    """Longest-match decision for ``path`` (query included, per REP):
    the longest matching pattern wins; Allow beats Disallow at equal
    length; no match = allowed. ``/robots.txt`` itself is always
    allowed by spec."""
    if not path.startswith("/"):
        path = "/" + path
    if path == "/robots.txt":
        return True
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if re.match(_rule_regex(pattern), path):
            # '$'-anchored patterns count the '$' toward specificity,
            # matching Google's implementation
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow
                                   and not best_allow):
                best_len, best_allow = plen, allow
    return best_allow


def robots_rule_table(text: str, user_agent: str = "*") -> List[dict]:
    """Rules as rows for the Spark side: ``[{allow, pattern, regex,
    priority}]`` with ``priority = len(pattern)*2 + allow`` so one JVM
    ``max_by`` reproduces the longest-match/Allow-wins decision."""
    parsed = parse_robots_txt(text, user_agent)
    return [
        {"allow": allow, "pattern": pattern,
         "regex": _rule_regex(pattern),
         "priority": len(pattern) * 2 + int(allow)}
        for allow, pattern in parsed["rules"]
    ]
