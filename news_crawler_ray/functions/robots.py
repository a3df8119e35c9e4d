"""robots.txt parsing → frontier politeness rules.

The north star specifies "a per-host politeness priority queue … with
robots.txt rules cached per actor". The frontier (state/frontier.py)
already enforces disallow PREFIXES and a per-host min fetch interval;
this module supplies the missing front half: parse real robots.txt
TEXT into those two knobs, so a corpus can ship raw robots bodies (a
``robots.parquet`` sidecar of ``host, robots_txt``) instead of
pre-parsed fixture rows.

Scope (documented subset of RFC 9309, chosen to be exactly
representable by the frontier's prefix semantics and to agree with
CPython's ``urllib.robotparser`` on the common case):

- Group selection: the FIRST group whose ``User-agent`` matches the
  caller's agent token exactly (ASCII case-insensitive) wins; else the
  first ``*`` group (stdlib entry-order semantics).
- ``Disallow:`` values become path prefixes; an EMPTY value means
  "allow all" and contributes no prefix. ``Allow:`` carve-outs are NOT
  representable as a prefix list — a group containing a non-empty
  ``Allow`` line is flagged ``has_allow`` so callers can log the
  approximation (the frontier then over-blocks, the safe direction).
- ``Crawl-delay:`` (seconds, int or float) → milliseconds for the
  frontier's ``min_interval_ms``.
- ``#`` comments, blank-line group separation, unknown fields ignored;
  a rule line before any ``User-agent`` is ignored (stdlib behavior).

The reference crawler has no robots handling at all (north_rule
addition; see state/frontier.py:14), so there is no reference parity
to preserve — parity is pinned against ``urllib.robotparser`` instead
(tests/test_robots.py, hypothesis over Disallow-only files).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RobotsRules:
    """Effective rules for one (robots.txt, agent) pair."""
    disallow: tuple[str, ...] = ()
    crawl_delay_ms: int | None = None
    has_allow: bool = False          # non-empty Allow seen: prefix list
    #                                  over-blocks (safe) for this group

    def allows(self, path: str) -> bool:
        """Prefix-semantics decision (mirrors FrontierShard's check)."""
        return not any(path.startswith(p) for p in self.disallow)


@dataclass
class _Group:
    agents: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay_ms: int | None = None
    has_allow: bool = False
    has_rules: bool = False


def _parse_groups(text: str) -> list[_Group]:
    groups: list[_Group] = []
    cur: _Group | None = None
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            # blank line closes a group that already has rules; agent
            # lines straddling blanks before any rule still merge
            # (stdlib tolerates both layouts)
            if cur is not None and cur.has_rules:
                groups.append(cur)
                cur = None
            continue
        if ":" not in line:
            continue
        fld, _, val = line.partition(":")
        fld = fld.strip().lower()
        val = val.strip()
        if fld == "user-agent":
            if cur is not None and cur.has_rules:
                groups.append(cur)      # new agent after rules = new group
                cur = None
            if cur is None:
                cur = _Group()
            cur.agents.append(val.lower())
            continue
        if cur is None or not cur.agents:
            continue                    # rule before any User-agent: drop
        if fld == "disallow":
            cur.has_rules = True
            if val:
                cur.disallow.append(val)
        elif fld == "allow":
            cur.has_rules = True
            if val:
                cur.has_allow = True
        elif fld == "crawl-delay":
            cur.has_rules = True
            try:
                cur.crawl_delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    if cur is not None and (cur.has_rules or cur.agents):
        groups.append(cur)
    return groups


def parse_robots(text: str, agent: str = "*") -> RobotsRules:
    """Parse robots.txt text into the frontier's politeness knobs for
    ``agent``: first exact-agent group, else first ``*`` group, else
    allow-all (the no-robots default)."""
    agent = (agent or "*").lower()
    groups = _parse_groups(text)
    chosen = None
    for g in groups:
        if agent != "*" and agent in g.agents:
            chosen = g
            break
    if chosen is None:
        for g in groups:
            if "*" in g.agents:
                chosen = g
                break
    if chosen is None:
        return RobotsRules()
    return RobotsRules(disallow=tuple(chosen.disallow),
                       crawl_delay_ms=chosen.crawl_delay_ms,
                       has_allow=chosen.has_allow)


def merge_robots_rows(politeness: dict[str, list], hosts: list[str],
                      bodies: list[str], *, agent: str = "*",
                      default_max_in_flight: int = 6,
                      default_max_attempts: int = 2) -> dict[str, list]:
    """Merge parsed robots.txt bodies into a politeness table dict
    (FIXTURES.md §3 columns, pydict-of-lists form, as read by
    CrawlEngine._configure_politeness).

    Semantics: robots prefixes UNION with any fixture-supplied
    ``robots_disallow`` for the same host (both sources are authority —
    the fixture encodes operator policy, robots encodes site policy);
    ``Crawl-delay`` RAISES ``min_interval_ms`` (never lowers an
    operator-set floor). Hosts present only in robots.txt get a new row
    with reference-default budgets. Pure function — unit-testable
    without Ray; the engine applies the result through the same
    ``configure_hosts`` path as the fixture table."""
    out = {k: list(v) for k, v in politeness.items()} if politeness else {
        "host": [], "max_in_flight": [], "min_interval_ms": [],
        "robots_disallow": [], "max_attempts": []}
    for col, dflt in (("max_in_flight", default_max_in_flight),
                      ("min_interval_ms", 0),
                      ("robots_disallow", None),
                      ("max_attempts", default_max_attempts)):
        if col not in out:
            out[col] = [dflt if col != "robots_disallow" else []
                        for _ in out["host"]]
    idx = {h: i for i, h in enumerate(out["host"])}
    for host, body in zip(hosts, bodies):
        rules = parse_robots(body, agent)
        if host in idx:
            i = idx[host]
            existing = list(out["robots_disallow"][i] or [])
            merged = existing + [p for p in rules.disallow
                                 if p not in existing]
            out["robots_disallow"][i] = merged
            if rules.crawl_delay_ms is not None:
                out["min_interval_ms"][i] = max(
                    int(out["min_interval_ms"][i] or 0),
                    rules.crawl_delay_ms)
        else:
            idx[host] = len(out["host"])
            out["host"].append(host)
            out["max_in_flight"].append(default_max_in_flight)
            out["min_interval_ms"].append(rules.crawl_delay_ms or 0)
            out["robots_disallow"].append(list(rules.disallow))
            out["max_attempts"].append(default_max_attempts)
            # keep any EXTRA fixture columns aligned (configure_hosts
            # skips None values)
            known = {"host", "max_in_flight", "min_interval_ms",
                     "robots_disallow", "max_attempts"}
            for col in out:
                if col not in known:
                    out[col].append(None)
    return out


def sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` references from a robots.txt body (RFC 9309 §2.3 /
    sitemaps.org: the field is FILE-GLOBAL — valid anywhere, outside
    group semantics — and case-insensitive). Returns absolute sitemap
    urls in file order, first-occurrence deduped. Unlike Disallow
    values, sitemap values are full URLs, so no prefix handling."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        field, colon, value = line.partition(":")
        if not colon or field.strip().lower() != "sitemap":
            continue
        v = value.strip()
        if v and v not in seen:
            seen.add(v)
            out.append(v)
    return out
