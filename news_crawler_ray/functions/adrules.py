"""Adblock-style ad classification for HAR request URLs.

Rebuilds the reference's AdsExtractor (extraction_tools/ads_extractor.py:
6-32: AdblockRules over easylistitaly.txt, compiled once at import and
shared) as a from-scratch matcher for the core Adblock Plus filter
syntax, compiled ONCE per actor (``__init__``) — the classic stateful
scorer stage (SURVEY.md §2.3 ST2). ``adblockparser`` and the EasyList
file are unavailable here, so the rule language subset is implemented
directly and a compact built-in generic ruleset is included:

- ``!`` comments and ``##``/``#@#`` element-hiding rules are ignored
- ``@@`` exception rules override block rules
- ``||host`` anchors at a domain boundary
- ``|`` anchors start/end
- ``^`` matches a separator (non-alphanumeric, non ``-._%``) or end
- ``*`` wildcard; ``$options`` suffixes are stripped (option matching —
  domain/third-party — is out of scope and documented)
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# Compact generic blocklist in the spirit of public EasyList generic
# patterns (written fresh; NOT copied from a filter list file).
DEFAULT_AD_RULES = [
    "||doubleclick.net^",
    "||googlesyndication.com^",
    "||googleadservices.com^",
    "||adservice.google.",
    "||ads.tracker.example^",
    "/ads/*",
    "/adserver/",
    "/adsbygoogle",
    "/banners/",
    "/advert.",
    "/advertising/",
    "_ads_",
    "?ad_type=",
    "&adurl=",
    "||outbrain.com^",
    "||taboola.com^",
    "!this is a comment and must be ignored",
    "@@||ads.example.org/allowed/*",
]

_SEP = r"[^A-Za-z0-9\-._%]"


def _rule_to_regex(rule: str) -> str | None:
    rule = rule.strip()
    if not rule or rule.startswith("!") or "##" in rule or "#@#" in rule:
        return None
    if "$" in rule:
        rule = rule.split("$", 1)[0]
        if not rule:
            return None
    if rule.startswith("||"):
        body, prefix = rule[2:], r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*\.)?"
    elif rule.startswith("|"):
        body, prefix = rule[1:], "^"
    else:
        body, prefix = rule, ""
    end = ""
    if body.endswith("|"):
        body = body[:-1]
        end = "$"
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch == "^":
            out.append(f"(?:{_SEP}|$)")
        else:
            out.append(re.escape(ch))
    return prefix + "".join(out) + end


class AdRuleSet:
    """Compiled rule set; ``should_block(url)`` like
    AdblockRules.should_block."""

    def __init__(self, rules: list[str] | None = None):
        rules = DEFAULT_AD_RULES if rules is None else rules
        block, allow = [], []
        for r in rules:
            target = allow if r.startswith("@@") else block
            rx = _rule_to_regex(r[2:] if r.startswith("@@") else r)
            if rx:
                target.append(rx)
        self._block = re.compile("|".join(block)) if block else None
        self._allow = re.compile("|".join(allow)) if allow else None

    def should_block(self, url: str) -> bool:
        if not url or self._block is None:
            return False
        if not self._block.search(url):
            return False
        if self._allow is not None and self._allow.search(url):
            return False
        return True


class AdClassifier:
    """Actor-pool stage over a har-URL Dataset: rules compiled once per
    actor; per batch marks ``is_advertising`` (datacollector.py:253-274
    classified har urls in batches of 100 on a background thread — here
    the batch IS the unit)."""

    def __init__(self, rules: list[str] | None = None,
                 url_col: str = "har_url"):
        self.rules = AdRuleSet(rules)
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = [self.rules.should_block(u)
                 for u in batch[self.url_col].to_pylist()]
        return batch.append_column("is_advertising",
                                   pa.array(flags, pa.bool_()))


def har_tables(pages_ds, rules: list[str] | None = None,
               concurrency: int = 2):
    """From a crawled pages Dataset (har: list<string>) build the two
    reference har tables (J2, _datacollector_statements.py:62-77):

    - ``har_urls``: distinct request url + is_advertising (UNIQUE dedup =
      groupby first; classification actor pool)
    - ``page_har``: the M:N association (page_url, har_url)
    Returns (har_urls_ds, page_har_ds)."""

    def explode(batch: pa.Table) -> pa.Table:
        pages, urls = [], []
        for purl, har in zip(batch["url"].to_pylist(),
                             batch["har"].to_pylist()):
            for h in har or []:
                pages.append(purl)
                urls.append(h)
        return pa.table({"page_url": pa.array(pages, pa.string()),
                         "har_url": pa.array(urls, pa.string())})

    assoc = pages_ds.select_columns(["url", "har"]).map_batches(
        explode, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"har_url": [g["har_url"].iloc[0]]})

    distinct = assoc.groupby("har_url").map_groups(first,
                                                   batch_format="pandas")
    classified = distinct.map_batches(
        AdClassifier, fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow", concurrency=concurrency,
        num_cpus=0.5)   # light stage; leave CPUs for the task operators
    return classified, assoc
