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
- ``*`` wildcard
- ``$options``: ``domain=a.com|~b.com`` and ``third-party`` /
  ``~third-party`` are evaluated against the options dict passed to
  ``should_block(url, options)``; a rule whose options are NOT supplied
  in the call is skipped for that call, and rules with unsupported
  option keywords are skipped entirely — both adblockparser semantics
  (skip_unsupported_rules). NOTE the reference's own call site passes NO
  options (ads_extractor.py:16-19 builds an options dict and then never
  uses it), so its effective behavior — option rules never fire — is
  exactly what ``should_block(url)`` reproduces here.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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

_SUPPORTED_OPTIONS = ("domain", "third-party")


def _parse_options(opt_str: str) -> dict | None:
    """``$domain=a|~b,third-party`` → options dict; None when the rule
    uses an option keyword this matcher doesn't implement (the rule is
    then skipped, adblockparser's skip_unsupported_rules)."""
    opts: dict = {}
    for part in opt_str.split(","):
        part = part.strip()
        if not part:
            continue
        if part.startswith("domain="):
            doms = []
            for d in part[len("domain="):].split("|"):
                d = d.strip().lower()
                if d:
                    doms.append((d[1:], True) if d.startswith("~")
                                else (d, False))
            opts["domain"] = doms
        elif part == "third-party":
            opts["third-party"] = True
        elif part == "~third-party":
            opts["third-party"] = False
        else:
            return None   # unsupported option keyword → skip rule
    return opts


def _domain_applies(rule_domains: list, req_domain: str) -> bool:
    """ABP domain-list semantics: the request domain must fall under a
    positive entry (or the list must be negations-only) and under no
    negated entry."""
    req = (req_domain or "").lower()

    def under(d):
        return req == d or req.endswith("." + d)

    positives = [d for d, neg in rule_domains if not neg]
    if any(under(d) for d, neg in rule_domains if neg):
        return False
    if positives:
        return any(under(d) for d in positives)
    return True


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
        self._block_opt: list[tuple] = []   # (compiled_rx, options)
        self._allow_opt: list[tuple] = []
        for r in rules:
            is_exc = r.startswith("@@")
            body = r[2:] if is_exc else r
            opts: dict = {}
            if "$" in body and not body.strip().startswith("!"):
                body, opt_str = body.split("$", 1)
                parsed = _parse_options(opt_str)
                if parsed is None:
                    continue   # unsupported option → rule skipped whole
                opts = parsed
            rx = _rule_to_regex(body)
            if not rx:
                continue
            if opts:
                (self._allow_opt if is_exc else self._block_opt).append(
                    (re.compile(rx), opts))
            else:
                (allow if is_exc else block).append(rx)
        self._block = re.compile("|".join(block)) if block else None
        self._allow = re.compile("|".join(allow)) if allow else None

    @staticmethod
    def _opt_rule_applies(rule_opts: dict, options: dict | None) -> bool:
        """A rule with options applies only when the call supplies every
        option the rule needs (adblockparser: calling without an option
        skips the rules that require it) and the values match."""
        if options is None:
            return False
        for k, v in rule_opts.items():
            if k not in options:
                return False
            if k == "domain":
                if not _domain_applies(v, options["domain"]):
                    return False
            elif k == "third-party":
                if bool(options["third-party"]) != v:
                    return False
        return True

    def _opt_match(self, pairs: list, url: str, options: dict | None) -> bool:
        return any(rx.search(url) and self._opt_rule_applies(o, options)
                   for rx, o in pairs)

    def should_block(self, url: str, options: dict | None = None) -> bool:
        """AdblockRules.should_block-compatible. ``options`` may carry
        ``domain`` (the page's domain) and ``third-party`` (bool)."""
        if not url:
            return False
        blocked = bool(self._block is not None and self._block.search(url)) \
            or self._opt_match(self._block_opt, url, options)
        if not blocked:
            return False
        if self._allow is not None and self._allow.search(url):
            return False
        if self._opt_match(self._allow_opt, url, options):
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

    # UNIQUE dedup via salted buckets: in-batch dedup first (most
    # repeats are within a page's HAR), then one groupby(bucket) with a
    # vectorized drop_duplicates per bucket — NOT one map_groups group
    # per distinct har_url (~1 ms of Python each at 10^6+ urls)
    def bucket_dedup(t: pa.Table) -> pa.Table:
        from ..rayutil import salt_bucket
        u = pc.unique(t["har_url"])
        return pa.table({"har_url": u,
                         "bucket": pa.array(salt_bucket(u))})

    def drop_dup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("har_url")[["har_url"]]

    distinct = assoc.map_batches(bucket_dedup, batch_format="pyarrow") \
        .groupby("bucket").map_groups(drop_dup, batch_format="pandas")
    classified = distinct.map_batches(
        AdClassifier, fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow", concurrency=concurrency,
        num_cpus=0.5)   # light stage; leave CPUs for the task operators
    return classified, assoc
