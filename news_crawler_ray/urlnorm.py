"""URL canonicalization, predicates and keys.

Pure-Python scalar library applied inside ``map_batches`` kernels. This is
the canonical key layer of the whole engine: the URL-seen set, the frontier
partitioning and the fetch/replay join all key off :func:`canonical_url` /
:func:`url_key`, so these functions must be deterministic and cheap.

Semantics follow the reference (girulea/News-Crawler):
- ``clean_url``                → /root/reference/utils.py:119-149
- ``split_url_and_scheme``     → utils.py:334-340
- ``are_equals_urls``          → utils.py:205-219
- ``is_valid_url_to_navigate`` → utils.py:80-116
- ``is_domain_link``           → utils.py:152-181
- ``get_filetype_from_url``    → utils.py:184-196
- ``get_principal_domain``     → utils.py:38-45
- ``is_news_url``              → /root/reference/newspaperlite/newsurl.py:26-101

``validators.url`` and ``tldextract`` are not available in this environment,
so a minimal public-suffix splitter and URL validator with the same
observable behavior on the fixture URL space are implemented here from
scratch.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import unquote, urlparse

# ---------------------------------------------------------------------------
# Constants (mirrors utils.py:15-22 and newsurl.py:6-23)
# ---------------------------------------------------------------------------

ALLOWED_TYPES_TO_NAVIGATE = frozenset(
    ["html", "htm", "md", "rst", "aspx", "jsp", "rhtml", "cgi", "xhtml",
     "jhtml", "asp", "php", "shtml", "xml"]
)

BAD_TOKENS = (
    "careers", "contact", "about", "faq", "terms", "privacy", "forum",
    "advert", "preferences", "feedback", "info", "browse", "howto", "search",
    "account", "subscribe", "donate", "shop", "admin", "cookies",
    "disclaimer", "coupon", "clickenc", "clickhere", "css", "meteo",
)
_BAD_TOKENS_SET = frozenset(BAD_TOKENS)

# newsurl.py:6-17
NEWS_ALLOWED_TYPES = frozenset(
    ["html", "htm", "md", "rst", "aspx", "jsp", "rhtml", "cgi", "xhtml",
     "jhtml", "asp", "shtml"]
)
GOOD_PATHS = frozenset(
    ["story", "article", "feature", "featured", "slides", "slideshow",
     "gallery", "news", "video", "media", "v", "radio", "press"]
)
BAD_CHUNKS = frozenset(
    ["careers", "contact", "about", "faq", "terms", "privacy", "advert",
     "preferences", "feedback", "info", "browse", "howto", "account",
     "subscribe", "donate", "shop", "admin", "cookies", "disclaimer"]
)
BAD_DOMAINS = frozenset(["amazon", "doubleclick", "twitter", "shop"])

# newsurl.py:21
DATE_REGEX = re.compile(
    r"([\./\-_]{0,1}(19|20)\d{2})[\./\-_]{0,1}"
    r"(([0-3]{0,1}[0-9][\./\-_])|(\w{3,5}[\./\-_]))([0-3]{0,1}[0-9][\./\-]{0,1})?"
)

# Minimal public-suffix table (stand-in for tldextract). Two-level suffixes
# checked before one-level. Sufficient for the synthetic fixture hosts and
# common real TLDs; extend as needed.
_TWO_LEVEL_SUFFIXES = frozenset(
    ["co.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au", "co.jp",
     "com.br", "co.nz", "co.in", "com.mx", "org.uk"]
)
_ONE_LEVEL_SUFFIXES = frozenset(
    ["com", "org", "net", "it", "io", "edu", "gov", "mil", "int", "eu",
     "de", "fr", "es", "uk", "us", "ca", "au", "jp", "br", "nl", "ch",
     "info", "biz", "news", "online", "site", "xyz", "example", "test",
     "local", "dev", "app", "me", "tv", "cc", "co"]
)

_SCHEME_RE = re.compile(r"^https?://")
_WWW_RE = re.compile(r"^(www\d?\.)")
_MAILTO_RE = re.compile(r"^https?://mailto")
_SHARE_QUERY_RE = re.compile(r"^(share=|e?mail=)")
_EQ_PREFIX_RE = re.compile(r"^(https?://(www\.)?)")
_HOST_RE = re.compile(r"^[a-z0-9]([a-z0-9\-_]{0,62}[a-z0-9])?$", re.IGNORECASE)


# ---------------------------------------------------------------------------
# tld splitting (tldextract stand-in)
# ---------------------------------------------------------------------------

def tld_split(url: str) -> tuple[str, str, str]:
    """Return ``(subdomain, domain, suffix)`` for a URL or bare host.

    ``tld_split("http://a.b.news-1.example/x")`` → ``("a.b", "news-1", "example")``.
    Mirrors the tldextract fields the reference consumes
    (utils.py:81-82, newsurl.py:55-57).
    """
    host = urlparse(url).hostname if "//" in url or ":" in url else url
    if not host:
        # tldextract also handles scheme-less strings like "cnn.com/x"
        host = url.split("/")[0] if url else ""
    host = (host or "").lower().rstrip(".")
    if not host:
        return "", "", ""
    labels = host.split(".")
    if len(labels) == 1:
        return "", labels[0], ""
    two = ".".join(labels[-2:])
    if two in _TWO_LEVEL_SUFFIXES and len(labels) >= 3:
        suffix = two
        rest = labels[:-2]
    elif labels[-1] in _ONE_LEVEL_SUFFIXES:
        suffix = labels[-1]
        rest = labels[:-1]
    else:
        # Unknown TLD: treat last label as suffix (tldextract falls back
        # similarly for unlisted suffixes when fetching is disabled).
        suffix = labels[-1]
        rest = labels[:-1]
    domain = rest[-1] if rest else ""
    subdomain = ".".join(rest[:-1])
    return subdomain, domain, suffix


# ---------------------------------------------------------------------------
# Basic getters (utils.py:38-70, 184-196)
# ---------------------------------------------------------------------------

def get_principal_domain(url: str) -> str | None:
    """Host with a leading ``www`` / ``www1`` label stripped (utils.py:38-45)."""
    if not isinstance(url, str):
        url = unquote(str(url))
    host = urlparse(url).hostname
    if host:
        host = _WWW_RE.sub("", host)
    return host


def get_principal_domain_www(url: str) -> str | None:
    """Full hostname including www (utils.py:48-50)."""
    return urlparse(url).hostname


def get_domain(url: str | None) -> str | None:
    """``urlparse(url).netloc`` (utils.py:53-56)."""
    if url is None:
        return None
    return urlparse(url).netloc


def get_scheme(url: str | None) -> str | None:
    if url is None:
        return None
    return urlparse(url).scheme


def get_path(url: str | None) -> str | None:
    if url is None:
        return None
    return urlparse(url).path


def get_filetype_from_url(url: str) -> str | None:
    """Extension of the last path chunk, max 5 chars (utils.py:184-196)."""
    path = urlparse(url).path
    if path.endswith("/"):
        path = path[:-1]
    chunks = [x for x in path.split("/") if x]
    if chunks:
        last = chunks[-1].split(".")
        if len(last) < 2:
            return None
        ftype = last[-1]
        if len(ftype) <= 5:
            return ftype.lower()
    return None


# ---------------------------------------------------------------------------
# Validity predicates
# ---------------------------------------------------------------------------

def is_valid_url(url: str | None) -> bool:
    """Public-URL validity — stand-in for ``validators.url(url, public=True)``
    (utils.py:73-77). http/https scheme, dotted hostname of valid labels,
    non-private."""
    if not url or not isinstance(url, str):
        return False
    if " " in url:
        return False
    if not _SCHEME_RE.match(url):
        return False
    try:
        parsed = urlparse(url)
    except ValueError:
        return False
    host = parsed.hostname
    if not host or "." not in host:
        return False
    if host in ("localhost",) or host.startswith(("127.", "10.", "192.168.")):
        return False
    return all(_HOST_RE.match(label) for label in host.split("."))


def is_valid_url_to_navigate(url: str) -> bool:
    """Navigability gate for discovered links (utils.py:80-116).

    Valid public URL, not mailto, no share/mail query, filetype in the
    16-entry whitelist (or none), no BAD_TOKENS in path tokens or as the
    subdomain.
    """
    sub_domain = tld_split(url)[0]
    result = is_valid_url(url)
    if _MAILTO_RE.match(url):
        return False
    if not result:
        return False
    parsed = urlparse(url)
    query = parsed.query
    if query and _SHARE_QUERY_RE.match(query.lower()):
        return False
    file_type = get_filetype_from_url(url)
    if file_type is not None and file_type not in ALLOWED_TYPES_TO_NAVIGATE:
        return False
    path = parsed.path.lower()
    if path.endswith("/"):
        path = path[:-1]
    tokens = path.split("/")
    if file_type:
        tokens[-1] = tokens[-1].replace("." + file_type, "")
    sub_domain = sub_domain.lower() if sub_domain else sub_domain
    token_set = set(tokens)
    for b in BAD_TOKENS:
        if b in token_set or (sub_domain and b == sub_domain):
            return False
    return True


# ---------------------------------------------------------------------------
# Canonicalization (utils.py:119-149, 334-340, 205-219)
# ---------------------------------------------------------------------------

def clean_url(url: str, remove_arguments: bool = True,
              domain: str | None = None, scheme: str | None = None) -> str:
    """Canonicalize a URL (utils.py:119-149).

    Percent-unquote; optionally strip the query (with domain-aware
    embedded-URL extraction from query params when ``domain`` is given);
    re-add ``scheme`` when the result has none; remove spaces; strip one
    trailing ``/``.
    """
    result = unquote(url)
    if domain or remove_arguments:
        if "?" in result:
            i = result.find("?")
            if domain:
                result1 = result[:i]
                result2 = result[i + 1:]
                if domain in result1 and remove_arguments:
                    result = result1
                elif domain in result2:
                    for r in result2.split("="):
                        if domain in r:
                            result = r
                            if "&" in result:
                                result = result[: result.find("&")]
                            break
            else:
                result = result[:i]
    if scheme:
        if not _SCHEME_RE.match(result):
            result = scheme + "://" + result
    result = result.replace(" ", "")
    if result.endswith("/"):
        result = result[:-1]
    return result


def split_url_and_scheme(url: str) -> tuple[str | None, str]:
    """``(scheme + '://', scheme-stripped cleaned url)`` (utils.py:334-340).

    The second element is the storage key of the ``pages`` table (URLs are
    stored scheme-stripped, protocol in its own column —
    _datacollector_statements.py:10-30).
    """
    cleaned = clean_url(url, False)
    scheme = get_scheme(cleaned)
    if scheme:
        scheme = scheme + "://"
        cleaned = cleaned.replace(scheme, "", 1)
    return scheme, cleaned


def canonical_url(url: str) -> str:
    """Scheme-stripped canonical form — the engine-wide URL key."""
    return split_url_and_scheme(url)[1]


def are_equals_urls(url1: str, url2: str) -> bool:
    """Scheme/www-insensitive URL equality (utils.py:205-219)."""
    u1 = _EQ_PREFIX_RE.sub("", unquote(url1)).replace(" ", "")
    u2 = _EQ_PREFIX_RE.sub("", unquote(url2)).replace(" ", "")
    if u1.endswith("/"):
        u1 = u1[:-1]
    if u2.endswith("/"):
        u2 = u2[:-1]
    return u1 == u2


def is_domain_link(url: str, domain: str) -> bool:
    """Substring-position same-domain test (utils.py:152-181): ``domain``
    must occur before any of ``? ; { =`` in the URL."""
    if domain not in url:
        return False
    i_2 = url.find(domain) + len(domain)
    for sep in ("?", ";", "{", "="):
        if sep in url:
            return i_2 < url.find(sep)
    return True


# ---------------------------------------------------------------------------
# News-URL classifier (newsurl.py:26-101)
# ---------------------------------------------------------------------------

def url_to_filetype(url: str) -> str | None:
    """newsurl.py:103-122 (note: differs from get_filetype_from_url in
    allowing >5-char known types)."""
    path = urlparse(url).path
    if path.endswith("/"):
        path = path[:-1]
    chunks = [x for x in path.split("/") if x]
    if not chunks:
        return None
    last = chunks[-1].split(".")
    if len(last) < 2:
        return None
    ftype = last[-1]
    if len(ftype) <= 5 or ftype.lower() in NEWS_ALLOWED_TYPES:
        return ftype.lower()
    return None


def is_news_url(url: str) -> bool:
    """Path-token news heuristic (newsurl.py:26-101). Sets the
    ``is_webnews`` priority tier of the frontier."""
    path = urlparse(url).path
    if not path.startswith("/"):
        return False
    if path.endswith("/"):
        path = path[:-1]
    path_tokens = [x for x in path.split("/") if x]
    if path_tokens:
        file_type = url_to_filetype(url)
        if file_type and file_type not in NEWS_ALLOWED_TYPES:
            return False
        last_token = path_tokens[-1].split(".")
        if len(last_token) > 1:
            path_tokens[-1] = last_token[-2]
    if "index" in path_tokens:
        path_tokens.remove("index")
    subd, tld, _ = tld_split(url)
    tld = tld.lower()
    url_slug = path_tokens[-1] if path_tokens else ""
    if tld in BAD_DOMAINS:
        return False
    if not path_tokens:
        dash_count = underscore_count = 0
    else:
        dash_count = url_slug.count("-")
        underscore_count = url_slug.count("_")
    if url_slug and (dash_count > 4 or underscore_count > 4):
        if dash_count >= underscore_count:
            if tld not in [x.lower() for x in url_slug.split("-")]:
                return True
        if underscore_count > dash_count:
            if tld not in [x.lower() for x in url_slug.split("_")]:
                return True
    if len(path_tokens) <= 1:
        return False
    for b in BAD_CHUNKS:
        if b in path_tokens or b == subd:
            return False
    if DATE_REGEX.search(url) is not None:
        return True
    lowered = [p.lower() for p in path_tokens]
    for good in GOOD_PATHS:
        if good in lowered:
            return True
    return False


# ---------------------------------------------------------------------------
# Keys & partitioning
# ---------------------------------------------------------------------------

def url_key(url: str) -> bytes:
    """SHA-1 of the canonical URL — the seen-set key. Uniformly spreads the
    10^10-URL key space across shards (SURVEY.md §7.3)."""
    return hashlib.sha1(canonical_url(url).encode("utf-8", "replace")).digest()


def url_shard(url: str, num_shards: int) -> int:
    """Seen-set shard id: first 8 bytes of sha1(canonical) mod shards."""
    return int.from_bytes(url_key(url)[:8], "big") % num_shards


def host_of(url: str) -> str:
    """Canonical host (principal domain) used as the frontier partition key."""
    u = url if _SCHEME_RE.match(url) else "http://" + url
    return get_principal_domain(u) or ""


def host_shard(host: str, num_shards: int, salt: int = 0) -> int:
    """Frontier shard for a host. ``salt`` splits a skewed host's *storage*
    across sub-shards while the politeness budget still serializes dequeues
    (SURVEY.md §7.4 item 4)."""
    h = hashlib.sha1(f"{host}\x00{salt}".encode("utf-8", "replace")).digest()
    return int.from_bytes(h[:8], "big") % num_shards
