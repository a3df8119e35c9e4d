"""The article-extraction kernel: HTML → (text, title, authors, date, …, links).

From-scratch reimplementation of the reference extraction chain with the
same OBSERVABLE semantics, run per-batch inside an actor-pool
``map_batches`` stage (stages/extract_stage.py). Reference chain:

  crawler.py:129-143 → ContentExtractor.prepare_html_tree/extract_content
  (extraction_tools/extractor.py:49-107) → Article.parse
  (newspaperlite/article.py:115-171) → calculate_best_node
  (newspaperlite/extractors.py:721-846) → OutputFormatter.get_formatted
  (newspaperlite/outputformatters.py:37-71).

Conformance notes (dead paths replicated as no-ops, SURVEY.md §7.4):

- ``TreeExplorer.remove`` with default ``remove_tail=False`` is a no-op
  (explorer.py:218-234) — so in the reference the removals of forms /
  input / select / hr (extractor.py:305-322), noise-regex nodes
  (extractor.py:343-363), nav-hunter candidate blocks
  (extractor.py:208-216), empty tags and the trailing media div
  (outputformatters.py:131-172), post-cleanup high-link-density children
  (extractors.py:1071-1081) and ``<li>`` children (outputformatters.py:
  96-101) never mutate the DOM. Only scripts/noscript/styles are really
  removed (extractor.py:160-174, remove_tail=True).
- ``calculate_best_node`` returns a **deepcopy**, which is detached, so
  sibling adoption (extractors.py:877-895) walks no siblings and
  ``post_cleanup`` is effectively the identity.
- The meta-tag date fallback passes swapped arguments
  (extractors.py:224: ``get_date_from_string_by_language(self.language,
  txt)`` vs the (txt, language) signature, utils.py:277) and therefore
  always yields None — replicated by skipping it.
- DOM instrumentation ids use a deterministic per-document counter
  instead of ``random.randint`` (utils.py:31-35; ids never appear in
  output text — FIXTURES.md §6).

``apply_nav_pruning=True`` switches on the *intended* behavior of the
reference's NavigationContentHunter (actually removing flagged blocks) —
the enhanced mode for real-corpus quality; default False for parity.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime
from html import unescape

from dateutil.parser import parse as _dateutil_parse

from .. import urlnorm
from ..htmldom import (Node, get_text, get_text_with_count,
                       get_text_without_child, nearest_parent_by_tag,
                       node_depth, parse_html, strip_tags, subtree_width)
from .textstats import StopWords, detect_language

# utils.py:15-16
LIST_OF_IMPORTANT_TAG = [
    "div", "table", "tr", "td", "ul", "article", "tbody", "section", "nav",
    "footer", "iframe", "header", "body", "html", "head",
]
# extractor.py:26
TAG_TEXT_FORMATTING = ["b", "strong", "i", "em", "mark", "small", "del",
                       "ins", "sub", "sup"]

# newsurl.py:19-23 (STRICT_DATE_REGEX needs python re lookbehind)
DATE_REGEX = (r"([\./\-_]{0,1}(19|20)\d{2})[\./\-_]{0,1}"
              r"(([0-3]{0,1}[0-9][\./\-_])|(\w{3,5}[\./\-_]))"
              r"([0-3]{0,1}[0-9][\./\-]{0,1})?")
STRICT_DATE_RE = re.compile(r"(?<=\W)" + DATE_REGEX)

# extractors.py:194-208
PUBLISH_DATE_TAGS = [
    ("property", "rnews:datePublished", "content"),
    ("property", "article:published_time", "content"),
    ("name", "OriginalPublicationDate", "content"),
    ("itemprop", "datePublished", "datetime"),
    ("itemprop", "datePublished", "content"),
    ("property", "og:published_time", "content"),
    ("name", "article_date_original", "content"),
    ("name", "publication_date", "content"),
    ("name", "sailthru.date", "content"),
    ("name", "PublishDate", "content"),
    ("pubdate", "pubdate", "datetime"),
    ("itemprop", "dateModified", "content"),
    ("itemprop", "dateModified", "datetime"),
]

# videos/extractors.py:5-6 provider whitelist
VIDEO_PROVIDERS = ("youtube", "vimeo", "dailymotion", "kewego", "facebook")

# HAR capture filters (custom_webbrowser.py:171-196). In replay mode the
# "network requests" are derived statically from DOM resource references
# (script/img/iframe/embed/source/audio/video src + link href) — the
# reference reads CDP Network.responseReceived events; same filters.
HAR_SOCIAL_DOMAINS = ("facebook.com", "facebook.it", "youtube.it",
                      "youtube.com", "twitter.it", "twitter.com")
HAR_FILETYPES_REMOVED = frozenset(["jpg", "png", "jpeg"])
_HAR_SRC_TAGS = frozenset(["script", "img", "iframe", "embed", "source",
                           "audio", "video"])

# navigationcontenthunter.py:21
MICRODATA_REMOVE_ITEMTYPES = frozenset([
    "http://schema.org/SiteNavigationElement",
    "http://schema.org/WPFooter",
    "http://schema.org/WPSideBar",
    "http://schema.org/WPHeader",
])

_TITLE_FILTER_RE = re.compile(r"[^一-龥a-zA-Z0-9\ ]")
_AUTHOR_DIGITS_RE = re.compile(r"\d")
_AUTHOR_TAG_RE = re.compile(r"<[^<]+?>")
_AUTHOR_BY_RE = re.compile(r"[bB][yY][\:\s]|[fF]rom[\:\s]")
_AUTHOR_SPLIT_RE = re.compile(r"[^\w\'\-\.]")
_HREF_REL_RE = re.compile(r"^/")
_SCHEME_ANY_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


def parse_date_str(date_str: str | None) -> datetime | None:
    """utils.py:295-304."""
    if not date_str:
        return None
    try:
        return _dateutil_parse(date_str)
    except (ValueError, OverflowError, AttributeError, TypeError):
        return None


def is_valid_body(title: str | None, text: str | None,
                  meta_type_is_article: bool) -> bool:
    """M27 optional article-validity filter (newspaperlite/article.py:
    194-220). NOT part of the crawl path in the reference (only reachable
    via dead Source.py) — exposed as an opt-in corpus-quality filter:
    og:type==article AND words>300, else title ≥ 2 words AND words ≥ 300
    AND sentences ≥ 7."""
    words = (text or "").split()
    if meta_type_is_article and len(words) > 300:
        return True
    sentences = [s for s in re.split(r"[.!?]", text or "") if s.strip()]
    return (len((title or "").split()) >= 2 and len(words) >= 300
            and len(sentences) >= 7)


@dataclass
class PageExtract:
    """Columnar-friendly extraction result (reference PageContentContainer
    + ArticleContainer, pagecontentcontainer.py:2-18,
    articlecontainer.py:2-14)."""

    url: str
    language: str | None = None
    is_news_page: bool = False
    title: str | None = None
    authors: list[str] = field(default_factory=list)
    publish_date: datetime | None = None
    top_image: str | None = None
    videos: list[str] = field(default_factory=list)
    sections: list[str] = field(default_factory=list)
    text: str | None = None
    links: list[str] = field(default_factory=list)
    outbound_links: list[str] = field(default_factory=list)
    har: list[str] = field(default_factory=list)
    # S8 feed auto-discovery (extractor.py:136-158 via rss_finder.py:12-39)
    feed_urls: list[str] = field(default_factory=list)
    nav_blocks_flagged: int = 0
    # M20 meta extractors (transient in the reference — never persisted
    # to the pages row; exposed on the kernel API)
    meta_description: str | None = None
    meta_keywords: str | None = None
    meta_favicon: str | None = None
    canonical_link: str | None = None
    meta_data: dict = field(default_factory=dict)


class ExtractKernel:
    """Stateful extraction kernel — construct once per actor
    (stopword tables + compiled regexes = ST3, SURVEY.md §2.3)."""

    def __init__(self, default_language: str = "it",
                 apply_nav_pruning: bool = False):
        self.default_language = default_language
        self.apply_nav_pruning = apply_nav_pruning
        self._stopwords_cache: dict[str, StopWords] = {}
        # per-actor memo for hot pure URL predicates (nav links repeat on
        # every page of a host); bounded, reset when full
        self._nav_memo: dict[str, bool] = {}
        self._news_memo: dict[str, bool] = {}
        # extractor.py:338-352 noise regex (compiled once; used only when
        # apply_nav_pruning=True — no-op in the reference, see module doc)
        self._noise_re = re.compile(
            "side|combx|retweet|mediaarticlerelated|menucontainer|"
            "utility-bar|inline-share-tools|nav"
            "|tags|socialnetworking|pagetools|post-attributes"
            "|welcome_form|contentTools2|the_answers"
            "|communitypromo|runaroundLeft|subscribe|vcard|articleheadings"
            "|popup|author-dropdown|tools|socialtools|menu", re.I)

    def _stops(self, language: str | None) -> StopWords:
        lang = (language or self.default_language or "en")[:2].lower()
        if lang not in self._stopwords_cache:
            self._stopwords_cache[lang] = StopWords(lang)
        return self._stopwords_cache[lang]

    # ------------------------------------------------------------------
    # public entry
    # ------------------------------------------------------------------
    def _prep_tree(self, url: str, html: str):
        """Shared entry normalization + parse (extractor.py:50-56,
        242-243): strip trailing slash and the filetype suffix, M7
        whitespace collapse, parse with comments removed (M8). Factored
        so :meth:`extract_links` reaches M13 through the IDENTICAL
        pre-state as :meth:`extract` (same collapse, same parse, same
        body pick) without paying the article parse."""
        if url.endswith("/"):
            url = url[:-1]
        ftype = urlnorm.get_filetype_from_url(url)
        if ftype:
            url = url[: -(len(ftype) + 1)]
        domain = urlnorm.host_of(url)
        scheme = urlnorm.get_scheme(url) or "http"
        html = " ".join(html.split())
        tree = parse_html(html)
        body = tree.find_first("body") or tree
        return url, domain, scheme, tree, body

    def extract_links(self, url: str, html: str) -> list[str]:
        """M13 outbound links ONLY — the link-graph corpus pass.
        Byte-identical to ``extract(...).outbound_links`` (same prep,
        same relative-url fixup — the only tree mutation that precedes
        M13 in :meth:`extract`; language/news-meta/domain-link reads
        in between are side-effect-free) while skipping the article
        parse, which dominates full-extract cost on news pages."""
        url, _domain, scheme, _tree, body = self._prep_tree(url, html)
        self._fix_relative_urls(
            body, scheme, urlnorm.get_principal_domain_www(url))
        return self._outbound_links(body, url)

    def extract(self, url: str, html: str, lang_hint: str | None = None,
                is_webnews: bool = False) -> PageExtract:
        """Full page extraction (prepare_html_tree + extract_content,
        extractor.py:49-96)."""
        url, domain, scheme, tree, body = self._prep_tree(url, html)

        result = PageExtract(url=url)
        result.language = self._content_language(tree) or lang_hint
        result.is_news_page = self._is_news_meta(tree)

        self._fix_relative_urls(body, scheme, urlnorm.get_principal_domain_www(url))
        result.links = self._domain_links(body, domain, scheme)
        # M13 outbound links (extractor.py:284-295): computed like the
        # reference but never persisted (extract_content discards them —
        # extractor.py:85; observable behavior = not in the pages row)
        result.outbound_links = self._outbound_links(body, url)
        result.har = self._collect_har(tree, urlnorm.get_domain(
            f"{scheme}://{url}" if "://" not in url else url))
        result.feed_urls = self._discover_feeds(
            tree, url, scheme, urlnorm.get_principal_domain_www(url))

        if result.language and len(result.language) >= 2:
            result.language = result.language[:2].lower()

        if is_webnews or result.is_news_page or urlnorm.is_news_url(url):
            self._parse_article(tree, body, url, domain, scheme, result)
        return result

    # ------------------------------------------------------------------
    # prepare-stage helpers
    # ------------------------------------------------------------------
    def _content_language(self, tree: Node) -> str | None:
        """extractor.py:381-395 region: html@lang, else meta
        http-equiv=content-language / name=language."""
        lang = tree.get("lang")
        if lang:
            return lang
        for meta in tree.iter("meta"):
            if (meta.get("http-equiv", "").lower() == "content-language"
                    or meta.get("name", "").lower() == "language"):
                content = meta.get("content")
                if content:
                    return content
        return None

    def _is_news_meta(self, tree: Node) -> bool:
        """M10 (extractor.py:388-395): schema.org (News)Article itemtype or
        og:type=article."""
        for n in tree.iter():
            itemtype = n.get("itemtype", "")
            if itemtype in ("http://schema.org/NewsArticle",
                            "http://schema.org/Article",
                            "https://schema.org/NewsArticle",
                            "https://schema.org/Article"):
                return True
        for meta in tree.iter("meta"):
            if meta.get("property") == "og:type" and \
                    (meta.get("content") or "").strip() == "article":
                return True
        return False

    def _fix_relative_urls(self, body: Node, scheme: str, host: str | None):
        """M11 (extractor.py:251-262): rewrite href starting '//' or '/'."""
        base = f"{scheme}://{host}" if host else ""
        for n in body.iter():
            href = n.get("href")
            if href and _HREF_REL_RE.match(href):
                if href.startswith("//"):
                    n.set("href", f"{scheme}:{href}")
                elif base:
                    n.set("href", base + href)

    def _domain_links(self, body: Node, domain: str, scheme: str) -> list[str]:
        """M12 (extractor.py:264-282): anchors whose href contains the
        domain → clean (keep args, domain-aware) → navigability filter →
        domain-position check → order-preserving dedup."""
        seen: dict[str, None] = {}
        for a in body.iter("a"):
            href = a.get("href")
            if not href or domain not in href:
                continue
            href = urlnorm.clean_url(href, remove_arguments=False,
                                     domain=domain, scheme=scheme)
            if self._nav_ok(href) and urlnorm.is_domain_link(href, domain):
                if href not in seen:
                    seen[href] = None
        return list(seen.keys())

    def _nav_ok(self, url: str) -> bool:
        v = self._nav_memo.get(url)
        if v is None:
            if len(self._nav_memo) > 100_000:
                self._nav_memo.clear()
            v = self._nav_memo[url] = urlnorm.is_valid_url_to_navigate(url)
        return v

    def _discover_feeds(self, tree: Node, url: str, scheme: str,
                        host_www: str | None) -> list[str]:
        """S8 feed auto-discovery — the ``extract_feed_rss`` cascade
        (extractor.py:136-158), run per extracted page so feeds advertised
        anywhere on the site reach the S8 parse path (the reference's
        RssFinder, rss_finder.py:12-39, runs the same cascade on the
        domain root it browses).

        Three tiers, each only when the previous found nothing:
          1. ``<link rel="alternate" type="application/rss+xml|
             application/atom+xml">`` hrefs (extractor.py:137-140)
          2. anchors whose href contains ``.xml`` AND whose url filetype
             is exactly ``xml`` (extractor.py:141-147)
          3. anchors whose href contains ``rss`` or ``feed``: invalid
             URLs are retried as ``{page_url}/{href}``; valid ones kept
             unless equal to the page's own url (extractor.py:148-157)

        Relative-href note: the reference absolutizes ``/``-rooted hrefs
        across the WHOLE document before discovery (its ``//*`` xpath at
        extractor.py:252 is document-absolute despite the body context
        node), while this kernel's ``_fix_relative_urls`` walks the body
        only — so head ``<link>`` hrefs are absolutized here inline,
        same observable result. Order-preserving dict dedup like the
        reference's dict keys."""
        base = f"{scheme}://{host_www}" if host_www else ""
        feeds: dict[str, None] = {}

        def absolutize(href: str) -> str:
            if href.startswith("//"):
                return f"{scheme}:{href}"
            if href.startswith("/") and base:
                return base + href
            return href

        for n in tree.iter("link"):
            if (n.get("rel") == "alternate"
                    and n.get("type") in ("application/rss+xml",
                                          "application/atom+xml")):
                href = n.get("href")
                if href:
                    feeds.setdefault(absolutize(href))
        if not feeds:
            for a in tree.iter("a"):
                href = a.get("href")
                if (href and ".xml" in href
                        and urlnorm.get_filetype_from_url(href) == "xml"):
                    feeds.setdefault(href)
        if not feeds:
            for a in tree.iter("a"):
                href = a.get("href")
                if not href or ("rss" not in href and "feed" not in href):
                    continue
                if not urlnorm.is_valid_url(href):
                    candidate = f"{url}/{href}"
                    if urlnorm.is_valid_url(candidate):
                        feeds.setdefault(candidate)
                elif not urlnorm.are_equals_urls(href, url):
                    feeds.setdefault(href)
        return list(feeds)

    def _outbound_links(self, body: Node, url: str) -> list[str]:
        """M13 (extractor.py:284-295): hrefs NOT containing the principal
        domain → validity filter → clean_url (args stripped) → ordered
        dedup."""
        principal = urlnorm.get_principal_domain(
            url if "://" in url else "http://" + url) or ""
        seen: dict[str, None] = {}
        for n in body.iter():
            href = n.get("href")
            if not href or (principal and principal in href):
                continue
            if urlnorm.is_valid_url(href):
                cleaned = urlnorm.clean_url(href)
                if cleaned not in seen:
                    seen[cleaned] = None
        return list(seen)

    def _collect_har(self, tree: Node, domain: str | None) -> list[str]:
        """S4 HAR capture (custom_webbrowser.py:171-196): third-party
        request URLs — valid, off-domain, filetype not jpg/png/jpeg, not
        on the social-domain blocklist; deduped (reference uses
        ``list(set(...))``; here first-occurrence order, the persisted
        table is UNIQUE-keyed either way)."""
        seen: dict[str, None] = {}
        for n in tree.iter():
            src = n.get("src") if n.tag in _HAR_SRC_TAGS else None
            if src is None and n.tag == "link":
                src = n.get("href")
            if not src or not urlnorm.is_valid_url(src):
                continue
            if domain and urlnorm.is_domain_link(src, domain):
                continue
            if urlnorm.get_filetype_from_url(src) in HAR_FILETYPES_REMOVED:
                continue
            if any(urlnorm.is_domain_link(src, d) for d in HAR_SOCIAL_DOMAINS):
                continue
            seen.setdefault(src)
        return list(seen)

    # ------------------------------------------------------------------
    # article path
    # ------------------------------------------------------------------
    def _parse_article(self, tree: Node, body: Node, url: str, domain: str,
                       scheme: str, result: PageExtract) -> None:
        # _last_clean (extractor.py:92-107): format-tag strip is real …
        strip_tags(body, *TAG_TEXT_FORMATTING)
        # … forms/input/select/hr removal is a reference no-op (see module
        # docstring); scripts/noscript/styles removal is real:
        for n in list(tree.iterdescendants()):
            if n.tag in ("script", "noscript", "style"):
                n.drop_tree_keep_tail()
        self._assign_ids(body)
        # Nav-hunter candidates are computed (metrics / enhanced mode) but
        # removal is a no-op in reference mode (extractor.py:208-216 +
        # explorer.py:218-234).
        flagged = self._nav_hunter_candidates(body.copy())
        result.nav_blocks_flagged = len(flagged)
        if self.apply_nav_pruning and flagged:
            flagged_set = set(flagged)
            for n in list(body.iterdescendants()):
                if n.tag in LIST_OF_IMPORTANT_TAG and \
                        n.get("id") in flagged_set and n.parent is not None \
                        and self._can_be_deleted(n):
                    n.drop_tree_keep_tail()

        # Article.parse (article.py:115-171). The reference deepcopies the
        # tree for title/authors/date because its lxml extractors mutate;
        # this kernel's meta extractors are read-only and run before
        # gravity scoring touches the live tree, so the copy is skipped
        # (observable output identical — golden tests pin it).
        clean_tree = tree
        result.title = self._get_title(clean_tree)
        result.authors = self._get_authors(clean_tree)
        if result.title and result.language is None:
            result.language = detect_language(result.title)
        stops = self._stops(result.language)
        result.publish_date = self._get_publish_date(url, clean_tree, stops)
        result.sections = self._get_sections(clean_tree)
        # M20 meta extractors (extractors.py:385-555)
        result.meta_description = self._meta_content(clean_tree, "name",
                                                     "description")
        result.meta_keywords = self._meta_content(clean_tree, "name",
                                                  "keywords")
        result.meta_favicon = self._get_favicon(clean_tree)
        result.canonical_link = self._get_canonical(clean_tree, url, scheme)
        result.meta_data = self._get_meta_data(clean_tree)

        top_node = self._calculate_best_node(tree, stops)
        if top_node is not None:
            result.videos = self._get_videos(top_node, domain)
            # post_cleanup (extractors.py:1071-1081) is identity on a
            # detached deepcopy — replicated by doing nothing.
            result.text = self._format_output(top_node)
        result.top_image = self._get_top_image(clean_tree, top_node)

    # -- deterministic id instrumentation (vs utils.py:31-35 randint) ----
    def _assign_ids(self, body: Node) -> None:
        counter = 0
        seen_ids: set[str] = set()
        for n in body.iter():
            if n.tag in LIST_OF_IMPORTANT_TAG:
                nid = n.get("id")
                if not nid or nid in seen_ids:
                    counter += 1
                    nid = f"tmp_id{counter:05d}"
                    n.set("id", nid)
                seen_ids.add(nid)

    # -- NavigationContentHunter (navigationcontenthunter.py:23-101) -----
    def _nav_hunter_candidates(self, body: Node) -> list[str]:
        blocks: list[str] = []

        def realign(root: Node) -> None:
            # navigationcontenthunter.py:113-119: re-parent nodes whose
            # parent is not an important tag to the nearest important
            # ancestor.
            for element in list(root.iter()):
                parent = element.parent
                if parent is not None and parent is not root and \
                        parent.tag not in LIST_OF_IMPORTANT_TAG:
                    new_parent = nearest_parent_by_tag(element, LIST_OF_IMPORTANT_TAG)
                    if new_parent is not None and element.parent is not None:
                        element.parent.remove(element)
                        new_parent.append(element)

        def pruning(subtree: Node):
            # navigationcontenthunter.py:40-91 — width-weighted post-order
            # anchor/tag density scoring.
            tag_count = anchor_count = 0.0
            tag_text_len = anchor_text_len = 0.0
            word_count = anchor_word_count = 0.0
            width = subtree_width(subtree) + 1
            for child in subtree.children:
                if child.tag in LIST_OF_IMPORTANT_TAG:
                    tmp = pruning(child)
                    if tmp:
                        influence = tmp[-1] / width
                        tag_count += tmp[0] * influence
                        anchor_count += tmp[1] * influence
                        tag_text_len += tmp[2] * influence
                        anchor_text_len += tmp[3] * influence
                        word_count += tmp[4] * influence
                        anchor_word_count += tmp[5] * influence
            if width > 30:
                return None
            for child in subtree.children:
                if child.tag not in LIST_OF_IMPORTANT_TAG:
                    text_tmp, tags_tmp = get_text_with_count(
                        child, tags_to_ignore=LIST_OF_IMPORTANT_TAG, clean=False)
                    links = [n for n in child.iter("a")]
                    a_text, a_cnt = "", 0
                    for link in links:
                        t, c = get_text_with_count(
                            link, tags_to_ignore=LIST_OF_IMPORTANT_TAG, clean=False)
                        a_text += t
                        a_cnt += c
                    tag_count += tags_tmp
                    tag_text_len += len(text_tmp)
                    anchor_count += a_cnt
                    anchor_text_len += len(a_text)
                    word_count += len([w for w in text_tmp.split() if len(w) > 1])
                    anchor_word_count += len(a_text.split())
            text_ratio = anchor_text_len / tag_text_len if tag_text_len > 0 else 0
            tag_ratio = anchor_count / tag_count if tag_count > 0 else 0
            word_ratio = anchor_word_count / word_count if word_count > 0 else 0
            score = 0
            if tag_ratio > 0.6:
                score += 1
            if text_ratio > 0.6 and word_ratio > 0.8 and word_count < 20:
                score += 1
            if score >= 2:
                blocks.append(subtree.get("id") or "")
                return None
            return (tag_count, anchor_count, tag_text_len, anchor_text_len,
                    word_count, anchor_word_count, width)

        realign(body)
        pruning(body)
        # microdata candidates (navigationcontenthunter.py:96-101)
        for n in body.iter():
            if n.get("itemtype") in MICRODATA_REMOVE_ITEMTYPES:
                nid = n.get("id") or ""
                if nid not in blocks:
                    blocks.append(nid)
        return blocks

    def _can_be_deleted(self, node: Node) -> bool:
        """extractor.py:299-303: protected if it contains article-ish
        blocks or its parent is a protected tag."""
        for d in node.iter():
            if d.tag == "article" or d.get("id") == "article" or \
                    d.get("itemprop") == "articleBody" or \
                    "main-con" in (d.get("id") or "") or \
                    "main-con" in (d.get("class") or ""):
                return False
        parent = node.parent
        if parent is not None and parent.tag in (
                "article", "head", "video", "script", "style", "html", "body"):
            return False
        return True

    # -- title (extractors.py:238-367) -----------------------------------
    def _meta_content(self, tree: Node, attr: str, value: str) -> str | None:
        for meta in tree.iter("meta"):
            if meta.get(attr) == value:
                content = meta.get("content")
                if content:
                    return content.strip()
        return None

    def _get_title(self, tree: Node) -> str:
        title_el = tree.find_first("title")
        if title_el is None:
            return ""
        title_text = get_text(title_el)
        used_delimiter = False

        h1_texts = [get_text(h) for h in tree.iter("h1")]
        title_text_h1 = ""
        if h1_texts:
            h1_texts.sort(key=len, reverse=True)
            title_text_h1 = h1_texts[0]
            if len(title_text_h1.split(" ")) <= 2:
                title_text_h1 = ""
            title_text_h1 = " ".join(title_text_h1.split())

        title_text_fb = (self._meta_content(tree, "property", "og:title")
                         or self._meta_content(tree, "name", "og:title") or "")

        f_title = _TITLE_FILTER_RE.sub("", title_text).lower()
        f_h1 = _TITLE_FILTER_RE.sub("", title_text_h1).lower()
        f_fb = _TITLE_FILTER_RE.sub("", title_text_fb).lower()

        if title_text_h1 == title_text:
            used_delimiter = True
        elif f_h1 and f_h1 == f_fb:
            title_text = title_text_h1
            used_delimiter = True
        elif f_h1 and f_h1 in f_title and f_fb and f_fb in f_title and \
                len(title_text_h1) > len(title_text_fb):
            title_text = title_text_h1
            used_delimiter = True
        elif f_fb and f_fb != f_title and f_title.startswith(f_fb):
            title_text = title_text_fb
            used_delimiter = True

        for delim, splitter in (("|", r"\|"), ("-", " - "), ("_", "_"),
                                ("/", "/"), (" » ", " » ")):
            if not used_delimiter and delim in title_text:
                title_text = self._split_title(title_text, splitter, title_text_h1)
                used_delimiter = True

        title = title_text.replace("&#65533;", "")
        f_final = _TITLE_FILTER_RE.sub("", title).lower()
        if f_h1 == f_final:
            title = title_text_h1
        return title

    def _split_title(self, title: str, splitter: str, hint: str | None) -> str:
        pieces = re.split(splitter, title)
        h = None
        if hint:
            h = re.sub(r"[^a-zA-Z0-9\ ]", "", hint).lower()
        large_len, large_idx = 0, 0
        for i, piece in enumerate(pieces):
            current = piece.strip()
            if h and h in re.sub(r"[^a-zA-Z0-9\ ]", "", current).lower():
                large_idx = i
                break
            if len(current) > large_len:
                large_len = len(current)
                large_idx = i
        return pieces[large_idx].replace("&raquo;", "»").strip()

    # -- authors (extractors.py:84-172) ----------------------------------
    def _get_authors(self, tree: Node) -> list[str]:
        def contains_digits(s: str) -> bool:
            return bool(_AUTHOR_DIGITS_RE.search(s))

        def parse_byline(search_str: str) -> list[str]:
            search_str = _AUTHOR_TAG_RE.sub("", search_str)
            search_str = _AUTHOR_BY_RE.sub("", search_str)
            search_str = search_str.strip()
            name_tokens = [s.strip() for s in _AUTHOR_SPLIT_RE.split(search_str)]
            _authors, curname = [], []
            for token in name_tokens:
                if token in ("and", ",", ""):
                    if curname:
                        _authors.append(" ".join(curname))
                        curname = []
                elif not contains_digits(token):
                    curname.append(token)
            if len(curname) >= 2:
                _authors.append(" ".join(curname))
            return _authors

        # Single tree pass; match order preserved as (attr, val)-major then
        # document order — identical to the reference's 15 sequential
        # scans (extractors.py:149-157; case-insensitive substring match,
        # explorer.py:106-117)
        attrs = ("name", "rel", "itemprop", "class", "id")
        vals = ("author", "byline", "dc.creator")
        buckets: dict[tuple, list[Node]] = {(a, v): [] for a in attrs
                                            for v in vals}
        for n in tree.iter():
            for a in attrs:
                av = n.attrib.get(a)
                if av is not None:
                    low = av.lower()
                    for v in vals:
                        if v in low:
                            buckets[(a, v)].append(n)
        matches: list[Node] = []
        for a in attrs:
            for v in vals:
                matches.extend(buckets[(a, v)])
        authors: list[str] = []
        for m in matches:
            content = m.get("content") or "" if m.tag == "meta" else (m.text or "")
            if content:
                authors.extend(parse_byline(content))
        seen: dict[str, int] = {}
        out = []
        for a in authors:
            if a.lower() in seen:
                continue
            seen[a.lower()] = 1
            out.append(a.title())
        return out

    # -- publish date (extractors.py:184-236) ----------------------------
    def _get_publish_date(self, url: str, tree: Node, stops: StopWords):
        m = STRICT_DATE_RE.search(url)
        if m:
            dt = parse_date_str(m.group(0))
            if dt:
                return dt
        for attr, value, content_attr in PUBLISH_DATE_TAGS:
            for n in tree.iter():
                if n.get(attr) == value:
                    dt = parse_date_str(n.get(content_attr))
                    if dt:
                        return dt
                    # extractors.py:222-226 fallback has swapped args and
                    # always returns None — replicated by skipping it.
        body = tree.find_first("body")
        if body is not None:
            body_text = get_text(body)
            m = STRICT_DATE_RE.search(body_text)
            if m:
                dt = parse_date_str(m.group(0))
                if dt:
                    return dt
        return None

    # -- M20 meta extractors ---------------------------------------------
    def _get_favicon(self, tree: Node) -> str | None:
        """extractors.py:385-395: first <link rel*="icon"> href."""
        for link in tree.iter("link"):
            if "icon" in (link.get("rel") or ""):
                return link.get("href")
        return None

    def _get_canonical(self, tree: Node, url: str, scheme: str) -> str | None:
        """extractors.py:520-555: <link rel="canonical"> with hostname
        repair for relative/schemeless hrefs."""
        for link in tree.iter("link"):
            if (link.get("rel") or "") == "canonical":
                href = (link.get("href") or "").strip()
                if not href:
                    return None
                if href.startswith("//"):
                    return f"{scheme}:{href}"
                if href.startswith("/"):
                    host = urlnorm.get_principal_domain_www(
                        url if "://" in url else "http://" + url)
                    return f"{scheme}://{host}{href}"
                if not _SCHEME_ANY_RE.match(href):
                    return f"{scheme}://{href}"
                return href
        return None

    def _get_meta_data(self, tree: Node) -> dict:
        """extractors.py:481-518: nested meta property/name map (dotted
        keys kept flat: {'og': {'type': 'article', ...}, ...})."""
        out: dict = {}
        for meta in tree.iter("meta"):
            key = meta.get("property") or meta.get("name")
            content = meta.get("content")
            if not key or content is None:
                continue
            parts = re.split(r"[:.]", key, maxsplit=1)
            if len(parts) == 2:
                ns, sub = parts
                bucket = out.setdefault(ns, {})
                if isinstance(bucket, dict):
                    bucket[sub] = content
            else:
                out.setdefault(key, content)
        return out

    # -- sections (extractors.py:1083-1094; name=sections branch dead) ---
    def _get_sections(self, tree: Node) -> list[str]:
        for n in tree.iter("meta"):
            if n.get("itemprop") == "articleSection":
                content = n.get("content")
                return [content] if content is not None else []
        return []

    # -- gravity top-node (extractors.py:721-846) ------------------------
    def _candidate_root(self, tree: Node) -> Node:
        for n in tree.iter():
            if "articleBody" in (n.get("itemprop") or "") or \
                    "article-body" in (n.get("id") or "") or \
                    "article-body" in (n.get("class") or "") or \
                    "article_body" in (n.get("id") or "") or \
                    "article_body" in (n.get("class") or ""):
                return n
        for n in tree.iter("article"):
            if n.get("itemtype") in ("http://schema.org/Article",
                                     "http://schema.org/NewsArticle"):
                return n
        needles = ("bodyNews", "bodynews", "body-news", "body_news",
                   "content-artic", "article-content")
        for n in tree.iter():
            if n.tag == "article" and ("main" in (n.get("id") or "")
                                       or "artic" in (n.get("id") or "")):
                hit = True
            elif n.tag == "div" and any(
                    nd in (n.get("id") or "") or nd in (n.get("class") or "")
                    for nd in needles):
                hit = True
            else:
                hit = False
            if hit:
                style = n.get("style")
                if style and "display" in style:
                    seg = style[style.find("display"):]
                    seg = seg.split(";")[0]
                    if "none" in seg:
                        continue
                return n
        return tree

    def _check_node_text(self, node: Node, stops: StopWords) -> bool:
        ws = stops.get_stopword_count(get_text(node))
        return ws.get_stopword_count() > 2 and not self._is_highlink_density(node)

    def _nodes_to_check(self, doc: Node, stops: StopWords) -> list[Node]:
        """extractors.py:1018-1048 cascade: p/pre/td → span →
        itemprop contains 'text' → div."""
        out: list[Node] = []
        for tag in ("p", "pre", "td"):
            for n in doc.iterdescendants(tag):
                if self._check_node_text(n, stops):
                    out.append(n)
        if not out:
            for n in doc.iterdescendants("span"):
                if self._check_node_text(n, stops):
                    out.append(n)
        if not out:
            for n in doc.iter():
                if "text" in (n.get("itemprop") or "") and \
                        self._check_node_text(n, stops):
                    out.append(n)
        if not out:
            for n in doc.iterdescendants("div"):
                if self._check_node_text(n, stops):
                    out.append(n)
        return out

    def _is_highlink_density(self, e: Node) -> bool:
        """extractors.py:969-995."""
        links = list(e.iterdescendants("a"))
        if not links:
            return False
        words = [w for w in get_text(e).split() if w.isalnum()]
        if not words:
            return True
        link_text = "".join(get_text(ln) for ln in links)
        score = (len(link_text.split()) / float(len(words))) * len(links)
        return score >= 1.0

    def _is_boostable(self, node: Node, stops: StopWords) -> bool:
        """extractors.py:848-872: a nearby preceding sibling paragraph with
        >5 stopwords boosts this node."""
        steps_away = 0
        for sib in node.previous_siblings():
            if sib.tag == "p":
                if steps_away >= 3:
                    return False
                ws = stops.get_stopword_count(get_text(sib))
                if ws.get_stopword_count() > 5:
                    return True
                steps_away += 1
        return False

    @staticmethod
    def _bump(node: Node, score: float, count: int) -> None:
        cur = float(node.get("gravityScore") or 0)
        node.set("gravityScore", str(cur + score))
        cur_n = int(node.get("gravityNodes") or 0)
        node.set("gravityNodes", str(cur_n + count))

    def _calculate_best_node(self, tree: Node, stops: StopWords) -> Node | None:
        doc = self._candidate_root(tree)
        nodes_with_text = self._nodes_to_check(doc, stops)
        nodes_number = len(nodes_with_text)
        if nodes_number == 0:
            ws = stops.get_stopword_count(get_text_without_child(doc))
            if ws.get_stopword_count() > 2 and not self._is_highlink_density(doc):
                nodes_with_text.append(doc)
                nodes_number = 1
        starting_boost = 1.0
        bottom_negativescore_nodes = nodes_number * 0.25
        parent_nodes: list[Node] = []
        for i, node in enumerate(nodes_with_text):
            boost_score = 0.0
            if self._is_boostable(node, stops):
                boost_score = (1.0 / starting_boost) * 50
                starting_boost += 1
            if nodes_number > 15 and (nodes_number - i) <= bottom_negativescore_nodes:
                booster = bottom_negativescore_nodes - (nodes_number - i)
                boost_score = -(booster ** 2)
                if abs(boost_score) > 40:
                    boost_score = 5.0
            ws = stops.get_stopword_count(get_text(node))
            upscore = int(ws.get_stopword_count() + boost_score)
            parent = node.parent
            if parent is None:
                continue
            self._bump(parent, upscore, 1)
            if parent not in parent_nodes:
                parent_nodes.append(parent)
            grandparent = parent.parent
            if grandparent is not None:
                self._bump(grandparent, upscore / 2, 1)
                if grandparent not in parent_nodes:
                    parent_nodes.append(grandparent)
        top_node, top_score = None, 0.0
        for e in parent_nodes:
            score = float(e.get("gravityScore") or 0)
            if score > top_score:
                top_node, top_score = e, score
            if top_node is None:
                top_node = e
        # detached deepcopy (extractors.py:842) — downstream sibling walks
        # see no siblings.
        return top_node.copy() if top_node is not None else None

    # -- videos (newspaperlite/videos/extractors.py:5-131) ---------------
    def _get_videos(self, top_node: Node, domain: str) -> list[str]:
        out: list[str] = []
        for n in top_node.iter():
            src = None
            if n.tag in ("iframe", "embed", "video"):
                src = n.get("src")
            elif n.tag == "object":
                for p in n.iterdescendants("param"):
                    if p.get("name") == "movie":
                        src = p.get("value")
                        break
            if src and (any(p in src for p in VIDEO_PROVIDERS)
                        or (domain and domain in src)):
                if src not in out:
                    out.append(src)
        return out

    # -- top image (M26, network-free subset: article.py:172-182) --------
    def _get_top_image(self, tree: Node, top_node: Node | None) -> str | None:
        img = (self._meta_content(tree, "property", "og:image")
               or self._meta_content(tree, "name", "og:image"))
        if img:
            return img
        for link in tree.iter("link"):
            if "image_src" in (link.get("rel") or ""):
                return link.get("href")
        if top_node is not None:
            for im in top_node.iterdescendants("img"):
                if im.get("src"):
                    return im.get("src")
        return None

    # -- output formatting (outputformatters.py:37-71) -------------------
    def _format_output(self, top_node: Node) -> str:
        # remove_negativescores_nodes (:109-119) — real removal via direct
        # lxml parent.remove; applies to self-or-descendants carrying
        # gravityScore.
        for item in list(top_node.iter()):
            if item.get("gravityScore") is not None and item.parent is not None:
                if float(item.get("gravityScore") or 0) < 1:
                    item.parent.remove(item)
        # links_to_text (:103-107)
        strip_tags(top_node, "a")
        # add_newline_to_br (:91-93): literal backslash-n TEXT
        for e in top_node.iter("br"):
            e.text = r"\n"
        # add_newline_to_li (:95-101): li children removal is a reference
        # no-op; text set to get_text(li) + literal \n
        for ul in top_node.iter("ul"):
            lis = list(ul.iterdescendants("li"))
            for li in lis[:-1]:
                li.text = get_text(li) + r"\n"
        # replace_with_text (:121-129)
        strip_tags(top_node, "b", "strong", "i", "br", "sup")
        # remove_empty_tags / remove_trailing_media_div (:131-172) are
        # reference no-ops (explorer.remove default) — skipped.
        # convert_to_text (:58-71): children of top_node only.
        txts = []
        for child in list(top_node):
            txt = get_text(child, clean=False)
            txt = " ".join(txt.split())  # clean_text
            if txt:
                txt = unescape(txt)
                txts.append(" ".join(txt.split()))
        return " ".join(txts)
