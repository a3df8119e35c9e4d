"""Extraction-kernel conformance tests (FIXTURES.md §5 unit fixtures +
the corpus golden-text invariant)."""

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.corpus import default_corpus
from news_crawler_ray.extract import ExtractKernel
from news_crawler_ray.htmldom import get_text, parse_html, strip_tags


@pytest.fixture(scope="module")
def kernel():
    return ExtractKernel()


ARTICLE_URL = "http://news-0.example/politica/2021/05/12/una-lunga-storia-di-riforme-approvate.html"


def wrap_article(body: str, head_extra: str = "", lang: str = "it") -> str:
    return (f'<html lang="{lang}"><head><title>Una lunga storia | Sito</title>'
            f'<meta property="og:type" content="article"/>{head_extra}</head>'
            f"<body><div itemprop=\"articleBody\">{body}</div></body></html>")


IT_P1 = ("Il governo ha approvato oggi la riforma che era stata discussa "
         "per mesi nelle aule del parlamento con un voto di fiducia.")
IT_P2 = ("La decisione arriva dopo una lunga giornata di trattative tra i "
         "partiti della maggioranza e le opposizioni al voto.")


class TestTextInvariant:
    def test_two_paragraphs(self, kernel):
        html = wrap_article(f"<p>{IT_P1}</p> <p>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.text == f"{IT_P1} {IT_P2}"

    def test_whitespace_collapsed(self, kernel):
        html = wrap_article(f"<p>{IT_P1.replace(' ', '   ')}</p> <p>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.text == f"{IT_P1} {IT_P2}"

    def test_format_tags_stripped_text_kept(self, kernel):
        p1 = IT_P1.replace("la riforma", "<b>la</b> <em>riforma</em>")
        html = wrap_article(f"<p>{p1}</p> <p>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.text == f"{IT_P1} {IT_P2}"

    def test_anchor_text_kept(self, kernel):
        # links_to_text strips <a> but keeps its text
        # (outputformatters.py:103-107)
        p1 = IT_P1.replace("la riforma", '<a href="/x/y.html">la riforma</a>')
        html = wrap_article(f"<p>{p1}</p> <p>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.text == f"{IT_P1} {IT_P2}"

    def test_br_literal_backslash_n(self, kernel):
        # outputformatters.py:91-93: <br> text becomes LITERAL backslash-n
        html = wrap_article(f"<p>{IT_P1}<br>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r"\n" in r.text
        # strip_tags splices the literal \n directly between the halves
        # (no surrounding spaces — drop_tag text merge)
        assert r.text == f"{IT_P1}\\n{IT_P2}"

    def test_script_and_style_removed(self, kernel):
        html = wrap_article(
            f"<p>{IT_P1}</p><script>var x=1;</script>"
            f"<style>.a{{color:red}}</style> <p>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.text == f"{IT_P1} {IT_P2}"

    def test_unescape(self, kernel):
        p1 = IT_P1.replace("la riforma", "la &amp; riforma")
        expected = IT_P1.replace("la riforma", "la & riforma")
        html = wrap_article(f"<p>{p1}</p> <p>{IT_P2}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.text == f"{expected} {IT_P2}"

    def test_non_article_page_no_text(self, kernel):
        html = ('<html lang="it"><head><title>hub</title></head><body>'
                f"<p>{IT_P1}</p></body></html>")
        r = kernel.extract("http://news-0.example/politica/hub-1.html", html)
        assert r.text is None


class TestTitle:
    def test_pipe_splitter_longest(self, kernel):
        html = wrap_article(f"<p>{IT_P1}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.title == "Una lunga storia"

    def test_h1_preferred_when_equals_og(self, kernel):
        head = '<meta property="og:title" content="Titolo Vero Della Storia"/>'
        html = wrap_article(f"<h1>Titolo Vero Della Storia</h1><p>{IT_P1}</p>",
                            head_extra=head)
        r = kernel.extract(ARTICLE_URL, html)
        assert r.title == "Titolo Vero Della Storia"

    def test_dash_splitter(self, kernel):
        html = ('<html lang="it"><head><title>Corto - Questa parte molto '
                'lunga vince</title>'
                '<meta property="og:type" content="article"/></head>'
                f"<body><div itemprop=\"articleBody\"><p>{IT_P1}</p></div></body></html>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.title == "Questa parte molto lunga vince"


class TestMeta:
    def test_publish_date_from_url(self, kernel):
        html = wrap_article(f"<p>{IT_P1}</p>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.publish_date is not None
        assert (r.publish_date.year, r.publish_date.month, r.publish_date.day) == (2021, 5, 12)

    def test_publish_date_from_meta(self, kernel):
        head = '<meta property="article:published_time" content="2022-03-04T10:00:00"/>'
        url = "http://news-0.example/news/una-storia-senza-data-nel-percorso-url.html"
        html = wrap_article(f"<p>{IT_P1}</p>", head_extra=head)
        r = kernel.extract(url, html)
        assert (r.publish_date.year, r.publish_date.month, r.publish_date.day) == (2022, 3, 4)

    def test_authors(self, kernel):
        head = '<meta name="author" content="Mario Rossi, Anna Bianchi"/>'
        html = wrap_article(f"<p>{IT_P1}</p>", head_extra=head)
        r = kernel.extract(ARTICLE_URL, html)
        assert r.authors == ["Mario Rossi", "Anna Bianchi"]

    def test_language_from_html_lang(self, kernel):
        html = wrap_article(f"<p>{IT_P1}</p>", lang="it-IT")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.language == "it"

    def test_sections(self, kernel):
        head = '<meta itemprop="articleSection" content="politica"/>'
        html = wrap_article(f"<p>{IT_P1}</p>", head_extra=head)
        r = kernel.extract(ARTICLE_URL, html)
        assert r.sections == ["politica"]

    def test_m20_meta_extractors(self, kernel):
        head = ('<meta name="description" content="Una descrizione"/>'
                '<meta name="keywords" content="a,b,c"/>'
                '<link rel="shortcut icon" href="/favicon.ico"/>'
                '<link rel="canonical" href="/politica/2021/05/12/canon.html"/>'
                '<meta property="og:site_name" content="Sito"/>'
                '<meta property="article:tag" content="politica"/>')
        html = wrap_article(f"<p>{IT_P1}</p>", head_extra=head)
        r = kernel.extract(ARTICLE_URL, html)
        assert r.meta_description == "Una descrizione"
        assert r.meta_keywords == "a,b,c"
        assert r.meta_favicon == "/favicon.ico"
        assert r.canonical_link == \
            "http://news-0.example/politica/2021/05/12/canon.html"
        assert r.meta_data["og"]["site_name"] == "Sito"
        assert r.meta_data["og"]["type"] == "article"
        assert r.meta_data["article"]["tag"] == "politica"

    def test_videos_provider_whitelist(self, kernel):
        body = (f"<p>{IT_P1}</p>"
                '<iframe src="http://youtube.example/embed/v1"></iframe>'
                '<iframe src="http://unknown.example/embed/v2"></iframe>')
        html = wrap_article(body)
        r = kernel.extract(ARTICLE_URL, html)
        assert r.videos == ["http://youtube.example/embed/v1"]


class TestLinks:
    def test_order_preserving_dedup(self, kernel):
        body = ('<a href="http://news-0.example/a/b.html">one</a>'
                '<a href="http://news-0.example/c/d.html">two</a>'
                '<a href="http://news-0.example/a/b.html">dup</a>')
        html = f'<html lang="it"><head><title>t</title></head><body>{body}</body></html>'
        r = kernel.extract("http://news-0.example/politica/hub-1.html", html)
        assert r.links == ["http://news-0.example/a/b.html",
                          "http://news-0.example/c/d.html"]

    def test_relative_urls_fixed(self, kernel):
        body = '<a href="/x/y.html">rel</a><a href="//news-0.example/z/w.html">proto</a>'
        html = f'<html lang="it"><head><title>t</title></head><body>{body}</body></html>'
        r = kernel.extract("http://news-0.example/politica/hub-1.html", html)
        assert "http://news-0.example/x/y.html" in r.links
        assert "http://news-0.example/z/w.html" in r.links

    def test_bad_links_filtered(self, kernel):
        body = ('<a href="http://news-0.example/about/team.html">bad</a>'
                '<a href="http://news-0.example/img/x.jpg">img</a>'
                '<a href="http://other.example/x/y.html">offhost</a>'
                '<a href="http://news-0.example/ok/fine.html">ok</a>')
        html = f'<html lang="it"><head><title>t</title></head><body>{body}</body></html>'
        r = kernel.extract("http://news-0.example/politica/hub-1.html", html)
        assert r.links == ["http://news-0.example/ok/fine.html"]


class TestNavHunter:
    def test_flags_link_dense_nav(self, kernel):
        html = wrap_article(f"<p>{IT_P1}</p> <p>{IT_P2}</p>")
        # inject a link-dense nav before the article div
        html = html.replace("<body>",
                            '<body><nav id="n1"><ul>'
                            '<li><a href="/a/a.html">aa bb</a></li>'
                            '<li><a href="/b/b.html">cc dd</a></li>'
                            '<li><a href="/c/c.html">ee ff</a></li>'
                            "</ul></nav>")
        r = kernel.extract(ARTICLE_URL, html)
        assert r.nav_blocks_flagged >= 1
        # reference mode: nav not removed but text still excludes it via
        # top-node selection
        assert r.text == f"{IT_P1} {IT_P2}"


class TestCorpusGolden:
    def test_kernel_reproduces_corpus_text(self, kernel):
        paths = default_corpus("pytest", num_hosts=2, pages_per_host=24)
        t = pads.dataset(paths.pages_dir, partitioning="hive").to_table()
        meta = pq.read_table(paths.fetchmeta).to_pydict()
        status = dict(zip(meta["url"], meta["status"]))
        checked = 0
        for url, html, text, lang in zip(t["url"].to_pylist(),
                                         t["html"].to_pylist(),
                                         t["text"].to_pylist(),
                                         t["lang"].to_pylist()):
            if status[url] != 200 or not text:
                continue
            r = kernel.extract(url, html.decode(), lang_hint=lang)
            assert r.text == text, url
            checked += 1
        assert checked > 20


class TestDom:
    def test_strip_tags_splices(self):
        root = parse_html("<div><p>a <b>bold</b> tail</p></div>")
        strip_tags(root, "b")
        p = root.find_first("p")
        assert get_text(p) == "a bold tail"

    def test_drop_tree_keep_tail(self):
        root = parse_html("<div><p>a</p><script>x</script>keep</div>")
        for n in list(root.iterdescendants("script")):
            n.drop_tree_keep_tail()
        d = root.find_first("div")
        assert "keep" in get_text(d)
        assert "x" not in get_text(d)

    def test_copy_detached(self):
        root = parse_html("<div><p>a</p><p>b</p></div>")
        p = root.find_first("p")
        c = p.copy()
        assert c.parent is None and c.previous_siblings() == []


class TestExtractLinksFastPath:
    """extract_links (the link-graph corpus pass, article parse
    skipped) must stay byte-identical to extract().outbound_links —
    the shared-prep refactor's invariant."""

    def test_matches_full_extract_over_corpus(self, kernel):
        corpus = default_corpus("crawltest", num_hosts=2,
                                pages_per_host=18)
        tbl = pads.dataset(corpus.pages_dir) \
            .to_table(columns=["url", "html"])
        n_checked = 0
        for u, h in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
            html = (h or b"").decode("utf-8", "replace")
            fast = kernel.extract_links(u, html)
            full = kernel.extract(u, html).outbound_links
            assert fast == full, u
            n_checked += 1
        assert n_checked > 10

    def test_matches_on_edge_inputs(self, kernel):
        cases = [
            ("http://a.example/x/", ""),
            ("http://a.example/p.html",
             '<html><body><a href="http://b.example/q">t</a>'
             '<a href="/rel">r</a><a href="#">n</a></body></html>'),
            ("http://a.example/p",
             "<html><body><a href='http://b.example/é'>t</a>"
             "</body></html>"),
        ]
        for u, html in cases:
            assert kernel.extract_links(u, html) == \
                kernel.extract(u, html).outbound_links, u
