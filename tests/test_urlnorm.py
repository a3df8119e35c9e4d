"""Unit tests for urlnorm — semantics cited from /root/reference/utils.py and
newspaperlite/newsurl.py (see module docstring)."""

from hypothesis import given, strategies as st

from news_crawler_ray import urlnorm as un


class TestCleanUrl:
    def test_unquote_and_trailing_slash(self):
        assert un.clean_url("http://a.example/p%20x/") == "http://a.example/px"

    def test_strip_query_default(self):
        assert un.clean_url("http://a.example/p?x=1&y=2") == "http://a.example/p"

    def test_keep_query(self):
        assert un.clean_url("http://a.example/p?x=1", remove_arguments=False) == \
            "http://a.example/p?x=1"

    def test_domain_aware_query_embedded_url(self):
        # domain appears only in the query → extract the embedded URL
        # (utils.py:131-140)
        u = "http://redirect.other/jump?target=http://a.example/art&z=3"
        assert un.clean_url(u, True, domain="a.example") == "http://a.example/art"

    def test_domain_in_path_strips_query(self):
        u = "http://a.example/art?utm=1"
        assert un.clean_url(u, True, domain="a.example") == "http://a.example/art"

    def test_scheme_readd(self):
        assert un.clean_url("a.example/x", scheme="https") == "https://a.example/x"

    def test_spaces_removed(self):
        assert un.clean_url("http://a.example/a b") == "http://a.example/ab"

    @given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                                          blacklist_characters="%/"),
                   min_size=1, max_size=50))
    def test_idempotent_without_escapes(self, tail):
        # clean_url is NOT idempotent under %-encoding or doubled trailing
        # slashes (single unquote / single rstrip — utils.py:120, 147-148);
        # the engine computes the canonical key exactly once at discovery.
        # Idempotence holds on the escape-free subset.
        u = "http://a.example/" + tail
        once = un.clean_url(u, False)
        assert un.clean_url(once, False) == once


class TestSplitScheme:
    def test_basic(self):
        assert un.split_url_and_scheme("https://a.example/x/") == \
            ("https://", "a.example/x")

    def test_no_scheme(self):
        scheme, rest = un.split_url_and_scheme("a.example/x")
        assert not scheme and rest == "a.example/x"

    def test_canonical(self):
        assert un.canonical_url("http://a.example/p%2Fq/") == "a.example/p/q"


class TestEquality:
    def test_www_and_scheme_insensitive(self):
        assert un.are_equals_urls("http://www.a.example/x/", "https://a.example/x")

    def test_different(self):
        assert not un.are_equals_urls("http://a.example/x", "http://a.example/y")


class TestValidity:
    def test_valid(self):
        assert un.is_valid_url("http://news-0.example/a/b.html")

    def test_rejects_no_scheme(self):
        assert not un.is_valid_url("news-0.example/a")

    def test_rejects_private(self):
        assert not un.is_valid_url("http://localhost/x")
        assert not un.is_valid_url("http://192.168.0.1/x")

    def test_rejects_mailto(self):
        assert not un.is_valid_url_to_navigate("http://mailto:x@y.example")

    def test_rejects_share_query(self):
        assert not un.is_valid_url_to_navigate("http://a.example/p/q?share=twitter")
        assert not un.is_valid_url_to_navigate("http://a.example/p/q?email=x")

    def test_rejects_bad_filetype(self):
        assert not un.is_valid_url_to_navigate("http://a.example/x/img.jpg")

    def test_allows_whitelisted_filetype(self):
        assert un.is_valid_url_to_navigate("http://a.example/x/page.html")
        assert un.is_valid_url_to_navigate("http://a.example/x/page.php")

    def test_rejects_bad_tokens_in_path(self):
        assert not un.is_valid_url_to_navigate("http://a.example/about/team.html")
        assert not un.is_valid_url_to_navigate("http://a.example/x/privacy")

    def test_rejects_bad_subdomain(self):
        assert not un.is_valid_url_to_navigate("http://shop.a.example/x/y")

    def test_filetype_stripped_before_token_check(self):
        # "privacy.html" token → "privacy" after filetype strip (utils.py:108-109)
        assert not un.is_valid_url_to_navigate("http://a.example/x/privacy.html")


class TestNewsUrl:
    def test_slug_with_many_dashes(self):
        assert un.is_news_url("http://a.example/2021/some-long-article-title-with-dashes")

    def test_date_in_url(self):
        assert un.is_news_url("http://a.example/politics/2021/05/12/story.html")

    def test_good_path(self):
        assert un.is_news_url("http://a.example/news/item.html")

    def test_rejects_root(self):
        assert not un.is_news_url("http://a.example/")

    def test_rejects_single_path(self):
        assert not un.is_news_url("http://a.example/page.html")

    def test_rejects_bad_chunk(self):
        assert not un.is_news_url("http://a.example/about/x/y.html")

    def test_rejects_bad_domain(self):
        assert not un.is_news_url("http://twitter.com/a/b/c")

    def test_rejects_media_filetype(self):
        assert not un.is_news_url("http://a.example/news/video.mp4")

    def test_empty_path(self):
        assert not un.is_news_url("http://a.example")


class TestDomainLink:
    def test_plain(self):
        assert un.is_domain_link("http://a.example/x", "a.example")

    def test_domain_after_eq_rejected(self):
        assert not un.is_domain_link("http://t.other/r?u=a.example/x", "a.example")

    def test_not_contained(self):
        assert not un.is_domain_link("http://b.example/x", "a.example")


class TestTldSplit:
    def test_basic(self):
        assert un.tld_split("http://www.news-1.example/x") == ("www", "news-1", "example")

    def test_two_level(self):
        assert un.tld_split("http://a.bbc.co.uk/x") == ("a", "bbc", "co.uk")

    def test_no_sub(self):
        assert un.tld_split("http://cnn.com/x") == ("", "cnn", "com")


class TestKeys:
    def test_key_scheme_insensitive(self):
        assert un.url_key("http://a.example/x") == un.url_key("https://a.example/x")

    def test_shard_range(self):
        for n in (1, 4, 16):
            assert 0 <= un.url_shard("http://a.example/x", n) < n

    def test_host_of(self):
        assert un.host_of("http://www.a.example/x") == "a.example"
        assert un.host_of("a.example/x") == "a.example"

    @given(st.integers(0, 10**6))
    def test_host_shard_deterministic(self, i):
        h = f"host-{i}.example"
        assert un.host_shard(h, 16) == un.host_shard(h, 16)
