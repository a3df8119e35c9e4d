"""Property tests: the DuckDB oracle SQL re-derives the Python kernels
for arbitrary (bounded-alphabet) inputs, not just the fixture corpus.

Alphabet note: parity is defined over ASCII printable + the whitespace
chars RE2 and Python agree on. RE2's ``\\s`` (DuckDB regex) is exactly
``[\\t\\n\\f\\r ]``; Python's ``str.split()`` additionally treats
``\\x0b`` (vertical tab), U+001C-001F and unicode spaces as separators
— hypothesis found the ``\\x0b`` divergence on its first minimized
example. The synthetic corpora never contain those, and the oracle
contract documents tokenization as ``\\s+``-splitting over this
alphabet. No Ray needed: these exercise the pure kernels the
distributed stages wrap.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from news_crawler_ray.functions.dedup import SimHasher
from news_crawler_ray.functions.textops import _winnow_fingerprints

_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789 \t\n\r\x0c.,;:!?'\"-_()[]/@#$%&*+=<>~`^|\\{}"
)

_SIM_FP_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(?), '\s+'),
                            x -> x <> '')) AS tok),
tc AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
th AS (SELECT ('0x'||substr(md5(tok),1,16))::UBIGINT AS h, cnt FROM tc),
bits AS (
  SELECT b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM th, (SELECT unnest(range(64)) AS b) b GROUP BY b.b)
SELECT coalesce(sum(CASE WHEN acc > 0 THEN (1::UBIGINT << bit)::HUGEINT
                         ELSE 0 END), 0)::UBIGINT
FROM bits
"""

_WINNOW_SQL = r"""
WITH d AS (SELECT lower(?) AS s),
grams AS (
  SELECT g.i AS i,
         ('0x'||substr(md5(substr(s, g.i, 5)),1,16))::UBIGINT
           & ((1::UBIGINT<<61)-1) AS h
  FROM d, LATERAL (SELECT unnest(range(1, length(s)-5+2)) AS i) g
  WHERE length(s) >= 5),
wins AS (
  SELECT w.w AS w
  FROM d, LATERAL (
    SELECT unnest(range(0, greatest(1, length(s)-5+1-4+1))) AS w) w
  WHERE length(s) >= 5),
members AS (
  SELECT w.w, g.i, g.h FROM wins w
  JOIN grams g ON g.i - 1 BETWEEN w.w AND w.w + 3),
win_min AS (SELECT w, min(h) AS mh FROM members GROUP BY w),
sel AS (
  SELECT m.w, max(m.i) AS sel_pos FROM members m
  JOIN win_min x ON x.w = m.w AND m.h = x.mh GROUP BY m.w),
fp_pos AS (SELECT DISTINCT sel_pos FROM sel)
SELECT coalesce(count(*), 0)::BIGINT,
       coalesce(min(g.h), 0)::UBIGINT
FROM fp_pos f JOIN grams g ON g.i = f.sel_pos
"""


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


class TestSimhashSqlParity:
    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=_ALPHABET, max_size=300))
    def test_fingerprint_matches_sql(self, text):
        con = duckdb.connect()
        sql_fp = con.execute(_SIM_FP_SQL, [text]).fetchone()[0]
        assert int(sql_fp) == SimHasher.fingerprint(text)


class TestWinnowSqlParity:
    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=_ALPHABET, max_size=200))
    def test_fingerprints_match_sql(self, text):
        con = duckdb.connect()
        n_sql, min_sql = con.execute(_WINNOW_SQL, [text]).fetchone()
        fps = _winnow_fingerprints(text)
        assert int(n_sql or 0) == len(fps)
        assert int(min_sql or 0) == (min(fps) if fps else 0)


def _minhash_sig_sql() -> str:
    """Single-document replica of queries._minhash_ctes(): text → shingle
    set → 128 signature values (one row per perm). Exercises the
    numpy-uint64 wraparound-multiply replication (_sql_mulmod64)."""
    from news_crawler_ray.functions.dedup import _perm_params
    from news_crawler_ray.queries import _MERSENNE61, _U64, _sql_mulmod64

    c1 = 0x9E3779B97F4A7C15
    c2 = 0xC2B2AE3D27D4EB4F + 2
    c3 = 0xC2B2AE3D27D4EB4F + 4
    a, b = _perm_params(128)
    perm_vals = ", ".join(
        f"({j}, {int(a[j])}::UBIGINT, {int(b[j])}::UBIGINT)"
        for j in range(128))
    sh = (f"(xor(xor({_sql_mulmod64('h', str(c1))}, "
          f"{_sql_mulmod64('h1', str(c2))}), "
          f"{_sql_mulmod64('h2', str(c3))}) & {_MERSENNE61})")
    sig = (f"((({_sql_mulmod64('pp.a', 's.sh')})::HUGEINT + pp.b)"
           f" % {_U64} % {_MERSENNE61})::UBIGINT")
    return rf"""
WITH toklist AS (
  SELECT list_filter(string_split_regex(lower(?), '\s+'),
                     x -> x <> '') AS toks),
tok_pos AS (
  SELECT i.i AS i, ('0x'||substr(md5(toks[i.i + 1]),1,16))::UBIGINT AS h
  FROM toklist, LATERAL (SELECT unnest(range(len(toks))) AS i) i),
pos3 AS (
  SELECT h, lead(h,1) OVER w AS h1, lead(h,2) OVER w AS h2
  FROM tok_pos WINDOW w AS (ORDER BY i)),
shingles AS (
  SELECT DISTINCT {sh} AS sh FROM pos3 WHERE h2 IS NOT NULL),
perms(perm, a, b) AS (VALUES {perm_vals})
SELECT pp.perm,
       coalesce(min({sig}), {_MERSENNE61}::UBIGINT) AS sig
FROM perms pp LEFT JOIN shingles s ON true
GROUP BY pp.perm ORDER BY pp.perm
"""


class TestMinhashSqlParity:
    @settings(max_examples=25, deadline=None)
    @given(st.text(alphabet=_ALPHABET, max_size=200))
    def test_signature_matches_sql(self, text):
        from news_crawler_ray.functions.dedup import MinHasher
        con = duckdb.connect()
        rows = con.execute(_minhash_sig_sql(), [text]).fetchall()
        got = [int(r[1]) for r in rows]
        want = MinHasher(num_perm=128).signature(text).tolist()
        assert got == want


_MASK_ALPHABET = _ALPHABET + "@"

_MASK_SQL = r"""
WITH m AS (
  SELECT length(regexp_extract_all(
           ?, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           AS n_email,
         regexp_replace(
           ?, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS t2)
SELECT regexp_replace(t2, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}',
                      '<PHONE>', 'g'),
       n_email,
       length(regexp_extract_all(
         t2, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))
FROM m
"""


class TestMaskPiiSqlParity:
    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet=_MASK_ALPHABET, max_size=120))
    def test_mask_matches_sql(self, text):
        import re

        from news_crawler_ray.functions.textops import (PII_EMAIL_RE,
                                                        PII_PHONE_RE)
        con = duckdb.connect()
        sql_masked, sql_ne, sql_np = con.execute(
            _MASK_SQL, [text, text]).fetchone()
        ne = len(re.findall(PII_EMAIL_RE, text))
        t2 = re.sub(PII_EMAIL_RE, "<EMAIL>", text)
        npn = len(re.findall(PII_PHONE_RE, t2))
        t3 = re.sub(PII_PHONE_RE, "<PHONE>", t2)
        assert (sql_masked, sql_ne, sql_np) == (t3, ne, npn)

    def test_realistic_examples(self):
        import re

        from news_crawler_ray.functions.textops import (PII_EMAIL_RE,
                                                        PII_PHONE_RE)
        con = duckdb.connect()
        for text in [
            "mail a.b-c_d%e+f@sub.domain-x.co.uk now",
            "call +44-123-555-0000 or +1-800-555-12345 x",
            "x@y.zz a@b.c +1-23-555-0000 not-a-phone 123-456-7890",
            "double dots a..b@c..d.ee and trailing a@b.cd.",
        ]:
            sql_masked, sql_ne, sql_np = con.execute(
                _MASK_SQL, [text, text]).fetchone()
            t2 = re.sub(PII_EMAIL_RE, "<EMAIL>", text)
            t3 = re.sub(PII_PHONE_RE, "<PHONE>", t2)
            assert sql_masked == t3, text
            assert sql_ne == len(re.findall(PII_EMAIL_RE, text))


_MASK_EXT_SQL = r"""
WITH p1 AS (
  SELECT length(regexp_extract_all(
           ?, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
         regexp_replace(
           ?, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS t1),
p2 AS (
  SELECT ne,
         length(regexp_extract_all(
           t1, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS np,
         regexp_replace(t1, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}',
                        '<PHONE>', 'g') AS t2
  FROM p1),
p3 AS (
  SELECT ne, np,
         length(regexp_extract_all(
           t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
           AS ni,
         regexp_replace(
           t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
           '<IP>', 'g') AS t3
  FROM p2)
SELECT regexp_replace(t3, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
       ne, np, ni,
       length(regexp_extract_all(t3, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))
FROM p3
"""


class TestMaskPiiExtendedSqlParity:
    """The 4-pass cascade (email → phone → IPv4 → SSN) must agree
    replacement-for-replacement with the nested DuckDB twin — including
    the pass-order guarantees (a masked phone's digits never re-claimed
    as an SSN, \\b boundary semantics identical over the ASCII
    alphabet)."""

    @staticmethod
    def _py_mask(text):
        import re

        from news_crawler_ray.functions.textops import PII_EXTENDED_PASSES
        counts = []
        for pat, token, _ in PII_EXTENDED_PASSES:
            counts.append(len(re.findall(pat, text)))
            text = re.sub(pat, token, text)
        return (text, *counts)

    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet=_MASK_ALPHABET, max_size=120))
    def test_mask_ext_matches_sql(self, text):
        con = duckdb.connect()
        sql_row = con.execute(_MASK_EXT_SQL, [text, text]).fetchone()
        assert sql_row == self._py_mask(text)

    def test_realistic_examples(self):
        con = duckdb.connect()
        for text in [
            "ssh 10.0.0.1 then 255.255.255.255. and 1.2.3.4x no",
            "ssn 123-45-6789 vs phone +1-123-555-6789 vs 12-34-5678",
            "a@b.cc 1.2.3.4 999-99-9999 +44-123-555-0000 all four",
            "edge 1234-56-7890 and 123-45-67890 not ssns; 123-45-6789.",
        ]:
            sql_row = con.execute(_MASK_EXT_SQL, [text, text]).fetchone()
            assert sql_row == self._py_mask(text), text


_ANCHOR_SQL = r"""
WITH t(s) AS (SELECT ?),
pos AS (SELECT s, unnest(range(1, length(s) - 30 + 2)) AS p FROM t
        WHERE length(s) >= 30),
anch AS (
  SELECT DISTINCT substr(s, p, 30) AS win FROM pos
  WHERE (unicode(substr(s, p, 1))::BIGINT * 16974593
       + unicode(substr(s, p + 1, 1))::BIGINT * 66049
       + unicode(substr(s, p + 2, 1))::BIGINT * 257
       + unicode(substr(s, p + 3, 1))::BIGINT) % 4 = 0)
SELECT coalesce(count(*), 0)::BIGINT,
       coalesce(min(('0x' || substr(md5(win), 1, 15))::BIGINT), 0),
       coalesce(sum(('0x' || substr(md5(win), 1, 15))::BIGINT), 0)
FROM anch
"""

# beyond the shared ASCII alphabet: 2-byte (é ñ), 3-byte (中 한) and
# astral 4-byte (🎉 𝄞) codepoints — the anchor polynomial and window
# hashing must agree between Python's utf-32 view and DuckDB's
# codepoint-based length/substr/unicode
_UNI_ALPHABET = _ALPHABET + "éñüßαв中文한🎉𝄞"


class TestNgramRepetitionSqlParity:
    """The PRODUCTION Q_NGRAM_REP_SQL (run on a one-row documents
    table) re-derives the pure per-document kernel, including the
    joined-string tie-break for the top gram, over the unicode
    alphabet."""

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=_UNI_ALPHABET, max_size=120))
    def test_counts_match_sql(self, text):
        from news_crawler_ray.functions.textops import (
            NGRAM_DUP_PCT, NGRAM_TOP_PCT, _ngram_repetition_doc)
        from news_crawler_ray.queries import Q_NGRAM_REP_SQL

        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (0, ?)", [text])
        row = con.execute(Q_NGRAM_REP_SQL).fetchall()
        assert len(row) == 1
        cols = [d[0] for d in con.description]
        got = dict(zip(cols, row[0]))
        want = _ngram_repetition_doc(text)
        for k, v in want.items():
            assert int(got[k]) == v, (k, text)
        for n, pct in NGRAM_TOP_PCT.items():
            assert got[f"f_top{n}"] == int(
                100 * want[f"top{n}_chars"] <= pct * want["norm_chars"])
        for n, pct in NGRAM_DUP_PCT.items():
            assert got[f"f_dup{n}"] == int(
                100 * want[f"dup{n}_chars"] <= pct * want["norm_chars"])

    def test_pinned_example(self):
        """'a b a b a b c': top-2 gram 'a b' ×3 (9 chars of 13), the
        3-gram tie ('a b a' vs 'b a b', both ×2) breaks to the joined
        string 'a b a', and no 5..10-gram repeats."""
        from news_crawler_ray.functions.textops import _ngram_repetition_doc
        d = _ngram_repetition_doc("a b a b a b c")
        assert d["norm_chars"] == 13
        assert (d["top2_c"], d["top2_chars"]) == (3, 9)
        assert (d["top3_c"], d["top3_chars"]) == (2, 10)
        assert (d["top4_c"], d["top4_chars"]) == (2, 14)
        assert all(d[f"dup{n}_chars"] == 0 for n in range(5, 11))


class TestAnchorWindowSqlParity:
    @settings(max_examples=80, deadline=None)
    @given(st.text(alphabet=_UNI_ALPHABET, max_size=150))
    def test_anchor_windows_match_sql(self, text):
        import hashlib

        from news_crawler_ray.functions.textops import _anchor_windows
        con = duckdb.connect()
        n_sql, min_sql, sum_sql = con.execute(_ANCHOR_SQL, [text]).fetchone()
        hs = [int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
              for w in _anchor_windows(text, 30, 4)]
        assert int(n_sql or 0) == len(hs)
        assert int(min_sql or 0) == (min(hs) if hs else 0)
        assert int(sum_sql or 0) == sum(hs)


class TestNormalizeTrimParity:
    """DuckDB trim() strips exactly the Unicode Zs category — neither
    Python str.strip() (wider: control whitespace, NEL, LS/PS) nor
    strip(' ') (narrower). The q_normalize_text engine strips the
    Zs set; this pins the decision on every boundary codepoint the
    fixture corpus can't be trusted to contain."""

    def test_boundary_codepoints(self):
        import re
        import unicodedata as ud
        ws = re.compile(r"[ \t\n\r\f]+")
        zs = "".join(chr(c) for c in range(0x10000)
                     if ud.category(chr(c)) == "Zs")
        con = duckdb.connect()
        sql = ("SELECT trim(regexp_replace(nfc_normalize(?), "
               "'[ ' || chr(9) || chr(10) || chr(13) || chr(12) "
               "|| ']+', ' ', 'g'))")
        cps = [0x20, 0x09, 0x0a, 0x0b, 0x0c, 0x0d, 0x85, 0xa0, 0x1680,
               0x2000, 0x2007, 0x2009, 0x200b, 0x2028, 0x2029, 0x202f,
               0x205f, 0x3000, 0xfeff]
        for cp in cps:
            t = chr(cp) + "a  b" + chr(cp)
            eng = ws.sub(" ", ud.normalize("NFC", t)).strip(zs)
            assert eng == con.execute(sql, [t]).fetchone()[0], hex(cp)
