"""Build a non-ASCII variant of a testdata sf dir under /tmp.

The driver's documents fixture is ASCII-only, which let an INT32
overflow hide in the anchor-window SQL twin (round-3 verdict item 2):
every codepoint path (dup-substrings polynomial, winnowing, tokenizer,
PII masking) was exercised only over codepoints < 128.  This tool
copies an sf dir and deterministically injects 2-byte / 3-byte / astral
codepoints into a slice of ``documents.text`` (recomputing ``n_chars``,
which the source data defines as codepoint length), so the full
engine-vs-DuckDB sweep can be re-run on text that exercises those
paths:

    python tools/make_unicode_sfdir.py /root/testdata/sf0.01 /tmp/ncr_uni_sf0.01
    python tools/check_oracle.py /tmp/ncr_uni_sf0.01

Injection is a pure function of doc_id, so the output is stable across
runs and machines.  Snippets are shared between docs (same snippet for
the same ``doc_id % 4``) so duplicated-substring windows CONTAINING
non-ASCII actually occur across documents, and a PII tail with accented
context exercises the masking regexes beyond ASCII.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# ≥40 codepoints each; 2-byte (é ñ ü ß α в), 3-byte (CJK/Hangul) and
# astral 4-byte (emoji, musical symbol) codepoints, with enough ASCII
# interleaved that anchors land both on and around the wide chars.
SNIPPETS = [
    " déjà-vu résumé naïve coöperate ñandú über straße émigré ",
    " 中文文本处理需要正确的码点运算 한국어 텍스트 日本語のテキスト ",
    " mixed 🎉 astral 𝄞 plane ẞß αβγδ вопрос ответ 🚀 payload 🎯 end ",
    # NOT NFC-normalized: decomposed e + COMBINING ACUTE (U+0301) and
    # decomposed n + COMBINING TILDE — exercises the engines' NFC
    # detectors against each other (unicodedata vs DuckDB's utf8proc)
    " café mañana déjà vu ",
]

PII_TAIL = " contacté: andré.müller@exämple-mail.de ou +33-1-555-0000 fin"


def inject(doc_id: int, text: str) -> str:
    if doc_id % 5 == 0:
        snip = SNIPPETS[doc_id % 4]
        pos = min(50, len(text))
        text = text[:pos] + snip + text[pos:]
    if doc_id % 11 == 0:
        text = text + PII_TAIL
    return text


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ncr_uni_" + \
        os.path.basename(src.rstrip("/"))
    os.makedirs(dst, exist_ok=True)

    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        s, d = os.path.join(src, fname), os.path.join(dst, fname)
        if fname != "documents.parquet":
            shutil.copyfile(s, d)
            continue
        t = pq.read_table(s)
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        new_texts = [inject(i, x) for i, x in zip(doc_ids, texts)]
        n_mut = sum(a != b for a, b in zip(texts, new_texts))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(new_texts, pa.string()))
        t = t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(x) for x in new_texts], pa.int64()))
        pq.write_table(t, d)
        print(f"documents: {t.num_rows} rows, {n_mut} mutated "
              f"({sum(any(ord(c) > 127 for c in x) for x in new_texts)} "
              f"now contain non-ASCII)")
    print(dst)


if __name__ == "__main__":
    main()
