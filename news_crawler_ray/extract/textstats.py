"""Stopword statistics and a deterministic n-gram language identifier.

Reference: newspaperlite/texthelper.py:47-89 (StopWords.get_stopword_count:
punctuation stripped via translate, lowered, ``split(' ')`` — NOT
``split()`` — empty tokens count toward word_count). The reference ships 36
stopword files from newspaper3k; this rebuild embeds compact public
stopword sets for the five corpus languages (it, en, es, de, fr) — loaded
once per extract actor (SURVEY.md §2.3 ST3).

The language identifier replaces the reference's nondeterministic
``langdetect`` call (utils.py:307-315 — unseeded, SURVEY.md §2.2 M9) with a
deterministic stopword/bigram scorer.
"""

from __future__ import annotations

import string

_PUNCT_TABLE = {ord(c): None for c in string.punctuation}

# Compact public stopword sets (top function words per language).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("""a about above after again all am an and any are as at be because been
        before being below between both but by could did do does doing down during each few
        for from further had has have having he her here hers herself him himself his how i
        if in into is it its itself just me more most my myself no nor not now of off on
        once only or other our ours ourselves out over own same she should so some such
        than that the their theirs them themselves then there these they this those through
        to too under until up very was we were what when where which while who whom why
        will with you your yours yourself""".split()),
    "it": frozenset("""a ad al allo ai agli all agl alla alle con col coi da dal dallo dai
        dagli dall dagl dalla dalle di del dello dei degli dell degl della delle in nel
        nello nei negli nell negl nella nelle su sul sullo sui sugli sull sugl sulla sulle
        per tra contro io tu lui lei noi voi loro mio mia miei mie tuo tua tuoi tue suo sua
        suoi sue nostro nostra nostri nostre vostro vostra vostri vostre mi ti ci vi lo la
        li le gli ne il un uno una ma ed se perche anche come dov dove che chi cui non piu
        quale quanto quanti quanta quante quello quelli quella quelle questo questi questa
        queste si tutto tutti e sono sei ha hanno ho hai siamo siete sia sarebbe era fu
        essere stato stata stati state del nel alla degli dalle""".split()),
    "es": frozenset("""de la que el en y a los del se las por un para con no una su al lo
        como mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien me
        hasta hay donde quien desde todo nos durante todos uno les ni contra otros ese eso
        ante ellos e esto mi antes algunos que unos yo otro otras otra el tanto esa estos
        mucho quienes nada muchos cual poco ella estar estas algunas algo nosotros""".split()),
    "de": frozenset("""aber alle allem allen aller alles als also am an ander andere anderem
        anderen anderer anderes auch auf aus bei bin bis bist da damit dann der den des dem
        die das dass du durch ein eine einem einen einer eines er es etwas euer eure fur
        gegen gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir ihr ihre
        im in ist ja jede jedem jeden jeder jedes kann kein keine konnen machen man mein
        meine mit muss nach nicht nichts noch nun nur ob oder ohne sehr sein seine sich sie
        sind so um und uns unser unter viel vom von vor wann war waren was weiter weitere
        wenn wer werde werden wie wieder will wir wird wo zu zum zur zwar""".split()),
    "fr": frozenset("""au aux avec ce ces dans de des du elle en et eux il ils je la le les
        leur lui ma mais me meme mes moi mon ne nos notre nous on ou par pas pour qu que
        qui sa se ses son sur ta te tes toi ton tu un une vos votre vous c d j l m n s t y
        est sont ete etre avait ont cette comme plus sans tout tous si deux fait peut""".split()),
}


class WordStats:
    __slots__ = ("word_count", "stopword_count", "stop_words")

    def __init__(self, word_count=0, stopword_count=0, stop_words=None):
        self.word_count = word_count
        self.stopword_count = stopword_count
        self.stop_words = stop_words or []

    def get_stopword_count(self) -> int:
        return self.stopword_count


class StopWords:
    """Per-language stopword counter (texthelper.py:47-89 semantics)."""

    def __init__(self, language: str = "en"):
        self.language = language if language in STOPWORDS else "en"
        self.STOP_WORDS = STOPWORDS[self.language]

    def get_stopword_count(self, content: str | None) -> WordStats:
        if not content:
            return WordStats()
        stripped = content.translate(_PUNCT_TABLE)
        # split(' ') — empty tokens count toward word_count
        # (texthelper.py:69-89)
        candidates = stripped.lower().split(" ")
        overlapping = [w for w in candidates if w in self.STOP_WORDS]
        return WordStats(word_count=len(candidates),
                         stopword_count=len(overlapping),
                         stop_words=overlapping)


def detect_language(text: str, candidates=("it", "en", "es", "de", "fr")) -> str | None:
    """Deterministic stopword-vote language id (replaces unseeded
    langdetect, utils.py:307-315). Returns the language whose stopword set
    covers the largest token fraction, None when nothing matches."""
    if not text:
        return None
    toks = text.translate(_PUNCT_TABLE).lower().split()
    if not toks:
        return None
    best_lang, best_hits = None, 0
    for lang in candidates:
        sw = STOPWORDS[lang]
        hits = sum(1 for t in toks if t in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang
