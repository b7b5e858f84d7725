"""English analyzer: Porter stemming + Snowball stopword removal.

The reference's full-text index is built with Postgres's *english* text
search configuration — ``CREATE INDEX ... USING GIN(to_tsvector('english',
title))`` (``data-pipeline/database.py:60``) — which lowercases, drops the
Snowball English stopword list, and stems every remaining token. This
module provides the same normalization as an opt-in build-time analyzer
(``EngineConfig.analyzer = "english"``); the default ``"simple"`` analyzer
keeps the raw token stream (Postgres's ``simple`` config).

``porter_stem`` is a from-scratch implementation of the Porter stemming
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program 14(3)
1980 — a public algorithm), including the two departures the canonical
reference implementation (porter.c / Snowball "porter") made to the paper:
Step 2 maps ``bli -> ble`` (paper: ``abli -> able``) and adds
``logi -> log``. Tokens of length <= 2 or containing a digit pass through
unchanged (Postgres likewise leaves numerics unstemmed).

Pure Python on purpose: the same function body runs inside the Arrow
tokenize UDF, the query-term derivation, and the single-node oracle, which
is what keeps Spark/oracle rank-identity testable down to the term level.
Stemming cost is amortized per Arrow batch via a memo dict (web text
repeats tokens heavily; the memo is bounded per-batch, not global).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    """True when w[i] acts as a consonant (Porter's definition: a,e,i,o,u
    are vowels; y is a vowel iff preceded by a consonant)."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: the number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        vowel = not _is_cons(stem, i)
        if not vowel and prev_vowel:
            m += 1
        prev_vowel = vowel
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2]
            and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    """*o condition: stem ends consonant-vowel-consonant where the final
    consonant is not w, x or y (so e.g. hop -> hope-restorable)."""
    n = len(w)
    if n < 3:
        return False
    return (_is_cons(w, n - 3) and not _is_cons(w, n - 2)
            and _is_cons(w, n - 1) and w[-1] not in "wxy")


# Step 2/3/4 rule tables: suffix -> (replacement, min measure). Within a
# group, order is the canonical implementation's try order (first suffix
# that matches ends the step whether or not the measure condition holds).
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"),
    ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"),
    ("bli", "ble"),            # departure (paper: abli -> able)
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),           # departure (added by porter.c)
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize")


def porter_stem(w: str) -> str:
    """Stem one lowercase token. len<=2 and digit-bearing tokens pass
    through unchanged."""
    if len(w) <= 2 or not w.isalpha():
        return w

    # ---- step 1a: plurals
    if w.endswith("sses") or w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # ---- step 1b: -eed / -ed / -ing
    restore = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        restore = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        restore = True
    if restore:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # ---- step 1c: (*v*) y -> i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (m > 0)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 3 (m > 0)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 4 (m > 1; -ion additionally requires stem ending s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1 and (
                    suf != "ion" or (stem and stem[-1] in "st")):
                w = stem
            break

    # ---- step 5a: drop final e
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # ---- step 5b: -ll -> -l when m > 1
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


# The Snowball English stopword list — the list Postgres ships as
# ``english.stop`` and applies inside to_tsvector('english', ...).
STOPWORDS_EN = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself they them their
theirs themselves what which who whom this that these those am is are
was were be been being have has had having do does did doing a an the
and but if or because as until while of at by for with about against
between into through during before after above below to from up down in
out on off over under again further then once here there when where why
how all any both each few more most other some such no nor not only own
same so than too very s t can will just don should now
""".split())


#: multi-char / non-decomposing folds Postgres's unaccent.rules applies
#: beyond combining-mark stripping (NFKD leaves these untouched)
_FOLD_MAP = str.maketrans({
    "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "k", "ŋ": "ng", "Ŋ": "NG",
})

#: analyzers whose token stream is accent-folded BEFORE the ASCII token
#: regex runs (textproc.tokenize checks this set) — folding after
#: tokenization would be too late: `[a-z0-9]+` treats é as a separator
UNACCENT_ANALYZERS = frozenset({"unaccent", "english_unaccent"})

ANALYZERS = frozenset({"simple", "english"}) | UNACCENT_ANALYZERS


def fold_accents(text: str) -> str:
    """Strip diacritics: NFKD-decompose, drop combining marks, then apply
    the non-decomposing ligature/letter folds (ß→ss, ø→o, æ→ae, …) —
    the transliteration Postgres's ``unaccent`` extension dictionary and
    Lucene's ``ASCIIFoldingFilter`` perform (both public rule sets).
    Pure stdlib (``unicodedata``), deterministic, no locale dependence.
    """
    import unicodedata

    if text.isascii():  # the common web-text fast path: no-op
        return text
    # translate AFTER decomposing: ǣ/ǽ/ǿ-class letters NFKD-decompose
    # INTO foldable bases (æ/ø + combining mark), so folding first would
    # leave residual non-ASCII that the [a-z0-9] tokenizer splits on
    decomposed = unicodedata.normalize("NFKD", text).translate(_FOLD_MAP)
    return "".join(ch for ch in decomposed
                   if not unicodedata.combining(ch))


def analyze_tokens(tokens: list[str], analyzer: str = "simple"
                   ) -> list[str]:
    """Apply a named analyzer to an already-tokenized stream.

    ``"simple"``: identity (Postgres ``simple`` config — today's default,
    bit-identical to the pre-analyzer engine). ``"english"``: drop
    Snowball stopwords, Porter-stem the rest (Postgres ``english``
    config, the reference's actual GIN configuration). ``"unaccent"``:
    identity here — the accent fold already ran before tokenization
    (see :data:`UNACCENT_ANALYZERS`), matching Postgres's
    ``unaccent``-then-``simple`` chained configuration.
    ``"english_unaccent"``: unaccent → stopwords → stem (the chained
    ``unaccent``+``english`` config). Unknown names raise — a typo must
    not silently index raw tokens.
    """
    if analyzer in ("simple", "unaccent"):
        return tokens
    if analyzer not in ("english", "english_unaccent"):
        raise ValueError(f"unknown analyzer {analyzer!r} "
                         f"(expected one of {sorted(ANALYZERS)})")
    memo: dict[str, str] = {}
    out = []
    for t in tokens:
        if t in STOPWORDS_EN:
            continue
        s = memo.get(t)
        if s is None:
            s = memo[t] = porter_stem(t)
        out.append(s)
    return out
