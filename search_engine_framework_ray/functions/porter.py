"""Porter stemmer — from-scratch Python implementation of the classic
Porter (1980) suffix-stripping algorithm, revised variant (``bli``→``ble``,
``logi``→``log``), matching the behavior of Lucene's ``PorterStemFilter``
(the stemmer the reference's analyzer selects with ``StemmerType.PORTER``,
``EnglishAnalyzerConfigurable.java:154-155``; the reference's runtime config
picks KSTEM at ``QryEval.java:64`` — our engine defaults to Porter per the
north-star spec and also ships a KStem implementation, :mod:`.kstem`,
selectable via ``AnalyzerConfig(stemmer="kstem")``).

Pure function, deterministic, no state: safe to call from any Ray worker.
Hot paths should memoize via :func:`stem_cached` (per-process dict cache —
vocabulary is tiny relative to token count, so the hit rate is ~100%).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    """True if word[i] is a consonant per Porter's definition:
    not a/e/i/o/u, and 'y' is a consonant iff at start or preceded by a vowel.
    """
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: the number of VC sequences in [C](VC)^m[V]."""
    n = len(stem)
    i = 0
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """consonant-vowel-consonant at the end, last consonant not w/x/y."""
    if len(word) < 3:
        return False
    i = len(word) - 1
    return (
        _is_cons(word, i)
        and word[i] not in "wxy"
        and not _is_cons(word, i - 1)
        and _is_cons(word, i - 2)
    )


# (suffix, replacement) tables for steps 3 and 4 (m > 0 condition), in
# longest-match-wins order keyed by the pre-suffix letter as in Porter's paper.
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"),
    ("bli", "ble"),      # revised (original: abli -> able)
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
    ("logi", "log"),     # revised addition
)

_STEP4 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP5_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def stem(word: str) -> str:
    """Stem one lowercase token. Tokens of length <= 2 are unchanged
    (Porter's ``if (k <= 1) return``). Non-alphabetic tokens pass through
    (digits etc. never match any suffix rule)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a: plurals.
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("s") and not w.endswith("ss"):
        w = w[:-1]

    # Step 1b: -eed / -ed / -ing.
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            hit = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            hit = True
        if hit:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # Step 1c: y -> i when the stem before it has a vowel.
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (Porter step 3 table), condition m(stem) > 0.
    for suf, rep in _STEP3:
        if w.endswith(suf):
            base = w[: -len(suf)]
            if _measure(base) > 0:
                w = base + rep
            break

    # Step 3 (Porter step 4 table), condition m(stem) > 0.
    for suf, rep in _STEP4:
        if w.endswith(suf):
            base = w[: -len(suf)]
            if _measure(base) > 0:
                w = base + rep
            break

    # Step 4 (Porter step 5), condition m(stem) > 1; -ion needs s/t before.
    for suf in _STEP5_SUFFIXES:
        if w.endswith(suf):
            base = w[: -len(suf)]
            if suf == "ion" and not base.endswith(("s", "t")):
                break  # longest match wins; failed condition ends the step
            if _measure(base) > 1:
                w = base
            break

    # Step 5a: drop trailing e.
    if w.endswith("e"):
        base = w[:-1]
        m = _measure(base)
        if m > 1 or (m == 1 and not _ends_cvc(base)):
            w = base

    # Step 5b: -ll -> -l when m > 1.
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    """Memoized :func:`stem` — per-process cache keyed by surface form."""
    s = _CACHE.get(word)
    if s is None:
        s = _CACHE[word] = stem(word)
    return s
