"""Text analysis chain: tokenize → possessive strip → lowercase → stop → stem.

From-scratch equivalent of the reference's analyzer
(``EnglishAnalyzerConfigurable.java:137-160``: StandardTokenizer →
StandardFilter → EnglishPossessiveFilter → LowerCaseFilter →
StopFilter(StandardAnalyzer.STOP_WORDS_SET) → stemmer). The reference
configures lowercase+stop+KSTEM (``QryEval.java:61-65``); this engine makes
the stemmer configurable with **Porter** as the default (the north-star names
Porter; the KSTEM/Porter divergence is deliberate and recorded — both sides of
every comparison in this repo use the same analyzer, so rank identity holds).

Position semantics (critical for ``#NEAR/n`` / ``#WINDOW/n``,
``TermVector.java:77-93`` and ``DocLenStoreSimilarity.java:29-36``):

* every token occupies a position slot, **including stopwords** — the position
  counter advances through removed stopwords, so surviving tokens keep their
  original offsets and proximity distances span stopword gaps;
* ``doclen`` counts only the *kept* (indexed) tokens.

All functions are pure and deterministic — importable by any Ray worker with
no setup; the stem cache in :mod:`.porter` amortizes per process.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .porter import stem_cached

# Lucene StandardAnalyzer.STOP_WORDS_SET — the classic 33-word English stop
# list (cf. EnglishAnalyzerConfigurable.java:64 via StandardAnalyzer).
LUCENE_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

# StandardTokenizer-ish word breaker: runs of unicode alphanumerics, keeping
# internal apostrophes (so "obama's" is one token, as StandardTokenizer emits
# it, and the possessive filter can strip the 's).
_WORD_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)

_POSSESSIVE_RE = re.compile(r"['’][sS]$")


@dataclass(frozen=True)
class AnalyzerConfig:
    """Analysis-chain switches (reference seams: ``setLowercase``,
    ``setStopwordRemoval``, ``setStemmer`` in EnglishAnalyzerConfigurable)."""

    lowercase: bool = True
    stopword_removal: bool = True
    stemmer: str = "porter"  # "porter" | "kstem" | "none"

    def key(self) -> str:
        return f"lc={int(self.lowercase)};stop={int(self.stopword_removal)};stem={self.stemmer}"


DEFAULT_ANALYZER = AnalyzerConfig()


def config_from_key(key: str) -> "AnalyzerConfig":
    """Inverse of :meth:`AnalyzerConfig.key` (stored in index stats.json so
    query-time analysis always matches the build)."""
    parts = dict(p.split("=", 1) for p in key.split(";"))
    return AnalyzerConfig(
        lowercase=parts["lc"] == "1",
        stopword_removal=parts["stop"] == "1",
        stemmer=parts["stem"],
    )

# A plain analyzer whose output DuckDB SQL oracles can reproduce with
# regexp_extract_all('[^ \\t\\n\\f\\r]+')/lower — the RE2 whitespace class the
# engine tokenizer uses (see __ray_entry__ correctness-gate queries).
PLAIN_ANALYZER = AnalyzerConfig(lowercase=True, stopword_removal=False, stemmer="none")


def tokenize_raw(text: str) -> list[str]:
    """Split into surface tokens (no lowercasing / stopping / stemming)."""
    return _WORD_RE.findall(text)


def _transform(token: str, cfg: AnalyzerConfig) -> str | None:
    """Apply possessive strip → lowercase → stop → stem to one surface token.
    Returns None when the token is removed as a stopword."""
    token = _POSSESSIVE_RE.sub("", token)
    if cfg.lowercase:
        token = token.lower()
    if cfg.stopword_removal and token in LUCENE_STOP_WORDS:
        return None
    if not token:
        return None
    if cfg.stemmer == "porter":
        token = stem_cached(token)
    elif cfg.stemmer == "kstem":
        # the reference's shipped stemmer (QryEval.java:64 → KSTEM)
        from .kstem import kstem_cached

        token = kstem_cached(token)
    return token


def analyze(text: str, cfg: AnalyzerConfig = DEFAULT_ANALYZER) -> list[str]:
    """Analyzed terms of ``text`` in order, stopwords removed
    (equivalent of ``QryEval.tokenizeQuery``, QryEval.java:801-817)."""
    out = []
    for tok in tokenize_raw(text):
        t = _transform(tok, cfg)
        if t is not None:
            out.append(t)
    return out


def analyze_positions(
    text: str, cfg: AnalyzerConfig = DEFAULT_ANALYZER
) -> tuple[list[str], list[int]]:
    """Analyzed ``(terms, positions)`` with gap-preserving positions: position
    = index in the raw token sequence (stopword slots consume a position but
    emit no term — Lucene StopFilter position-increment behavior)."""
    terms: list[str] = []
    positions: list[int] = []
    for pos, tok in enumerate(_WORD_RE.findall(text)):
        t = _transform(tok, cfg)
        if t is not None:
            terms.append(t)
            positions.append(pos)
    return terms, positions
