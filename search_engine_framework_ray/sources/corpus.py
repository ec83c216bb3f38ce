"""Corpus source: Common-Crawl-style web-page Parquet reader + deterministic
synthesizer (FIXTURES.md F1; ``BASELINE.json input_hint`` schema
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``).

The synthesizer is seeded and **per-document deterministic** (doc i's bytes
depend only on ``(seed, i)``), so any file split / parallelism produces the
same corpus. The HTML wraps the golden ``text`` with titles, meta keywords,
comments, script/style noise, entities and cross-links so the extractor does
real work; by construction ``extract_fields(html)["body"] == text``
byte-for-byte (the per-row invariant — asserted in tests and by the build's
optional verify pass).

Vocabulary is Zipf-distributed over ~1.2k stems **plus** the Lucene stop set
(so stopword-gap positions and heavy-hitter terms are exercised), with
possessives, mixed case, entity-bearing words and Porter-collapsible variants.
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_BASE_STEMS = [
    "search", "engine", "index", "query", "document", "retrieval", "ranking",
    "score", "term", "corpus", "crawl", "web", "page", "link", "anchor",
    "model", "vector", "matrix", "learn", "train", "test", "data", "system",
    "network", "server", "client", "cache", "memory", "disk", "shard",
    "partition", "cluster", "node", "batch", "stream", "process", "thread",
    "compute", "result", "value", "table", "column", "row", "field", "record",
    "file", "format", "parse", "token", "stem", "stop", "word", "text",
    "language", "english", "filter", "sort", "merge", "join", "group",
    "aggregate", "count", "frequency", "position", "window", "near", "phrase",
    "boolean", "weight", "sum", "product", "log", "probability", "smooth",
    "dirichlet", "okapi", "lucene", "java", "python", "distributed", "parallel",
    "efficient", "fast", "slow", "large", "small", "big", "tiny", "huge",
    "obama", "president", "election", "government", "policy", "economy",
    "market", "stock", "price", "trade", "bank", "money", "finance", "report",
    "news", "article", "story", "author", "editor", "publish", "journal",
    "science", "research", "study", "experiment", "analysis", "theory",
    "physics", "chemistry", "biology", "medicine", "health", "disease",
    "treatment", "patient", "doctor", "hospital", "school", "university",
    "student", "teacher", "course", "degree", "history", "culture", "music",
    "art", "film", "movie", "game", "sport", "team", "player", "coach",
    "season", "city", "country", "state", "nation", "world", "travel",
    "hotel", "restaurant", "food", "recipe", "cook", "garden", "house",
    "build", "design", "architect", "road", "car", "engine2", "drive",
    "fly", "airport", "train2", "station", "river", "mountain", "forest",
    "ocean", "weather", "climate", "energy", "solar", "wind", "power",
    "electric", "battery", "phone", "mobile", "computer", "software",
    "hardware", "internet", "email", "social", "media", "video", "photo",
    "image", "camera", "book", "library", "read", "write", "letter",
]

_VARIANT_SUFFIXES = ["", "s", "ing", "ed", "ation", "er", "ness", "al"]

_ENTITY_WORDS = ["AT&T", "R&D", "S&P", "Q&A"]


def _build_vocab() -> list[str]:
    vocab: list[str] = []
    for s in _BASE_STEMS:
        for suf in _VARIANT_SUFFIXES[: 1 + (hash_det(s) % len(_VARIANT_SUFFIXES))]:
            vocab.append(s + suf)
    vocab += ["running", "ponies", "pony", "runs", "ran"]
    return vocab


def hash_det(s: str) -> int:
    """Deterministic small string hash (Python's hash() is salted per run)."""
    h = 2166136261
    for ch in s.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


_VOCAB = _build_vocab()
_STOPS = list(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)
_LANGS = ["en"] * 17 + ["de", "fr", "es"]


def _doc_words(rng: np.random.Generator, n: int) -> list[str]:
    """Zipf-ish word draw with stopwords, case noise, possessives, entities."""
    zipf = rng.zipf(1.35, size=n)
    idx = (zipf - 1) % len(_VOCAB)
    words = []
    for k, i in enumerate(idx):
        if rng.random() < 0.25:
            words.append(_STOPS[int(rng.integers(len(_STOPS)))])
            continue
        w = _VOCAB[int(i)]
        r = rng.random()
        if r < 0.04:
            w = w.capitalize()
        elif r < 0.05:
            w = w.upper()
        if rng.random() < 0.02:
            w += "'s"
        if rng.random() < 0.008:
            w = _ENTITY_WORDS[int(rng.integers(len(_ENTITY_WORDS)))]
        words.append(w)
    return words


def make_doc(seed: int, i: int, n_docs: int) -> dict:
    """Deterministically synthesize corpus row ``i``."""
    rng = np.random.default_rng([seed, i])
    n_words = int(rng.integers(40, 400))
    words = _doc_words(rng, n_words)

    # split into paragraphs; one paragraph becomes an anchor
    n_para = max(1, n_words // 60)
    bounds = np.linspace(0, n_words, n_para + 1).astype(int)
    paras = [" ".join(words[a:b]) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]

    title_words = _doc_words(rng, int(rng.integers(2, 7)))
    title = " ".join(title_words)
    kw = " ".join(_doc_words(rng, int(rng.integers(2, 6))))
    site = int(rng.integers(0, max(2, n_docs // 50)))
    url = f"https://site{site:04d}.example.com/page/{i:08d}"
    target = f"https://site{int(rng.integers(0, max(2, n_docs // 50))):04d}.example.com/page/{int(rng.integers(n_docs)):08d}"

    esc = _html.escape
    body_parts = []
    anchor_para = int(rng.integers(len(paras))) if len(paras) > 1 else -1
    for j, p in enumerate(paras):
        if j == anchor_para:
            body_parts.append(f'<p>\n  <a href="{target}">{esc(p)}</a></p>')
        else:
            body_parts.append(f"<p>{esc(p)}</p>")
        if rng.random() < 0.3:
            body_parts.append(f"<!-- noise {int(rng.integers(1e6))} -->")
        if rng.random() < 0.2:
            body_parts.append("<script>var x = 1 < 2 && 3 > 0;</script>")
    html_doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>{esc(title)}</title>"
        f'<meta name="keywords" content="{esc(kw)}">'
        "<style>body { margin: 0; }</style>"
        "</head><body>\n" + "\n".join(body_parts) + "\n</body></html>"
    )
    text = " ".join(paras)
    ts = np.datetime64("2019-01-01T00:00:00", "us") + np.timedelta64(
        int(rng.integers(0, 365 * 24 * 3600)), "s"
    )
    return {
        "url": url,
        "warc_ts": ts.astype("datetime64[us]").item(),
        "html": html_doc.encode("utf-8"),
        "text": text,
        "lang": _LANGS[int(rng.integers(len(_LANGS)))],
    }


def synthesize_corpus(out_dir: str, n_docs: int, n_files: int = 8, seed: int = 42) -> list[str]:
    """Write an F1-shaped corpus as ``n_files`` parquet files; returns paths.
    Skips files that already exist (idempotent re-runs)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, n_docs, n_files + 1).astype(int)
    for f, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        rows = [make_doc(seed, i, n_docs) for i in range(a, b)]
        cols = {k: [r[k] for r in rows] for k in ("url", "warc_ts", "html", "text", "lang")}
        pq.write_table(pa.table(cols, schema=CORPUS_SCHEMA), path)
    return paths


def read_corpus(paths: str | list[str], columns: list[str] | None = None):
    """``ray.data.read_parquet`` over corpus files, pruning columns at the
    read (SURVEY.md §4: never load ``html`` for stages that don't need it)."""
    import ray.data

    return ray.data.read_parquet(paths, columns=columns)
