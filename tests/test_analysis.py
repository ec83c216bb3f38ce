"""Analyzer unit tests: tokenizer, possessive strip, stop set, Porter goldens,
gap-preserving positions (SURVEY.md §2.2)."""

from search_engine_framework_ray.functions.analysis import (
    DEFAULT_ANALYZER,
    LUCENE_STOP_WORDS,
    AnalyzerConfig,
    analyze,
    analyze_positions,
    tokenize_raw,
)
from search_engine_framework_ray.functions.porter import stem

# Classic published Porter test pairs (Porter 1980 + Martin Porter's sample
# vocabulary) — these pin the stemmer variant.
PORTER_GOLDENS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "digitizer": "digit",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",  # ical->ic (step 3) then m>1 "ic" deletion (step 4)
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "communism": "commun",
    "activate": "activ",
    "effective": "effect",
    "probate": "probat",
    "rate": "rate",
    "controlling": "control",
    "rolling": "roll",
    "running": "run",
    "argument": "argument",
    "generalization": "gener",
    "oscillators": "oscil",
}


def test_porter_goldens():
    bad = {w: (stem(w), want) for w, want in PORTER_GOLDENS.items() if stem(w) != want}
    assert not bad, bad


def test_porter_short_words_unchanged():
    for w in ["a", "is", "be", "ox"]:
        assert stem(w) == w


def test_stop_set_is_lucene_33():
    assert len(LUCENE_STOP_WORDS) == 33
    assert "the" in LUCENE_STOP_WORDS and "with" in LUCENE_STOP_WORDS


def test_tokenize_possessive_and_punct():
    assert tokenize_raw("Obama's  dog, ran;fast") == ["Obama's", "dog", "ran", "fast"]
    assert analyze("Obama's dog") == ["obama", "dog"]


def test_stopwords_removed_but_positions_advance():
    terms, pos = analyze_positions("the quick fox of the forest runs")
    assert terms == ["quick", "fox", "forest", "run"]
    assert pos == [1, 2, 5, 6]  # stopword slots consume positions


def test_no_stem_no_stop_config():
    cfg = AnalyzerConfig(lowercase=True, stopword_removal=False, stemmer="none")
    assert analyze("The Running DOGS", cfg) == ["the", "running", "dogs"]


def test_multi_token_word():
    # parser keeps only terms[0] of multi-token words (QryEval.java:694,711)
    assert analyze("u.s.a")[0] == "u"


def test_numbers_pass_through():
    assert analyze("42 windows 7") == ["42", "window", "7"]


KSTEM_GOLDENS = [
    # dictionary-guarded non-stems — KStem's signature behavior vs Porter
    ("police", "police"),
    ("business", "business"),
    ("glass", "glass"),
    # plural
    ("flies", "fly"),
    ("tries", "try"),
    ("dogs", "dog"),
    ("churches", "church"),
    ("horses", "horse"),
    ("classes", "class"),
    ("technologies", "technology"),
    # -ies reverts to the -ie form when the -y lookup fails (Lucene
    # KStemmer.plural), instead of keeping the bare -y rule output
    ("movies", "movie"),
    ("cookies", "cookie"),
    # 4-letter -ies words take the -ies branch too (no Lucene length guard)
    ("ties", "tie"),
    ("dies", "die"),
    ("pies", "pie"),
    ("lies", "lie"),
    # past tense (undoubling + e-restoration)
    ("stopped", "stop"),
    ("saved", "save"),
    ("wanted", "want"),
    ("tried", "try"),
    # aspect
    ("running", "run"),
    ("making", "make"),
    ("walking", "walk"),
    # e-restoration must beat the coincidental shorter word (not 'car'/'us')
    ("cares", "care"),
    ("cared", "care"),
    ("caring", "care"),
    ("uses", "use"),
    ("does", "do"),
    # irregular direct conflations
    ("children", "child"),
    ("mice", "mouse"),
    ("taken", "take"),
    ("wrote", "write"),
    # short / non-alpha pass-through (KStemFilter contract)
    ("as", "as"),
    ("42", "42"),
]


def test_kstem_goldens():
    from search_engine_framework_ray.functions.kstem import kstem, kstem_cached

    for w, want in KSTEM_GOLDENS:
        assert kstem(w) == want, (w, kstem(w), want)
        assert kstem_cached(w) == want


def test_kstem_differs_from_porter_where_it_should():
    """The reference ships KSTEM (QryEval.java:64); these pairs are where a
    user replaying reference param files would see Porter diverge."""
    from search_engine_framework_ray.functions.kstem import kstem
    from search_engine_framework_ray.functions.porter import stem

    assert stem("police") == "polic" and kstem("police") == "police"
    assert stem("flies") == "fli" and kstem("flies") == "fly"


def test_kstem_analyzer_config_roundtrip():
    from search_engine_framework_ray.functions.analysis import config_from_key

    cfg = AnalyzerConfig(stemmer="kstem")
    assert analyze("the police stopped running flies", cfg) == [
        "police", "stop", "run", "fly",
    ]
    assert config_from_key(cfg.key()) == cfg


def test_kstem_sql_twin_matches_python_on_random_words():
    """Property test: the DuckDB re-implementation of the Krovetz rules
    (the kstem_term_stats oracle) must agree with functions/kstem.py on
    ARBITRARY vocabulary, not just the fixture corpus — same dictionary
    lookups, same rule order, same length guards."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import __ray_entry__ as entrymod
    from search_engine_framework_ray.functions.kstem import kstem

    sql = entrymod.oracle_sql()["kstem_term_stats"]
    word = st.text(alphabet="abcdefgilmnoprstuvy", min_size=1, max_size=12)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(word, min_size=1, max_size=12))
    def check(words):
        text = " ".join(words)
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT 0 AS doc_id, '"
            + text.replace("'", "''")
            + "' AS text"
        )
        got = dict(zip(*[con.sql(sql).df()[c] for c in ("term", "ctf")]))
        toks = (text + " " + entrymod._KSTEM_PROBE).lower().split()
        want: dict = {}
        for t in toks:
            s = kstem(t)
            want[s] = want.get(s, 0) + 1
        assert {k: int(v) for k, v in got.items()} == want

    check()
