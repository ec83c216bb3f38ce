"""KStem — from-scratch implementation of Krovetz's inflectional stemmer
(R. Krovetz, "Viewing Morphology as an Inference Process", SIGIR 1993),
the stemmer the reference's shipped config selects
(``QryEval.java:61-65`` → ``EnglishAnalyzerConfigurable.java:154-157``,
``StemmerType.KSTEM`` → Lucene ``KStemFilter``).

KStem is DICTIONARY-GUIDED: a suffix transformation is accepted only when
the candidate stem is a known head word, which is what keeps ``police`` →
``police`` (Porter's ``polic`` is its classic failure) while still mapping
``flies`` → ``fly`` and ``running`` → ``run``. Lucene ships a ~30k-entry
lexicon (KStemData1-8); bundling it verbatim is neither possible nor
desirable here, so this implementation embeds a COMPACT public head-word
list plus the standard irregular-form table and follows Krovetz's rule
order (plural → past tense → aspect). Divergence, recorded in SURVEY §2.2:
for words whose stem falls outside the reduced lexicon the dictionary
checks fail and the rule-based fallback decides, which can differ from
Lucene KStem on rare vocabulary. Both sides of every comparison in this
repo use the same analyzer, so rank identity is unaffected.

Pure function + per-process memo cache, mirroring :mod:`.porter`.
"""

from __future__ import annotations

# Irregular forms conflated directly (Krovetz's direct-conflation table —
# standard English irregulars, public linguistic knowledge).
_EXCEPTIONS = {
    "children": "child",
    "men": "man",
    "women": "woman",
    "feet": "foot",
    "teeth": "tooth",
    "geese": "goose",
    "mice": "mouse",
    "lice": "louse",
    "oxen": "ox",
    "dice": "die",
    "people": "person",
    "brethren": "brother",
    "ran": "run",
    "went": "go",
    "ate": "eat",
    "spoke": "speak",
    "sought": "seek",
    "brought": "bring",
    "bought": "buy",
    "caught": "catch",
    "taught": "teach",
    "thought": "think",
    "fought": "fight",
    "began": "begin",
    "begun": "begin",
    "broke": "break",
    "broken": "break",
    "chose": "choose",
    "chosen": "choose",
    "came": "come",
    "did": "do",
    "done": "do",
    "drew": "draw",
    "drawn": "draw",
    "drove": "drive",
    "driven": "drive",
    "fell": "fall",
    "fallen": "fall",
    "flew": "fly",
    "flown": "fly",
    "forgot": "forget",
    "forgotten": "forget",
    "gave": "give",
    "given": "give",
    "grew": "grow",
    "grown": "grow",
    "held": "hold",
    "knew": "know",
    "known": "know",
    "led": "lead",
    "left": "leave",
    "lost": "lose",
    "made": "make",
    "met": "meet",
    "paid": "pay",
    "said": "say",
    "sang": "sing",
    "sung": "sing",
    "sat": "sit",
    "saw": "see",
    "seen": "see",
    "sent": "send",
    "sold": "sell",
    "shown": "show",
    "spent": "spend",
    "stood": "stand",
    "took": "take",
    "taken": "take",
    "told": "tell",
    "threw": "throw",
    "thrown": "throw",
    "understood": "understand",
    "wore": "wear",
    "worn": "wear",
    "won": "win",
    "wrote": "write",
    "written": "write",
}

# Compact head-word lexicon: high-frequency English plus the vocabulary the
# suffix rules must validate against (a reduced public word list — see the
# module docstring for the recorded divergence vs Lucene's full KStemData).
_DICT = frozenset(
    """
a able about above accept access account across act action add address
administration adult affect after again against age agency ago agree ahead
air all allow almost alone along already also although always among amount
analysis and animal another answer any anyone anything appear apple apply
approach area argue arm around arrive art article artist as ask assume at
attack attention attorney audience author authority available avoid away
baby back bad bag ball bank bar base be beat beautiful because become bed
before begin behavior behind believe benefit best better between beyond big
bill billion bit black blood blue board body book born both box boy break
bring brother brown budget build building business but buy by call camera
campaign can cancer candidate capital car card care career carry case cat
catch cause cell center central century certain chair challenge chance
change character charge check cherry child choice choose church citizen
city civil claim class clear close cloud coach cold collection college
color come commercial common community company compare computer concern
condition conference congress consider consumer contain continue control
cost could country couple course court cover create crime cultural culture
cup current customer cut dark data date daughter day dead deal death debate
decade decide decision deep defense degree democrat describe design despite
detail determine develop development die difference different difficult
dinner direction director discover discuss discussion disease do doctor dog
door down draw dream drive drop drug during each early east easy eat
economic economy edge education effect effort eight either election else
employee end energy engine enjoy enough enter entire environment especially
establish even evening event ever every everybody everyone everything
evidence exactly example executive exist expect experience expert explain
eye face fact factor fail fall family far fast father fear federal feel
feeling few field fight figure fill film final finally financial find fine
finger finish fire firm first fish five floor fly focus follow food foot
for force foreign forget form former forward four fox free friend from
front full fund future game garden gas general generation get girl give
glass go goal good government great green ground group grow growth guess
gun guy hair half hand hang happen happy hard have he head health hear
heart heat heavy help her here herself high him himself his history hit
hold home hope horse hospital hot hotel hour house how however huge human
hundred hunter husband i idea identify if image imagine impact important
improve in include increase indeed indicate industry information inside
instead institution interest international interview into investment
involve issue it item its itself job join joy judge jump just keep key kid
kill kind kitchen know knowledge lady land language large last late later
laugh law lawyer lay lazy lead leader learn least leave left leg legal
less let letter level lie life light like likely limit line list listen
little live local long look lose loss lot love low machine magazine main
maintain major make man manage management manager many market marriage
material matter may maybe me mean measure media medical meet meeting
member memory mention merge message method middle might military million
mind minute miss mission model modern moment money month more morning most
mother mouth move movement movie much music must my myself name nation
national natural nature near nearly necessary need network never new news
next nice night no none nor north not note nothing notice now number occur
of off offer office officer official often oh oil ok old on once one only
onto open operation opportunity option or order organization other others
our out outside over own owner page pain painting paper parent part
participant particular partner party pass past patient pattern pay peace
per perform performance perhaps period person personal phone physical pick
picture piece place plan plant play player point police policy political
politics poor popular population position positive possible power practice
prepare present president pressure pretty prevent price private probably
problem process produce product production professional professor program
project property protect prove provide public pull purpose push put
quality question quick quickly quiet quite race radio raise range rate
rather reach read ready real reality realize really reason receive recent
recognize record red reduce reflect region relate relationship religious
remain remember remove report represent republican require research
resource respond response rest result return reveal rich rifle right rise
risk road rock role room rule run safe same save say scene school science
scientist score scope sea season seat second section security see seek
seem sell send senior sense series serious serve service set seven several
species tie cookie pie movie zombie
shake share she shoot short shot should shoulder show side sign
significant similar simple simply since sing single sister sit site
situation six size skill skin small smile so social society soldier some
somebody someone something sometimes son song soon sort sound source south
space speak special specific speech spend sport spring staff stage stand
standard star start state statement station stay step still stock stop
store story strategy street strong structure student study stuff style
subject success such suddenly suffer suggest summer support sure surface
system table take talk task tax teach teacher team technology television
tell ten tend term test than thank that the their them themselves then
theory there these they thing think third this those though thousand
threat three through throughout throw thus time to today together tonight
too top total tough toward town trade traditional training travel treat
treatment tree trial trip trouble true truth try turn two type under
understand unit university until up upon us use usually value various very
victim view violence visit voice vote wait walk wall want war watch water
way we weapon wear week weight well west western what whatever when where
whether which while white who whole whom whose why wide wife will win wind
window wish with within without woman wonder word work worker world worry
would write writer wrong yard yeah year yes yet you young your yourself
""".split()
)

_VOWELS = frozenset("aeiouy")


def _lookup(word: str) -> bool:
    return word in _DICT


def _ends_double_consonant(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _VOWELS
    )


def _pick(candidates: list[str], fallback: str) -> str:
    """First dictionary-confirmed candidate, else the rule fallback —
    KStem's dictionary-guided acceptance order."""
    for c in candidates:
        if len(c) >= 2 and _lookup(c):
            return c
    return fallback


def _plural(word: str) -> str:
    """-ies → -y, -es → -e/∅, -s → ∅ (not -ss/-us/-is), dictionary-checked
    (Krovetz §plural; Lucene KStemmer.plural)."""
    if word.endswith("ies") and len(word) > 3:
        # no >4 length guard: Lucene KStemmer.plural stems 4-letter -ies
        # words too (ties→tie, pies→pie) — the -ie revert below covers them
        # Lucene KStemmer.plural: try the -y form; when its lookup fails,
        # REVERT to the -ie form (movies→movie, cookies→cookie) rather than
        # keeping the bare -y rule output
        base = word[:-3]
        return _pick([base + "y"], base + "ie")
    if word.endswith("es") and len(word) > 3:
        base = word[:-2]
        # Krovetz removes only the "s" first — e-restoration BEFORE the bare
        # stem, else 'cares'→'car' / 'uses'→'us' misconflate when the
        # truncation is coincidentally a word (horses→horse, churches→church)
        return _pick([base + "e", base], base)
    if word.endswith("s") and not word.endswith(("ss", "us", "is")) and len(word) > 3:
        return _pick([word[:-1]], word[:-1])
    return word


def _past_tense(word: str) -> str:
    """-ied → -y, -ed → ∅/+e with consonant undoubling (Krovetz §past)."""
    if word.endswith("ied") and len(word) > 4:
        return _pick([word[:-3] + "y"], word[:-3] + "y")
    if word.endswith("ed") and len(word) > 4:
        base = word[:-2]
        # e-restoration first ('cared'→'care', not 'car'), then undoubling
        cands = [base + "e", base]
        if _ends_double_consonant(base):
            cands.insert(1, base[:-1])  # stopped → stop
        return _pick(cands, base)
    return word


def _aspect(word: str) -> str:
    """-ing → ∅/+e with consonant undoubling (Krovetz §aspect)."""
    if word.endswith("ing") and len(word) > 5:
        base = word[:-3]
        # e-restoration first ('caring'→'care', not 'car'), then undoubling
        cands = [base + "e", base]
        if _ends_double_consonant(base):
            cands.insert(1, base[:-1])  # running → run
        return _pick(cands, base)
    return word


def kstem(word: str) -> str:
    """Stem one lowercase token. Non-alphabetic or very short tokens pass
    through unchanged (KStemFilter stems only all-letter tokens ≥ 3 chars)."""
    if len(word) < 3 or not word.isalpha():
        return word
    hit = _EXCEPTIONS.get(word)
    if hit is not None:
        return hit
    if _lookup(word):  # a known head word is already a stem
        return word
    for step in (_plural, _past_tense, _aspect):
        out = step(word)
        if out != word:
            return out
    return word


_CACHE: dict[str, str] = {}


def kstem_cached(word: str) -> str:
    hit = _CACHE.get(word)
    if hit is None:
        hit = kstem(word)
        if len(_CACHE) < 2_000_000:  # bound worker memory on huge vocabularies
            _CACHE[word] = hit
    return hit
