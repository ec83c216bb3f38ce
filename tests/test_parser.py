"""Parser quirk tests (QryEval.parseQuery semantics, SURVEY.md §2.2 row 1)."""

from search_engine_framework_ray.query.ast import (
    AndOp,
    Near,
    OrOp,
    ScoreNode,
    SumOp,
    Syn,
    Term,
    WandOp,
    Window,
    WsumOp,
)
from search_engine_framework_ray.query.parser import parse_query


def unwrap(n):
    return n.child if isinstance(n, ScoreNode) else n


def test_default_wrap_per_model():
    assert isinstance(parse_query("apple pie", "RankedBoolean"), OrOp)
    assert isinstance(parse_query("apple pie", "UnrankedBoolean"), OrOp)
    assert isinstance(parse_query("apple pie", "BM25"), SumOp)
    assert isinstance(parse_query("apple pie", "Indri"), AndOp)


def test_terms_analyzed_and_fielded():
    q = parse_query("Running dogs.title apple.url", "BM25")
    args = [unwrap(a) for a in q.args]
    assert args[0] == Term("run", "body")
    assert args[1] == Term("dog", "title")
    assert args[2] == Term("appl", "url")


def test_stopwords_dropped_and_empty_ops():
    q = parse_query("the apple of", "BM25")
    assert [unwrap(a) for a in q.args] == [Term("appl", "body")]
    # all-stopword subquery → empty op dropped entirely
    q = parse_query("#AND(apple #OR(the of))", "RankedBoolean")
    inner = unwrap(q.args[0])
    assert isinstance(inner, AndOp)
    assert [unwrap(a) for a in inner.args] == [Term("appl", "body")]


def test_near_window_and_syn():
    q = parse_query("#NEAR/3(new york) #WINDOW/8(a b c) #SYN(car auto)", "RankedBoolean")
    kids = [unwrap(a) for a in q.args]
    assert isinstance(kids[0], Near) and kids[0].dist == 3
    assert [t.term for t in kids[0].args] == ["new", "york"]
    assert isinstance(kids[1], Window) and kids[1].width == 8
    # a, b are stopwords ("a", "b"? only "a" is) — "a" dropped
    assert [t.term for t in kids[1].args] == ["b", "c"]
    assert isinstance(kids[2], Syn)


def test_wand_weights():
    q = parse_query("#WAND(0.3 apple 0.7 pie)", "Indri")
    w = unwrap(q.args[0])
    assert isinstance(w, WandOp)
    assert w.weights == [0.3, 0.7]
    assert [unwrap(a).term for a in w.args] == ["appl", "pie"]


def test_wand_stopword_drops_weight():
    # weight preceding a stopword arg is dropped (QryEval.java:700-703)
    q = parse_query("#WSUM(0.5 apple 0.3 the 0.2 pie)", "Indri")
    w = unwrap(q.args[0])
    assert isinstance(w, WsumOp)
    assert w.weights == [0.5, 0.2]
    assert [unwrap(a).term for a in w.args] == ["appl", "pie"]


def test_nested_weighted_ops_restore_pending_weight():
    q = parse_query("#WAND(0.4 #WAND(0.3 apple 0.7 pie) 0.6 cake)", "Indri")
    outer = unwrap(q.args[0])
    assert isinstance(outer, WandOp)
    assert outer.weights == [0.4, 0.6]
    inner = outer.args[0]
    assert isinstance(inner, WandOp) and inner.weights == [0.3, 0.7]


def test_nested_unweighted_inside_weighted():
    q = parse_query("#WAND(0.4 #AND(apple pie) 0.6 cake)", "Indri")
    outer = unwrap(q.args[0])
    assert outer.weights == [0.4, 0.6]
    assert isinstance(outer.args[0], AndOp)


def test_multi_token_word_keeps_first():
    q = parse_query("u.s.a pie", "BM25")
    assert [unwrap(a).term for a in q.args] == ["u", "pie"]


def test_case_insensitive_ops():
    q = parse_query("#Or(#And(apple) #near/2(x y))", "RankedBoolean")
    user_or = q.args[0]  # default #or wrap around the user's #Or
    assert isinstance(user_or, OrOp)
    assert isinstance(unwrap(user_or.args[0]), AndOp)
    assert isinstance(unwrap(user_or.args[1]), Near)


def test_broken_query_trailing_tokens():
    assert parse_query("apple) pie", "BM25") is None


def test_score_ids_assigned():
    q = parse_query("apple pie #NEAR/2(new york)", "BM25")
    ids = []
    for a in q.args:
        assert isinstance(a, ScoreNode)
        ids.append(a.score_id)
    assert ids == [0, 1, 2]


def test_andnot_parses_and_nests():
    from search_engine_framework_ray.query.ast import AndNotOp

    q = parse_query("#ANDNOT(#OR(apple pie) cake)", "RankedBoolean")
    # default #OR wrap around the single rooted op
    inner = q.args[0] if isinstance(q, OrOp) else q
    assert isinstance(inner, AndNotOp)
    assert len(inner.args) == 2
    assert isinstance(inner.args[0], OrOp)
    assert unwrap(inner.args[1]) == Term("cake", "body")
