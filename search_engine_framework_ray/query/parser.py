"""Structured query parser — stack machine replicating every quirk of the
reference's ``QryEval.parseQuery`` (QryEval.java:540-735):

* tokenized on ``\\t\\n\\r ,()`` with delimiters significant;
* model default wrap: boolean → ``#or(q)``, BM25 → ``#sum(q)``,
  Indri → ``#and(q)`` (QryEval.java:550-564);
* ``#wand``/``#wsum`` weight handling: weight precedes each argument; a
  pending weight is pushed on a weight stack when a nested weighted operator
  opens, and restored when it closes (QryEval.java:588-600, 648-663);
* a stopword argument **drops its pending weight** (QryEval.java:700-703,
  717-719);
* empty operators are dropped — but a weight already attached to a dropped
  empty operator is kept (the reference appends the weight before checking
  ``arg.args.size()``; replicated faithfully);
* multi-token query words keep only the first analyzed token
  (QryEval.java:694,711);
* field suffix matched against ``url keywords title inlink body``
  (QryEval.java:529, 687-707), default field ``body``;
* once the outermost operator closes, parsing stops; trailing tokens make the
  query invalid (→ None, QryEval.java:727-733).
"""

from __future__ import annotations

import re

from ..functions.analysis import DEFAULT_ANALYZER, AnalyzerConfig, analyze
from .ast import (
    AndNotOp,
    AndOp,
    Near,
    Node,
    OrOp,
    SumOp,
    Syn,
    Term,
    WandOp,
    Window,
    WsumOp,
    wrap_scores,
)

TERM_FIELDS = ("url", "keywords", "title", "inlink", "body")

_TOKEN_RE = re.compile(r"[\t\n\r ,()]|[^\t\n\r ,()]+")

MODELS = ("UnrankedBoolean", "RankedBoolean", "BM25", "Indri", "PL2")
BOOLEAN_MODELS = ("UnrankedBoolean", "RankedBoolean")


def _default_wrap(qtext: str, model: str) -> str:
    q = qtext.strip()
    if model in BOOLEAN_MODELS:
        return f"#or({q})"
    if model in ("BM25", "PL2"):  # additive bag-of-words models → #sum
        return f"#sum({q})"
    if model == "Indri":
        return f"#and({q})"
    raise ValueError(f"unknown retrieval model {model!r}")


def _add_weight(op: Node, w: float) -> None:
    op.weights.append(w)


def parse_query(
    qtext: str,
    model: str,
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
) -> Node | None:
    """Parse one query into a score-wrapped AST; None on broken syntax."""
    root = _parse_tokens(_default_wrap(qtext, model), analyzer)
    return wrap_scores(root) if root is not None else None


def parse_il_query(
    qtext: str,
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
) -> Node | None:
    """Parse a RAW inverted-list query — no default model wrap, no score
    wrap — for the reference's Il-root output path (QryEval.java:295-314:
    a result whose root evaluates to an InvList is emitted with tf as the
    score). Returns an Il-rooted tree (Term/#SYN/#NEAR/#WINDOW) or None."""
    q = qtext.strip()
    if not q.startswith("#"):  # bare term (possibly field-qualified)
        fieldname = "body"
        raw = q
        for f in TERM_FIELDS:
            if q.endswith("." + f):
                fieldname = f
                raw = q[: -(len(f) + 1)]
                break
        terms = analyze(raw, analyzer)
        return Term(terms[0], fieldname) if terms else None
    root = _parse_tokens(q, analyzer)
    return root if isinstance(root, (Term, Syn, Near, Window)) else None


def _parse_tokens(
    qstring: str,
    analyzer: AnalyzerConfig,
) -> Node | None:
    """Stack-machine parse of an operator-rooted query string → root op."""
    tokens = _TOKEN_RE.findall(qstring)
    stack: list[Node] = []
    current: Node | None = None
    has_weight = False
    got_weight = False
    weight = 0.0
    w_stack: list[float] = []

    i = 0
    n = len(tokens)
    closed = False
    while i < n:
        token = tokens[i]
        i += 1
        low = token.lower()
        if token in " ,(\t\n\r":
            continue
        elif low == "#wand" or low == "#wsum":
            current = WandOp() if low == "#wand" else WsumOp()
            stack.append(current)
            if got_weight:
                w_stack.append(weight)
                got_weight = False
            has_weight = True
        elif low in ("#sum", "#and", "#syn", "#or", "#andnot"):
            has_weight = False
            current = {
                "#sum": SumOp, "#and": AndOp, "#syn": Syn, "#or": OrOp,
                "#andnot": AndNotOp,
            }[low]()
            stack.append(current)
        elif low.startswith("#near/"):
            has_weight = False
            try:
                current = Near(dist=int(token.split("/")[1]))
            except ValueError:
                return None
            stack.append(current)
        elif low.startswith("#window/"):
            has_weight = False
            try:
                current = Window(width=int(token.split("/")[1]))
            except ValueError:
                return None
            stack.append(current)
        elif token.startswith(")"):
            if not stack:
                return None  # stray ')' before any operator opened
            if isinstance(current, (WandOp, WsumOp)):
                has_weight = False
            stack.pop()
            if not stack:
                closed = True
                break
            arg = current
            current = stack[-1]
            if isinstance(current, (WandOp, WsumOp)):
                has_weight = True
                if w_stack and not got_weight:
                    weight = w_stack.pop()
                    got_weight = True
                if got_weight:
                    _add_weight(current, weight)
                    got_weight = False
            if getattr(arg, "args", None):
                current.args.append(arg)
        else:
            if current is None:
                # term (or unknown '#op' token) before any operator opened —
                # only reachable from parse_il_query's raw strings; broken
                return None
            if has_weight and not got_weight:
                try:
                    weight = float(token)
                except ValueError:
                    return None  # reference: uncaught NumberFormatException
                got_weight = True
                continue
            fieldname = "body"
            raw = token
            for f in TERM_FIELDS:
                if token.endswith("." + f):
                    fieldname = f
                    raw = token[: -(len(f) + 1)]
                    break
            terms = analyze(raw, analyzer)
            if terms:
                current.args.append(Term(terms[0], fieldname))
                if has_weight and got_weight:
                    _add_weight(current, weight)
                    got_weight = False
            else:
                if has_weight:
                    got_weight = False  # stopword arg: weight dropped

    if closed and i < n:
        return None  # unprocessed trailing tokens → broken query
    return current


def read_query_file(path: str) -> list[tuple[str, str]]:
    """``qid:querytext`` lines (QryEval.java:160-164, 203)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            qid, _, text = line.partition(":")
            out.append((qid.strip(), text))
    return out
