"""Query-operator AST (the reference's ``Qryop`` tree, ``Qryop.java:15-91``)
as plain dataclasses — driver-side, picklable, shipped to query actors.

Il nodes (inverted-list algebra): Term, Syn, Near, Window.
Sl nodes (score-list algebra): ScoreNode (implicit #SCORE wrapper), AndOp,
OrOp, SumOp, WandOp, WsumOp. Sl parents auto-wrap Il children in ScoreNode at
evaluation time (``QryopSl.allocDaaTPtrs``, QryopSl.java:27-39) — here we wrap
at parse finalization so every scored leaf gets a stable ``score_id`` used to
aggregate its global (df, ctf) across shards.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    pass


@dataclass
class Term(Node):
    term: str
    fieldname: str = "body"  # default field (QryopIlTerm.java:27)


@dataclass
class Syn(Node):
    args: list[Node] = field(default_factory=list)


@dataclass
class Near(Node):
    dist: int = 1
    args: list[Node] = field(default_factory=list)


@dataclass
class Window(Node):
    width: int = 1
    args: list[Node] = field(default_factory=list)


@dataclass
class ScoreNode(Node):
    """#SCORE wrapper over an Il child. ``score_id`` identifies this scored
    leaf for cross-shard (df, ctf) aggregation (SURVEY.md §3.1: shard scores
    must use global stats to be merge-exact)."""

    child: Node = None
    score_id: int = -1


@dataclass
class AndOp(Node):
    args: list[Node] = field(default_factory=list)


@dataclass
class OrOp(Node):
    args: list[Node] = field(default_factory=list)


@dataclass
class AndNotOp(Node):
    """#ANDNOT(pos neg...) — boolean exclusion: docs matching the FIRST
    arg with every later arg's docs removed; survivors keep the first
    arg's score. An operator-registry extension (the reference's Qryop
    subclass + parser-branch seam, Qryop.java:15-91 / QryEval.java:585-637
    — the reference itself ships no NOT; this is the standard complement
    every production boolean engine adds). Boolean models only."""

    args: list[Node] = field(default_factory=list)


@dataclass
class SumOp(Node):
    args: list[Node] = field(default_factory=list)


@dataclass
class WandOp(Node):
    weights: list[float] = field(default_factory=list)
    args: list[Node] = field(default_factory=list)


@dataclass
class WsumOp(Node):
    weights: list[float] = field(default_factory=list)
    args: list[Node] = field(default_factory=list)


IL_TYPES = (Term, Syn, Near, Window)
SL_TYPES = (ScoreNode, AndOp, AndNotOp, OrOp, SumOp, WandOp, WsumOp)
WEIGHTED_TYPES = (WandOp, WsumOp)


def wrap_scores(node: Node, counter: list[int] | None = None) -> Node:
    """Wrap Il children of Sl operators in ScoreNode, assigning score_ids in
    deterministic left-to-right order. Idempotent on already-wrapped trees."""
    if counter is None:
        counter = [0]
    if isinstance(node, IL_TYPES):
        return node
    if isinstance(node, ScoreNode):
        node.score_id = counter[0]
        counter[0] += 1
        return node
    new_args = []
    for a in node.args:
        if isinstance(a, IL_TYPES):
            sn = ScoreNode(child=a, score_id=counter[0])
            counter[0] += 1
            new_args.append(sn)
        else:
            new_args.append(wrap_scores(a, counter))
    node.args = new_args
    return node


def iter_terms(node: Node):
    """All Term leaves of a tree."""
    if isinstance(node, Term):
        yield node
        return
    if isinstance(node, ScoreNode):
        yield from iter_terms(node.child)
        return
    for a in getattr(node, "args", []):
        yield from iter_terms(a)


def iter_score_nodes(node: Node):
    if isinstance(node, ScoreNode):
        yield node
        return
    for a in getattr(node, "args", []):
        yield from iter_score_nodes(a)


def to_string(node: Node) -> str:
    """Canonical string form (debugging / expansion-query writer)."""
    if isinstance(node, Term):
        return f"{node.term}.{node.fieldname}" if node.fieldname != "body" else node.term
    if isinstance(node, ScoreNode):
        return to_string(node.child)
    if isinstance(node, Near):
        inner = " ".join(to_string(a) for a in node.args)
        return f"#NEAR/{node.dist}({inner})"
    if isinstance(node, Window):
        inner = " ".join(to_string(a) for a in node.args)
        return f"#WINDOW/{node.width}({inner})"
    name = {Syn: "#SYN", AndOp: "#AND", OrOp: "#OR", SumOp: "#SUM"}.get(type(node))
    if name:
        return f"{name}({' '.join(to_string(a) for a in node.args)})"
    name = {WandOp: "#WAND", WsumOp: "#WSUM"}[type(node)]
    parts = []
    for w, a in zip(node.weights, node.args):
        parts.append(f"{w:g} {to_string(a)}")
    return f"{name}({' '.join(parts)})"
