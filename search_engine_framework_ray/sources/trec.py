"""TREC run-file writer/reader (reference writer ``QryEval.java:268-318``,
initial-ranking reader ``QryExpansion.java:240-286``)."""

from __future__ import annotations


def format_trec_run(
    results: dict[str, list[tuple[str, float, int]]],
    qid_order: list[str],
    is_ranked: bool,
    tag: str = "Run",
    k: int = 100,
) -> str:
    """``qid Q0 externalId rank score tag`` lines, top-k per query; the
    reference's ``dummy`` row when a query has no results (QryEval.java:274);
    unranked runs report score 1.0 regardless (QryEval.java:289-296)."""
    lines = []
    for qid in qid_order:
        rows = results.get(qid, [])
        if not rows:
            lines.append(f"{qid} Q0 dummy 1 0 None")
            continue
        for rank, (url, score, _docid) in enumerate(rows[:k], start=1):
            s = repr(float(score)) if is_ranked else "1.0"
            lines.append(f"{qid} Q0 {url} {rank} {s} {tag}")
    return "\n".join(lines) + "\n"


def write_trec_run(path: str, *args, **kwargs) -> None:
    with open(path, "w") as f:
        f.write(format_trec_run(*args, **kwargs))


def read_trec_run(path: str) -> dict[str, list[tuple[str, float]]]:
    """→ qid → [(externalId, score)] in file order (used as the feedback
    initial ranking, fbInitialRankingFile)."""
    out: dict[str, list[tuple[str, float]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            qid, _, extid, _, score = parts[0], parts[1], parts[2], parts[3], parts[4]
            out.setdefault(qid, []).append((extid, float(score)))
    return out
