"""Ranking-comparison operators: rank-biased overlap (RBO) and team-draft
interleaving — the offline and online halves of "is ranker B better than
ranker A?".

* **RBO** (Webber, Moffat & Zobel, TOIS 2010 "A similarity measure for
  indefinite rankings"): top-weighted agreement between two rankings,
  ``RBO@k = Σ_{d=1..k} (1-p)·p^(d-1)·|A_{:d} ∩ B_{:d}|/d``. This is the
  prefix (minimal) form truncated at depth k — the number an index
  migration / ranker rollout diffs its before/after top-k lists with.
* **Team-draft interleaving** (Radlinski, Kurup & Joachims, CIKM 2008):
  merge two rankings like schoolyard team picking — the team with fewer
  picks drafts its best not-yet-picked document; ties flip a coin — then
  credit user clicks to the team that contributed the clicked document.
  The online A/B primitive for rankers sharing one result page.

Numerics/determinism contract (the repo-wide exact-parity rule):

* RBO terms are EXACT integers: with ``p = p_num/p_den`` rational, the
  depth-d term is ``ov_d·p_num^(d-1)·10^6 / (p_den^d·d)``, computed in
  unbounded Python ints with round-half-away and summed exactly — no
  float ``pow`` whose libm could disagree with the SQL twin's. DuckDB
  replays it in HUGEINT.
* The interleave coin is ``md5_number_lower('<salt>:<step>') % 2`` — the
  same deterministic PRF every sketch in this repo uses, so the draft is
  replayable row-for-row by an unrolled SQL twin.

Scale shape: both operators consume already-reduced top-k lists (driver-
sized by construction, like ``query/fusion.py``); at fleet scale they run
per query inside ``groupby(qid).map_groups`` over millions of queries.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["rbo_table", "team_draft_interleave"]


def _md5_low64(s: str) -> int:
    """Unsigned lower-64 of md5, little-endian — byte-for-byte DuckDB's
    ``md5_number_lower`` (the repo's standard SQL-reproducible PRF)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def rbo_table(
    a_ids,
    b_ids,
    *,
    p_num: int = 9,
    p_den: int = 10,
    k: int | None = None,
) -> pd.DataFrame:
    """Per-depth RBO decomposition of two ranked id lists →
    ``(depth, overlap, term_micros, rbo_cum_micros)``; the final row's
    ``rbo_cum_micros`` is RBO@k in exact fixed-point (each depth term
    rounded half-away to micros, then integer-summed — within k·0.5e-6 of
    the real-valued prefix RBO, and bit-identical on both engines)."""
    a = [int(x) for x in a_ids]
    b = [int(x) for x in b_ids]
    if k is None:
        k = min(len(a), len(b))
    seen_a: set[int] = set()
    seen_b: set[int] = set()
    rows = []
    cum = 0
    for d in range(1, k + 1):
        seen_a.add(a[d - 1])
        seen_b.add(b[d - 1])
        ov = len(seen_a & seen_b)
        # ov · (1-p) · p^(d-1) / d  with p = p_num/p_den, in micros:
        # numerator ov·(p_den-p_num)·p_num^(d-1)·10^6 over p_den^d·d,
        # round-half-away via the (2x+1)//2 trick — all unbounded ints
        num = ov * (p_den - p_num) * p_num ** (d - 1) * 1_000_000
        den = p_den**d * d
        term = (2 * num // den + 1) // 2
        cum += term
        rows.append((d, ov, term, cum))
    return pd.DataFrame(
        rows, columns=["depth", "overlap", "term_micros", "rbo_cum_micros"]
    ).astype("int64")


def team_draft_interleave(
    a_ids,
    b_ids,
    *,
    k: int,
    salt: str = "td",
) -> pd.DataFrame:
    """Team-draft interleave of two ranked id lists →
    ``(pos, doc_id, team)`` with ``team ∈ {'A','B'}`` crediting the list
    that contributed each slot. Draft rule per slot: the team with fewer
    picks drafts; on a tie the deterministic coin
    ``md5_number_lower(f'{salt}:{step}') % 2`` decides (0 → A). A team
    whose list is exhausted cedes the slot (and its credit) to the other.
    Each document appears once — the second list's duplicate of an
    already-placed doc is skipped, as the algorithm requires."""
    a = [int(x) for x in a_ids]
    b = [int(x) for x in b_ids]
    picked: list[int] = []
    teams: list[str] = []
    chosen: set[int] = set()
    na = nb = 0
    while len(picked) < k:
        cand_a = next((x for x in a if x not in chosen), None)
        cand_b = next((x for x in b if x not in chosen), None)
        if cand_a is None and cand_b is None:
            break
        if na < nb:
            turn = "A"
        elif nb < na:
            turn = "B"
        else:
            turn = "A" if _md5_low64(f"{salt}:{len(picked)}") % 2 == 0 else "B"
        if turn == "A" and cand_a is None:
            turn = "B"
        elif turn == "B" and cand_b is None:
            turn = "A"
        doc = cand_a if turn == "A" else cand_b
        assert doc is not None
        picked.append(doc)
        teams.append(turn)
        chosen.add(doc)
        if turn == "A":
            na += 1
        else:
            nb += 1
    return pd.DataFrame(
        {
            "pos": np.arange(1, len(picked) + 1, dtype=np.int64),
            "doc_id": np.array(picked, dtype=np.int64),
            "team": teams,
        }
    )
