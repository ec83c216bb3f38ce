"""Distributed BPE vocabulary learning (Sennrich et al., ACL 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-training step of an LLM data pipeline.

Word-level BPE: the corpus collapses ONCE to a (word, count) table (the
only pass over the full data — per-batch combiners, one narrow word
shuffle), then every merge step runs over the exploded (word, pos, symbol)
table, whose size is bounded by the DISTINCT vocabulary — the property
that makes BPE trainable at corpus scale.

Merge-step semantics (shared bit-for-bit with the SQL twin):

* pair counts are OVERLAPPING adjacent counts weighted by word count
  ('aaa' counts (a,a) twice) — Sennrich's get_stats;
* the winning pair is (count desc, left asc, right asc) — ties pinned;
* application is canonical leftmost-greedy: position i merges iff
  (sym[i], sym[i+1]) == (x, y) and i-1 did not merge. Chains only arise
  when x == y, where leftmost-greedy is exactly "even offset within each
  maximal run" — a closed form both numpy and SQL window functions
  express without sequential scans.

Distribution shape per step: ONE word-bucket co-partition
(`groupby(bucket).map_groups`) both applies the previous winner and emits
pre-combined pair partials for choosing the next (tagged-union output —
symbol rows and pair rows share one table), so each merge costs one
shuffle of the bounded vocabulary table; only distinct (x, y) partials
reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..sources.corpus import hash_det
from .aggregate import pre_aggregate_sum

__all__ = ["bpe_train", "word_counts"]

_SEP = "\x1f"  # pair-row key separator (never in a symbol)


def word_counts(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Corpus → (word, cnt): lowered RE2-\\S+ tokens, per-batch combiner,
    one narrow word shuffle. The final reduce hashes words into 256
    buckets and sums each with ONE pandas groupby — Ray's named Sum
    aggregate pays per-group overhead across |vocab| groups (measured on
    vocab_growth: a 200k-group reduce at 1M docs never finished in 10 min;
    bucketed-vectorized it is seconds)."""
    import re

    ws = re.compile(r"[^ \t\n\f\r]+")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in b[text_col].fillna(""):
            toks.extend(w.lower() for w in ws.findall(t))
        if not toks:
            return pd.DataFrame({"word": pd.Series(dtype="object"), "cnt": []})
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy(np.int64)})

    from .join import coarse_bucket

    def add_gb(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(gb=coarse_bucket([b["word"]], 256))

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", as_index=False)["cnt"].sum()
        s["cnt"] = s["cnt"].astype(np.int64)
        return s[["word", "cnt"]]

    pre = pre_aggregate_sum(
        ds.map_batches(explode, batch_format="pandas"), ["word"], ["cnt"]
    )
    return (
        pre.map_batches(add_gb, batch_format="pandas")
        .groupby("gb")
        .map_groups(bucket_sum, batch_format="pandas")
    )


def _apply_and_count(g: pd.DataFrame, merge: tuple[str, str] | None) -> pd.DataFrame:
    """One bucket group: apply ``merge`` (canonical leftmost-greedy), then
    emit transformed symbol rows + pre-combined pair partials."""
    g = g.sort_values(["word", "pos"], kind="mergesort")
    word = g["word"].to_numpy(dtype=object)
    sym = g["sym"].to_numpy(dtype=object)
    cnt = g["cnt"].to_numpy(dtype=np.int64)

    def next_in_word(arr, w):
        nxt = np.empty(len(arr), dtype=object)
        if len(arr):
            nxt[:-1] = arr[1:]
            nxt[-1] = None
            brk = np.zeros(len(arr), dtype=bool)
            brk[:-1] = w[:-1] != w[1:]
            nxt[brk] = None
        return nxt

    if merge is not None and len(g):
        x, y = merge
        nxt = next_in_word(sym, word)
        m = (sym == x) & (nxt == y)
        if x == y:
            # leftmost-greedy on same-symbol runs = even offset in each run
            idx = np.arange(len(sym))
            r = sym == x
            prev_r = np.zeros(len(sym), dtype=bool)
            prev_r[1:] = r[:-1] & (word[1:] == word[:-1])
            start = r & ~prev_r
            run_start = np.maximum.accumulate(np.where(start, idx, -1))
            offset = idx - run_start
            m &= (offset % 2) == 0
        drop = np.zeros(len(sym), dtype=bool)
        drop[1:] = m[:-1]
        sym = np.where(m, x + y, sym).astype(object)
        keep = ~drop
        word, sym, cnt = word[keep], sym[keep], cnt[keep]

    # dense positions after the merge
    if len(word):
        new_word = np.ones(len(word), dtype=bool)
        new_word[1:] = word[1:] != word[:-1]
        grp = np.cumsum(new_word) - 1
        starts = np.maximum.accumulate(
            np.where(new_word, np.arange(len(word)), -1)
        )
        pos = np.arange(len(word)) - starts
    else:
        pos = np.empty(0, dtype=np.int64)

    sym_rows = pd.DataFrame(
        {"kind": "s", "word": word, "pos": pos.astype(np.int64), "sym": sym, "cnt": cnt}
    )

    # pair partials of the TRANSFORMED state (overlapping adjacency)
    nxt = next_in_word(sym, word)
    has = nxt != None  # noqa: E711 — object-array elementwise None test
    pairs = pd.DataFrame(
        {"key": sym[has] + _SEP + nxt[has], "cnt": cnt[has]}
    )
    if len(pairs):
        pc = pairs.groupby("key", sort=False)["cnt"].sum().reset_index()
        pair_rows = pd.DataFrame(
            {
                "kind": "p",
                "word": "",
                "pos": np.int64(-1),
                "sym": pc["key"],
                "cnt": pc["cnt"].astype(np.int64),
            }
        )
    else:
        pair_rows = sym_rows.iloc[:0]
    return pd.concat([sym_rows, pair_rows], ignore_index=True)


def bpe_train(
    ds: Dataset,
    n_merges: int,
    *,
    text_col: str = "text",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """→ (step, left, right, merged, count): the learned merge table.
    ``count`` is the winning pair's corpus frequency at selection time."""
    wc = word_counts(ds, text_col=text_col)

    def explode_chars(b: pd.DataFrame) -> pd.DataFrame:
        words = b["word"].astype(str).to_numpy(dtype=object)
        cnts = b["cnt"].to_numpy(np.int64)
        lens = np.array([len(w) for w in words])
        word_r = np.repeat(words, lens)
        cnt_r = np.repeat(cnts, lens)
        pos = np.concatenate([np.arange(n) for n in lens]) if len(lens) else np.empty(0, int)
        syms = np.array([c for w in words for c in w], dtype=object)
        bucket = np.array([hash_det(w) % n_buckets for w in word_r], dtype=np.int64)
        return pd.DataFrame(
            {
                "kind": "s",
                "word": word_r,
                "pos": pos.astype(np.int64),
                "sym": syms,
                "cnt": cnt_r,
                "bucket": bucket,
            }
        )

    state = wc.map_batches(explode_chars, batch_format="pandas")
    merge: tuple[str, str] | None = None
    merges: list[dict] = []
    for step in range(n_merges):
        m = merge

        def stepfn(g: pd.DataFrame, m=m) -> pd.DataFrame:
            bucket = int(g["bucket"].iloc[0])
            out = _apply_and_count(g.drop(columns=["bucket"]), m)
            out["bucket"] = np.int64(bucket)
            return out

        out = state.groupby("bucket").map_groups(
            stepfn, batch_format="pandas"
        ).materialize()
        pc = (
            out.map_batches(
                lambda b: b[b["kind"] == "p"][["sym", "cnt"]],
                batch_format="pandas",
            )
            .to_pandas()
            .groupby("sym", sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        if not len(pc):
            break
        lr = pc["sym"].str.split(_SEP, expand=True)
        pc["left"], pc["right"] = lr[0], lr[1]
        pc = pc.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        best = pc.iloc[0]
        merge = (str(best["left"]), str(best["right"]))
        merges.append(
            {
                "step": np.int64(step + 1),
                "left": merge[0],
                "right": merge[1],
                "merged": merge[0] + merge[1],
                "count": np.int64(best["cnt"]),
            }
        )
        state = out.map_batches(
            lambda b: b[b["kind"] == "s"], batch_format="pandas"
        )
    return pd.DataFrame(
        merges, columns=["step", "left", "right", "merged", "count"]
    )


def bpe_vocab(
    ds: Dataset,
    n_merges: int,
    *,
    text_col: str = "text",
    n_buckets: int = 32,
    top_k: int = 20,
) -> pd.DataFrame:
    """Train ``n_merges`` merges, APPLY them all, and return the resulting
    subword vocabulary's corpus frequencies → (token, cnt) top_k by
    (cnt desc, token). The encode side of :func:`bpe_train` — one extra
    co-partition pass applies the final winner, then token counts reduce
    through per-group combiners (distinct symbols only cross)."""
    wc = word_counts(ds, text_col=text_col)

    # train (same loop as bpe_train, kept inline to reuse the state)
    merges = bpe_train(ds, n_merges, text_col=text_col, n_buckets=n_buckets)

    def explode_apply(b: pd.DataFrame) -> pd.DataFrame:
        # whole words arrive per row, so every merge applies batch-locally
        words = b["word"].astype(str).to_numpy(dtype=object)
        cnts = b["cnt"].to_numpy(np.int64)
        lens = np.array([len(w) for w in words])
        word_r = np.repeat(words, lens)
        cnt_r = np.repeat(cnts, lens)
        pos = (
            np.concatenate([np.arange(n) for n in lens])
            if len(lens)
            else np.empty(0, int)
        )
        syms = np.array([c for w in words for c in w], dtype=object)
        g = pd.DataFrame(
            {"word": word_r, "pos": pos.astype(np.int64), "sym": syms, "cnt": cnt_r}
        )
        for _, m in merges.iterrows():
            g = _apply_and_count(g, (str(m["left"]), str(m["right"])))
            g = g[g["kind"] == "s"][["word", "pos", "sym", "cnt"]]
        out = g.groupby("sym", sort=False)["cnt"].sum().reset_index()
        return pd.DataFrame({"token": out["sym"], "cnt": out["cnt"].astype(np.int64)})

    from ray.data.aggregate import Sum

    rows = (
        wc.map_batches(explode_apply, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    rows = rows.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="mergesort"
    ).head(top_k)
    rows["cnt"] = rows["cnt"].astype(np.int64)
    return rows[["token", "cnt"]].reset_index(drop=True)
