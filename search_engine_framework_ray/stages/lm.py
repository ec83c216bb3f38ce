"""Corpus-trained n-gram language-model scoring — the CCNet-style quality
signal for LLM training data: fit a Laplace-smoothed bigram model on the
corpus, then score every document by its bigram cross-entropy (log
perplexity). Low-perplexity ≈ fluent/common text; high ≈ gibberish,
boilerplate, wrong-language — the usual keep/drop axis.

Model: ``P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with ``V`` the
distinct-token vocabulary size; a document's score is the mean negative
log-probability (nats) over its ``n_tokens - 1`` bigram positions.

Scale shape (everything is counts-join-counts, nothing is broadcast)
--------------------------------------------------------------------
At web scale the bigram table itself is corpus-sized (billions of rows),
so no stage may assume the model fits anywhere:

1. **Count**: one streaming pass; per-batch pandas ``value_counts``
   partials (the combiner), then ONE narrow ``groupby.sum`` shuffle — a
   Zipf-hot bigram contributes one row per input block, never one per
   occurrence.
2. **Join**: both joins (attach history counts to bigrams; attach model
   rows to per-doc bigrams) are the repo's hash-BUCKET shuffle (the
   termstats pattern from pipelines/build_index.py): tag the two sides,
   ONE ``groupby(bucket)`` exchange, vectorized ``pandas.merge`` inside
   each bucket. Bucket sizes are hash-balanced, so a Zipf-hot *history*
   word w1 costs one large-but-bounded bucket, not a hot single-key
   group. (``Dataset.join`` was measured equivalent at sf scale but its
   per-partition Arrow join rejects the schema-less empty partitions
   that tiny inputs produce — the bucket join has no such edge.)
3. **Score**: per-row ``n · ln P`` then ``groupby(doc_id).sum``.

Tokenization is the RE2-aligned class from stages/textstats.py, so a
DuckDB oracle (explode → count → join → aggregate, the same dataflow in
SQL) reproduces every count and — with float64 ``ln`` — the scores to
within rounding of integer micros.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .textstats import RE2_TOKEN_RE

_JPOLY = np.uint64(0x100000001B3)


def _key_hash(b: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Deterministic (cross-process) uint64 hash of the key columns:
    per-column siphash, rolling-polynomial combine — all vectorized."""
    h = np.zeros(len(b), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = h * _JPOLY + pd.util.hash_array(b[k].to_numpy(object))
    return h


def _bucket_join(left_ds, right_ds, keys, fills_l, fills_r, num_buckets=64):
    """Inner join via ONE hash-bucket groupby: both sides are tagged and
    padded to a shared schema (``fills_x`` supply neutral values for the
    columns a side lacks), shuffled by ``hash(keys) % num_buckets``, then
    merged vectorized per bucket. Returns left_cols ∪ right_cols."""
    cols = list(
        dict.fromkeys(keys + list(fills_r.keys()) + list(fills_l.keys()))
    )
    left_cols = keys + [c for c in fills_r if c not in keys]
    right_cols = keys + [c for c in fills_l if c not in keys]

    def prep(kind: int, fills: dict):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {c: (b[c] if c not in fills else fills[c]) for c in cols}
            )
            out["jb"] = (_key_hash(b, keys) % np.uint64(num_buckets)).astype(
                "int64"
            )
            out["kind"] = np.int64(kind)
            return out

        return f

    tagged = left_ds.map_batches(
        prep(0, fills_l), batch_format="pandas"
    ).union(right_ds.map_batches(prep(1, fills_r), batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["kind"] == 0, left_cols]
        r = g.loc[g["kind"] == 1, right_cols]
        return l.merge(r, on=keys)

    return tagged.groupby("jb").map_groups(merge, batch_format="pandas")


def _doc_bigrams(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Vectorized (doc_id, w1, w2, n) partials for one batch: explode the
    token lists, pair each token with its within-doc successor via a
    grouped shift, count duplicates with one groupby."""
    words = batch[text_col].fillna("").str.findall(RE2_TOKEN_RE)
    ex = words.explode().dropna()
    if ex.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "w1": pd.Series(dtype="object"),
                "w2": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
            }
        )
    nxt = ex.groupby(level=0).shift(-1)
    mask = nxt.notna()
    df = pd.DataFrame(
        {
            "doc_id": batch["doc_id"].reindex(ex.index[mask]).astype("int64"),
            "w1": ex[mask].astype(str),
            "w2": nxt[mask].astype(str),
        }
    )
    out = (
        df.groupby(["doc_id", "w1", "w2"], sort=False).size().rename("n").reset_index()
    )
    out["n"] = out["n"].astype("int64")
    return out


def _unigram_partial(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    ex = batch[text_col].fillna("").str.findall(RE2_TOKEN_RE).explode().dropna()
    vc = ex.value_counts(sort=False)
    return pd.DataFrame({"w1": vc.index.astype(str), "c": vc.to_numpy("int64")})


def bigram_model(ds, text_col: str = "text", num_buckets: int = 64):
    """Fit the model over ``ds``. Returns ``(model_ds, vocab_size)`` where
    ``model_ds`` has one row per distinct corpus bigram:
    ``(w1, w2, cb, cu)`` = bigram count + history's unigram count."""
    uni = (
        ds.map_batches(
            lambda b: _unigram_partial(b, text_col), batch_format="pandas"
        )
        .groupby("w1")
        .sum("c")
        # rename via map_batches: rename_columns assumes Arrow blocks and
        # groupby-sum emits pandas blocks on this Ray version
        .map_batches(
            lambda b: b.rename(columns={"sum(c)": "cu"}), batch_format="pandas"
        )
        # materialized: vocab-sized (≪ corpus; spillable), and consumed
        # twice below (count + join) — without this the whole unigram
        # count pass would re-execute per consumer
        .materialize()
    )
    bg = (
        ds.map_batches(
            lambda b: _doc_bigrams(b, text_col).groupby(["w1", "w2"], sort=False)[
                "n"
            ]
            .sum()
            .reset_index(),
            batch_format="pandas",
        )
        .groupby(["w1", "w2"])
        .sum("n")
        .map_batches(
            lambda b: b.rename(columns={"sum(n)": "cb"}), batch_format="pandas"
        )
    )
    # vocab size is ONE scalar — an aggregate, not a materialization
    vocab = uni.count()
    model = _bucket_join(
        bg,
        uni,
        keys=["w1"],
        fills_l={"cu": np.int64(0)},      # columns only the RIGHT side has
        fills_r={"w2": "", "cb": np.int64(0)},  # columns only the LEFT side has
        num_buckets=num_buckets,
    )
    return model, vocab


def score_bigram_ppl(
    ds,
    model,
    vocab_size: int,
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Score every doc in ``ds`` against a fitted model. Returns a Dataset
    ``(doc_id, n_bigrams, logppl)`` — mean negative ln-probability (nats)
    over the doc's bigram positions; docs with < 2 tokens are dropped
    (they have no bigram positions to score)."""
    doc_bg = ds.map_batches(
        lambda b: _doc_bigrams(b, text_col), batch_format="pandas"
    )
    # inner join is lossless when the model was trained on (a superset of)
    # ds: every doc bigram then exists in the model by construction
    joined = _bucket_join(
        doc_bg,
        model,
        keys=["w1", "w2"],
        fills_l={"cb": np.int64(0), "cu": np.int64(0)},
        fills_r={"doc_id": np.int64(0), "n": np.int64(0)},
        num_buckets=num_buckets,
    )
    V = float(vocab_size)

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        lp = np.log(
            (b["cb"].to_numpy(np.float64) + 1.0)
            / (b["cu"].to_numpy(np.float64) + V)
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n": b["n"].astype("int64"),
                "nlp": -lp * b["n"].to_numpy(np.float64),
            }
        )

    per_doc = (
        joined.map_batches(_score, batch_format="pandas")
        .groupby("doc_id")
        .sum(["n", "nlp"])
        .map_batches(
            lambda b: b.rename(
                columns={"sum(n)": "n_bigrams", "sum(nlp)": "nlp_sum"}
            ),
            batch_format="pandas",
        )
    )

    def _final(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_bigrams": b["n_bigrams"].astype("int64"),
                "logppl": b["nlp_sum"].to_numpy(np.float64)
                / b["n_bigrams"].to_numpy(np.float64),
            }
        )
        return out

    return per_doc.map_batches(_final, batch_format="pandas")


def bigram_ppl(ds, text_col: str = "text", num_buckets: int = 64):
    """Fused train-and-score path (the production shape when the model is
    not reused): identical math to ``bigram_model`` + ``score_bigram_ppl``
    but TWO all-to-alls instead of five —

    1. a vocab-sized distinct-count pass for ``V``;
    2. ONE ``hash(w1) % num_buckets`` shuffle carrying both partial kinds
       (per-batch unigram counts AND per-doc bigram counts). A bucket owns
       every row for its ``w1`` values, so ``cu``, ``cb`` and each doc's
       ``n·ln P`` contributions are all computed vectorized inside it,
       pre-aggregated per doc before leaving;
    3. the final ``groupby(doc_id)`` then sums ≤ num_buckets partial rows
       per doc — narrow by construction.

    Per-bucket memory is O(corpus bigram partials / num_buckets): size
    ``num_buckets`` to the cluster exactly like the index build sizes
    shards (docs AND bytes), not to CPU count.
    """
    # pass 1: V (distinct tokens) — per-batch dedup, narrow distinct-count
    V_count = (
        ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "w1": b[text_col]
                    .fillna("")
                    .str.findall(RE2_TOKEN_RE)
                    .explode()
                    .dropna()
                    .astype(str)
                    .unique()
                }
            ),
            batch_format="pandas",
        )
        .groupby("w1")
        .count()
        .count()
    )
    V = float(V_count)

    # pass 2: both partial kinds, tagged, one bucket shuffle
    def partials(b: pd.DataFrame) -> pd.DataFrame:
        doc = _doc_bigrams(b, text_col)
        uni = _unigram_partial(b, text_col)
        left = pd.DataFrame(
            {
                "kind": np.int64(1),
                "w1": doc["w1"],
                "w2": doc["w2"],
                "doc_id": doc["doc_id"],
                "n": doc["n"],
            }
        )
        right = pd.DataFrame(
            {
                "kind": np.int64(0),
                "w1": uni["w1"],
                "w2": "",
                "doc_id": np.int64(-1),
                "n": uni["c"],
            }
        )
        out = pd.concat([left, right], ignore_index=True)
        out["jb"] = (
            _key_hash(out, ["w1"]) % np.uint64(num_buckets)
        ).astype("int64")
        return out

    def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
        doc = g[g["kind"] == 1]
        if doc.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                    "nlp": pd.Series(dtype="float64"),
                }
            )
        uni = g[g["kind"] == 0].groupby("w1")["n"].sum()
        cb = doc.groupby(["w1", "w2"], sort=False)["n"].sum().rename("cbv")
        doc = doc.merge(cb.reset_index(), on=["w1", "w2"])
        cu = doc["w1"].map(uni).to_numpy(np.float64)
        lp = np.log((doc["cbv"].to_numpy(np.float64) + 1.0) / (cu + V))
        part = pd.DataFrame(
            {
                "doc_id": doc["doc_id"].to_numpy(np.int64),
                "n": doc["n"].to_numpy(np.int64),
                "nlp": -lp * doc["n"].to_numpy(np.float64),
            }
        )
        # pre-aggregate per doc before the narrow final shuffle
        out = part.groupby("doc_id", sort=False)[["n", "nlp"]].sum().reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    per_doc = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("jb")
        .map_groups(bucket_score, batch_format="pandas")
        .groupby("doc_id")
        .sum(["n", "nlp"])
    )

    def _final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_bigrams": b["sum(n)"].astype("int64"),
                "logppl": b["sum(nlp)"].to_numpy(np.float64)
                / b["sum(n)"].to_numpy(np.float64),
            }
        )

    return per_doc.map_batches(_final, batch_format="pandas")
