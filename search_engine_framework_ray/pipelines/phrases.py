"""Materialized phrase postings — the classic web-search acceleration for
high-traffic phrase queries (next-word / phrase indexes; Williams, Zobel &
Bahle, ACM TOIS 2004). ``#NEAR/1(a b)`` evaluated at query time costs two
posting-list decodes plus a positional intersection per candidate doc; a
10^12-doc deployment materializes the posting lists of its hot phrases
(typically the top collocations — see ``stages/corpus.py collocations``) at
build time, turning each hot phrase query into ONE pruned metadata read.

Exactness contract: the per-doc phrase tf is computed by the REAL
``query/kernels.py _near_match`` cursor kernel over positions from the REAL
``analyze_positions`` chain (gap-preserving stopword slots), so the
materialized table can never diverge from the query engine — the driver
entry's oracle is ``near1_tf``'s SQL **verbatim**, and the value hash proves
the acceleration exact (the same share-the-oracle pattern the salted
window/join paths use).

Distribution shape: one streaming ``map_batches`` pass over the corpus
(phrase list rides the closure — it is bounded and small), per-doc
term→positions dict built once and probed per phrase, output partitioned
Parquet with a fingerprint marker (re-runs are metadata no-ops). No shuffle:
rows are already (phrase, doc) granular and readers filter by phrase.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.analysis import AnalyzerConfig, DEFAULT_ANALYZER, analyze_positions
from ..query.kernels import _near_match


def build_phrase_postings(
    corpus_path: str,
    out_dir: str,
    phrases: list[tuple[str, str]],
    *,
    analyzer: AnalyzerConfig = DEFAULT_ANALYZER,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Materialize ``#NEAR/1`` postings for ``phrases`` (ANALYZED term
    pairs) over the corpus → ``out_dir`` Parquet ``(phrase, doc_id, tf)``.
    Fingerprint-resumable: an up-to-date store is a metadata no-op."""
    fp = hashlib.sha256(
        json.dumps(
            {
                "corpus": os.path.abspath(corpus_path),
                "phrases": sorted(map(list, phrases)),
                "analyzer": analyzer.key(),
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()
    marker = os.path.join(out_dir, "_phrase_manifest.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh).get("fingerprint") == fp:
                return out_dir
        shutil.rmtree(out_dir, ignore_errors=True)

    pairs = [(str(a), str(b)) for a, b in phrases]

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"phrase": [], "doc_id": [], "tf": []}
        for did, text in zip(batch[id_col], batch[text_col]):
            terms, positions = analyze_positions(str(text), analyzer)
            bypos: dict[str, list[int]] = {}
            for t, p in zip(terms, positions):
                bypos.setdefault(t, []).append(p)
            for a, b in pairs:
                pa_, pb_ = bypos.get(a), bypos.get(b)
                if not pa_ or not pb_:
                    continue
                res = _near_match(
                    [np.asarray(pa_, dtype=np.int64), np.asarray(pb_, dtype=np.int64)],
                    1,
                )
                if res:
                    out["phrase"].append(f"{a} {b}")
                    out["doc_id"].append(int(did))
                    out["tf"].append(len(res))
        df = pd.DataFrame(out)
        df["doc_id"] = df["doc_id"].astype("int64")
        df["tf"] = df["tf"].astype("int64")
        return df

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    (
        ray.data.read_parquet(corpus_path, columns=[id_col, text_col])
        .map_batches(extract, batch_format="pandas")
        .write_parquet(tmp)
    )
    if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
        # no phrase matched anywhere: a valid (empty) store, not an error
        import pyarrow as pa
        import pyarrow.parquet as papq

        papq.write_table(
            pa.table(
                {
                    "phrase": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            ),
            os.path.join(tmp, "empty.parquet"),
        )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    with open(marker, "w") as fh:
        json.dump({"fingerprint": fp}, fh)
    return out_dir


def phrase_tf(store_dir: str, phrase: str) -> pd.DataFrame:
    """Pruned read of one phrase's posting list → (doc_id, tf), docid-asc —
    the accelerated equivalent of evaluating ``#NEAR/1(a b)``."""
    import pyarrow.dataset as pads

    dset = pads.dataset(
        [
            os.path.join(store_dir, f)
            for f in sorted(os.listdir(store_dir))
            if f.endswith(".parquet")
        ]
    )
    t = dset.to_table(
        columns=["doc_id", "tf"], filter=pads.field("phrase") == phrase
    )
    return (
        t.to_pandas().sort_values("doc_id").reset_index(drop=True).astype("int64")
    )
