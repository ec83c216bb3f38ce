"""Shard writer (build side) and mmap'd shard reader (query side).

A shard is the unit of build parallelism, query parallelism and resume: one
contiguous docid range, all fields/terms for its documents, built by exactly
one Ray task and read by query actors via ``np.memmap`` (loaded once per
actor — the Ray equivalent of the reference's global static ``READER``,
``QryEval.java:54,102``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.analysis import AnalyzerConfig, analyze_positions
from ..functions.codec import decode_postings, encode_postings, read_headers
from .index_layout import FIELDS, docmap_path, shard_dir

TERMS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("ctf", pa.int64()),
        ("offset", pa.int64()),
        ("nbytes", pa.int64()),
    ]
)


def fingerprint_inputs(urls: list[str], texts_hash: "hashlib._Hash", analyzer_key: str) -> str:
    h = hashlib.sha256()
    h.update(analyzer_key.encode())
    for u in urls:
        h.update(u.encode())
    h.update(texts_hash.digest())
    return h.hexdigest()


def build_shard(
    index_dir: str,
    shard: int,
    docid_base: int,
    urls: list[str],
    field_texts: dict[str, list[str]],
    analyzer: AnalyzerConfig,
    fingerprint: str,
    block_size: int = 128,
    include_forward: bool = True,
) -> pa.Table:
    """Tokenize every (doc, field), build in-memory postings (SPIMI — the
    whole shard is one in-memory segment; shard size is chosen so this fits a
    worker's heap), encode, and atomically write the shard directory.

    Returns the shard-local termstats table ``(field, term, df, ctf)`` that
    feeds the global stats groupby.
    """
    t0 = time.monotonic()
    n = len(urls)
    sdir = shard_dir(index_dir, shard)
    tmp = sdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    doclens = {f: np.zeros(n, dtype=np.int32) for f in field_texts}
    # postings[field][term] = [docids, tfs, flat positions]
    all_rows: dict[str, dict[str, tuple[list, list, list]]] = {}
    # forward index (TermVector equivalent, TermVector.java:19-94): per
    # (docid, field) the sorted stems + their tfs — feeds query expansion
    # (QryExpansion.java:175-197) and LeToR feature extraction
    fwd = {"docid": [], "field": [], "stems": [], "tfs": []}
    for field, texts in field_texts.items():
        postings: dict[str, tuple[list, list, list]] = {}
        dl = doclens[field]
        for local, text in enumerate(texts):
            if not text:
                continue
            terms, positions = analyze_positions(text, analyzer)
            dl[local] = len(terms)
            per_doc: dict[str, list[int]] = {}
            for t, p in zip(terms, positions):
                per_doc.setdefault(t, []).append(p)
            docid = docid_base + local
            if include_forward:
                items = sorted(per_doc.items())
                fwd["docid"].append(docid)
                fwd["field"].append(field)
                fwd["stems"].append([t for t, _ in items])
                fwd["tfs"].append([len(p) for _, p in items])
            for t, plist in per_doc.items():
                entry = postings.get(t)
                if entry is None:
                    entry = postings[t] = ([], [], [])
                entry[0].append(docid)
                entry[1].append(len(plist))
                entry[2].extend(plist)
        all_rows[field] = postings

    if include_forward:
        pq.write_table(
            pa.table(
                {
                    "docid": pa.array(fwd["docid"], type=pa.int64()),
                    "field": pa.array(fwd["field"], type=pa.string()),
                    "stems": pa.array(fwd["stems"], type=pa.list_(pa.string())),
                    "tfs": pa.array(fwd["tfs"], type=pa.list_(pa.int32())),
                }
            ),
            os.path.join(tmp, "fwd.parquet"),
        )

    # Encode postings.bin + terms.parquet, terms sorted by (field, term) so
    # lookups and merges are order-stable.
    fields_s, terms_s, dfs, ctfs, offsets, nbytes = [], [], [], [], [], []
    offset = 0
    with open(os.path.join(tmp, "postings.bin"), "wb") as fh:
        for field in sorted(all_rows):
            postings = all_rows[field]
            for term in sorted(postings):
                docids, tfs, pos = postings[term]
                tfs_a = np.asarray(tfs, dtype=np.int64)
                po = np.zeros(len(tfs) + 1, dtype=np.int64)
                np.cumsum(tfs_a, out=po[1:])
                buf = encode_postings(
                    np.asarray(docids, dtype=np.int64),
                    tfs_a,
                    po,
                    np.asarray(pos, dtype=np.int32),
                    block_size=block_size,
                )
                fh.write(buf)
                fields_s.append(field)
                terms_s.append(term)
                dfs.append(len(docids))
                ctfs.append(int(tfs_a.sum()))
                offsets.append(offset)
                nbytes.append(len(buf))
                offset += len(buf)

    terms_table = pa.table(
        {
            "field": fields_s,
            "term": terms_s,
            "df": dfs,
            "ctf": ctfs,
            "offset": offsets,
            "nbytes": nbytes,
        },
        schema=TERMS_SCHEMA,
    )
    pq.write_table(terms_table, os.path.join(tmp, "terms.parquet"))

    # fan-out-routing Bloom sidecar (state/bloom.py) — vocabulary is already
    # in memory here, so build-time emission is ~free; the query driver
    # skips shards whose filter rejects every query term (no false
    # negatives ⇒ provably identical results)
    from .bloom import write_shard_bloom

    write_shard_bloom(tmp, fields_s, terms_s)

    dl_cols: dict[str, object] = {
        "docid": np.arange(docid_base, docid_base + n, dtype=np.int64)
    }
    for f in field_texts:
        dl_cols[f"len_{f}"] = doclens[f]
    pq.write_table(pa.table(dl_cols), os.path.join(tmp, "doclens.parquet"))

    manifest = {
        "shard": shard,
        "docid_base": docid_base,
        "n_docs": n,
        "fingerprint": fingerprint,
        "fields": {
            f: {
                "sum_doclen": int(doclens[f].sum()),
                "doccount": int((doclens[f] > 0).sum()),
            }
            for f in field_texts
        },
        "postings_bytes": offset,
        "n_terms": len(terms_s),
        "wall_s": round(time.monotonic() - t0, 3),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    # docmap (written before the atomic shard rename; idempotent overwrite)
    os.makedirs(os.path.dirname(docmap_path(index_dir, shard)), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "docid": np.arange(docid_base, docid_base + n, dtype=np.int64),
                "url": urls,
            }
        ),
        docmap_path(index_dir, shard),
    )

    shutil.rmtree(sdir, ignore_errors=True)
    os.replace(tmp, sdir)
    return terms_table.select(["field", "term", "df", "ctf"])


def read_manifest_terms(index_dir: str, shard: int):
    """Shard-local termstats from an already-built shard (resume path)."""
    t = pq.read_table(
        os.path.join(shard_dir(index_dir, shard), "terms.parquet"),
        columns=["field", "term", "df", "ctf"],
    )
    return t.to_pandas()


class ShardReader:
    """Query-side handle: term dict + mmap'd postings + doclen arrays,
    loaded once (actor ``__init__``) and reused across queries."""

    def __init__(self, index_dir: str, shard: int):
        sdir = shard_dir(index_dir, shard)
        self._sdir = sdir
        with open(os.path.join(sdir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.shard = shard
        self.docid_base = int(self.manifest["docid_base"])
        self.n_docs = int(self.manifest["n_docs"])

        t = pq.read_table(os.path.join(sdir, "terms.parquet"))
        fields = t["field"].to_pylist()
        terms = t["term"].to_pylist()
        offs = t["offset"].to_numpy()
        szs = t["nbytes"].to_numpy()
        dfs = t["df"].to_numpy()
        ctfs = t["ctf"].to_numpy()
        self.term_dict: dict[tuple[str, str], tuple[int, int, int, int]] = {
            (f, tm): (int(o), int(s), int(d), int(c))
            for f, tm, o, s, d, c in zip(fields, terms, offs, szs, dfs, ctfs)
        }
        self.postings = np.memmap(
            os.path.join(sdir, "postings.bin"), dtype=np.uint8, mode="r"
        )
        dl = pq.read_table(os.path.join(sdir, "doclens.parquet"))
        self.doclens: dict[str, np.ndarray] = {
            name[4:]: dl[name].to_numpy() for name in dl.column_names if name.startswith("len_")
        }
        dm = pq.read_table(docmap_path(index_dir, shard))
        self.urls: list[str] = dm["url"].to_pylist()

    def doclen(self, field: str, docids: np.ndarray) -> np.ndarray:
        """Vectorized (field, docid) → doclen (reference DocLengthStore)."""
        arr = self.doclens.get(field)
        if arr is None:
            return np.zeros(len(docids), dtype=np.int32)
        return arr[np.asarray(docids) - self.docid_base]

    def url_of(self, docids: np.ndarray) -> list[str]:
        return [self.urls[int(d) - self.docid_base] for d in docids]

    def get_postings(self, field: str, term: str, with_positions: bool = True):
        """Decode one posting list → (docids, tfs, pos_offsets, pos_flat,
        local_df, local_ctf); empty arrays when the term is absent."""
        meta = self.term_dict.get((field, term))
        if meta is None:
            e = np.empty(0, dtype=np.int64)
            return e, e.astype(np.int32), np.zeros(1, np.int64), np.empty(0, np.int32), 0, 0
        off, size, df, ctf = meta
        buf = self.postings[off : off + size]
        docids, tfs, po, pf = decode_postings(buf, with_positions=with_positions)
        return docids, tfs, po, pf, df, ctf

    def term_vectors(
        self, field: str, docids: list[int]
    ) -> dict[int, tuple[list[str], np.ndarray]]:
        """Forward-index lookup: docid → (stems, tfs) for this field — the
        reference's ``TermVector(docid, field)`` (TermVector.java:19-94).
        Filtered parquet read; raises if the index was built without
        ``include_forward``."""
        import pyarrow.dataset as pads

        path = os.path.join(self._sdir, "fwd.parquet")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"shard {self.shard} has no forward index (fwd.parquet); "
                "rebuild with include_forward=True"
            )
        tab = pads.dataset(path).to_table(
            filter=(pads.field("field") == field)
            & pads.field("docid").isin(sorted(docids))
        )
        return {
            int(d): (s, np.asarray(t, dtype=np.int64))
            for d, s, t in zip(
                tab["docid"].to_pylist(),
                tab["stems"].to_pylist(),
                tab["tfs"].to_pylist(),
            )
        }

    def get_headers(self, field: str, term: str):
        """Skip-block headers for block-max traversal (None if absent)."""
        meta = self.term_dict.get((field, term))
        if meta is None:
            return None
        off, size, _, _ = meta
        headers, _ = read_headers(self.postings[off : off + size])
        return headers

    def get_postings_masked(self, field: str, term: str, block_mask: np.ndarray):
        """Decode only the selected skip blocks → (docids, tfs); positions
        skipped. Block-max top-k traversal path."""
        meta = self.term_dict.get((field, term))
        if meta is None:
            e = np.empty(0, dtype=np.int64)
            return e, e.astype(np.int32)
        off, size, _, _ = meta
        docids, tfs, _, _ = decode_postings(
            self.postings[off : off + size], with_positions=False, block_mask=block_mask
        )
        return docids, tfs
