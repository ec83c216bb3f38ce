"""Index → table export: decode the sharded inverted index back into a
``(term, docid, tf, url)`` Dataset.

Two jobs:

* **Integrity oracle** — exporting every posting and hash-comparing the
  table against a SQL tokenization twin verifies the ENTIRE index content
  (postings, not just the df/ctf sums that ``term_stats`` checks): the
  `postings_export` driver entry does exactly that.
* **Interop** — downstream jobs (term-doc matrices, co-occurrence stats,
  sparse-retrieval training data) consume the index as a plain columnar
  table without linking the query engine.

One Ray task per shard (the shard is the unit of locality — its postings
file is decoded exactly once, sequentially); output rows stream through
the object store, never the driver. Decoding skips positions
(``with_positions=False`` reads only the docid/tf streams).

Reference parity note: the reference traverses postings through Lucene's
term/postings enumeration (``InvList.java`` constructs an in-memory
inverted list per term from the Lucene index; ``QryEval.java:54`` owns the
reader); this is that traversal surface as a Dataset over every term at
once.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..functions.codec import decode_postings
from ..state import index_layout as lay

__all__ = ["export_postings"]


def export_postings(index_dir: str, *, field: str = "body") -> ray.data.Dataset:
    """Decode every posting of ``field`` into a Dataset ``(term, docid,
    tf, url)`` — one decode task per shard."""
    shards = lay.list_shards(index_dir)

    def dump(batch: pa.Table) -> pa.Table:
        from ..state.shard import ShardReader

        tables = []
        for sid in batch["shard"].to_pylist():
            rdr = ShardReader(index_dir, int(sid))
            terms = pq.read_table(
                os.path.join(lay.shard_dir(index_dir, int(sid)), "terms.parquet"),
                columns=["field", "term", "df", "offset", "nbytes"],
            )
            mask = pa.compute.equal(terms["field"], field)
            terms = terms.filter(mask)
            t_term = terms["term"].to_pylist()
            t_df = terms["df"].to_numpy()
            t_off = terms["offset"].to_numpy()
            t_nb = terms["nbytes"].to_numpy()
            doc_parts, tf_parts = [], []
            for off, nb in zip(t_off, t_nb):
                d, tf, _, _ = decode_postings(
                    rdr.postings[off : off + nb], with_positions=False
                )
                doc_parts.append(d)
                tf_parts.append(tf)
            if not doc_parts:
                continue
            docids = np.concatenate(doc_parts)
            tfs = np.concatenate(tf_parts).astype(np.int64)
            term_col = np.repeat(np.asarray(t_term, dtype=object), t_df)
            tables.append(
                pa.table(
                    {
                        "term": pa.array(term_col, type=pa.string()),
                        "docid": pa.array(docids, type=pa.int64()),
                        "tf": pa.array(tfs, type=pa.int64()),
                        "url": pa.array(rdr.url_of(docids), type=pa.string()),
                    }
                )
            )
        if not tables:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "docid": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                }
            )
        return pa.concat_tables(tables)

    return ray.data.from_items(
        [{"shard": int(s)} for s in shards], override_num_blocks=max(1, len(shards))
    ).map_batches(dump, batch_format="pyarrow")
