"""WARC (Web ARChive, ISO 28500) segment reader/writer — the container
Common-Crawl-style corpora actually arrive in.

The reference's corpus is ClueWeb09 web pages pre-indexed by Lucene
(``QryEval.java:102-103``); at crawl scale those pages ship as WARC segment
files (~1 GiB gzip members, one ``response`` record per fetched page).
This source closes the ingestion loop: ``read_warc()`` produces exactly
the ``(url, warc_ts, html)`` table shape the rest of the engine consumes
(the ``input_hint`` corpus), so a user can point the index build, the
extraction invariant, dedup, and the curation chain straight at a crawl
dump.

Execution shape — the SEGMENT FILE is the parallel unit (Common Crawl's
own layout: tens of thousands of ~1 GiB segments per dump):
``ray.data.read_binary_files(paths, include_paths=True)`` → one
``map_batches`` parse task per file group. Record scanning is a pure
offset walk (``find`` on the raw bytes + ``Content-Length`` skips — no
per-byte Python), gzip members decompress in-task (``gzip.decompress``
handles the member-concatenated stream WARC gzips use), and per-task
memory is O(one segment). At 100 TB nothing changes: more files, same
per-file task; downstream stages stream off the parsed blocks with
backpressure. For segments too large for one task, an offset sidecar
(record start positions, built once) would let tasks split inside a file
— documented, not needed at the segment sizes crawls actually ship.

Parsing semantics (WARC/1.0):

* a record = header block (``WARC/1.0`` version line + ``Name: value``
  lines, CRLF-separated) + blank line + exactly ``Content-Length``
  payload bytes + two record-separator CRLFs;
* only ``WARC-Type`` values in ``keep`` survive (default: ``response`` —
  request/metadata/warcinfo records are skipped by offset, their payloads
  never materialize);
* a ``response`` payload is an HTTP message: the status line + headers up
  to the first blank line are stripped, the entity body is the page
  bytes;
* ``WARC-Date`` (``YYYY-MM-DDTHH:MM:SSZ``) parses to int64 epoch seconds
  (``ts_epoch``) — exact integer transport, no timezone/float ambiguity.

Truncated tails (a crawl cut mid-record) drop the partial record and keep
everything before it — the resumable-ingest behavior a 100 TB run needs.
"""

from __future__ import annotations

import calendar
import gzip
import time
from typing import Iterable, Iterator

import pyarrow as pa

__all__ = [
    "iter_warc_records",
    "read_warc",
    "warc_record_bytes",
    "write_warc_file",
]

_CRLF2 = b"\r\n\r\n"


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk raw (already-decompressed) WARC bytes → ``(fields, payload)``
    per record, where ``fields`` maps lower-cased header names to values.
    Pure offset arithmetic; payloads are zero-copy slices. Partial trailing
    records (no complete header block, or payload shorter than
    Content-Length) are dropped."""
    i, n = 0, len(data)
    while i < n:
        j = data.find(_CRLF2, i)
        if j < 0:
            return  # truncated header block
        header = data[i : j].decode("utf-8", "replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return  # not a record boundary — stop rather than misparse
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            return
        start = j + len(_CRLF2)
        if start + clen > n:
            return  # truncated payload
        yield fields, data[start : start + clen]
        i = start + clen
        while data[i : i + 2] == b"\r\n":
            i += 2


def _parse_warc_date(s: str) -> int:
    """``YYYY-MM-DDTHH:MM:SSZ`` → int64 epoch seconds (UTC, exact)."""
    try:
        return calendar.timegm(time.strptime(s, "%Y-%m-%dT%H:%M:%SZ"))
    except ValueError:
        return 0


def _strip_http(payload: bytes) -> bytes:
    """A ``response`` payload is an HTTP message — drop status line +
    headers, keep the entity body."""
    if payload[:5] == b"HTTP/":
        k = payload.find(_CRLF2)
        if k >= 0:
            return payload[k + len(_CRLF2) :]
    return payload


def read_warc(
    paths: str | list[str],
    *,
    keep: tuple[str, ...] = ("response",),
):
    """``ray.data`` Dataset ``(url:string, ts_epoch:int64, html:binary)``
    from WARC segment files (plain or ``.gz``). One parse task per file
    group; see the module docstring for the scale contract."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    keep_set = set(keep)

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[int] = []
        htmls: list[bytes] = []
        for raw in t["bytes"].to_pylist():
            # detect by magic, not extension: ray.data.read_binary_files
            # already inflates paths Arrow recognizes as compressed
            data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            for fields, payload in iter_warc_records(data):
                if fields.get("warc-type") not in keep_set:
                    continue
                urls.append(fields.get("warc-target-uri", ""))
                ts.append(_parse_warc_date(fields.get("warc-date", "")))
                htmls.append(_strip_http(payload))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts_epoch": pa.array(ts, pa.int64()),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def warc_record_bytes(
    url: str,
    ts_epoch: int,
    body: bytes,
    *,
    rec_type: str = "response",
    http_wrap: bool = True,
) -> bytes:
    """One WARC/1.0 record (CRLF headers + payload + record separator).
    ``http_wrap`` wraps ``body`` in a minimal HTTP 200 response, as crawl
    ``response`` records carry."""
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        if http_wrap
        else body
    )
    date = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(ts_epoch))
    header = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}"
    ).encode("utf-8")
    return header + _CRLF2 + payload + b"\r\n\r\n"


def write_warc_file(
    path: str, records: Iterable[tuple[str, int, bytes]], **kwargs
) -> None:
    """Write ``(url, ts_epoch, body)`` records as one WARC segment;
    gzipped when ``path`` ends in ``.gz`` (mtime pinned to 0 so identical
    records produce identical bytes — resumable-sink friendly)."""
    blob = b"".join(warc_record_bytes(u, t, b, **kwargs) for u, t, b in records)
    if path.endswith(".gz"):
        blob = gzip.compress(blob, mtime=0)
    with open(path, "wb") as f:
        f.write(blob)
