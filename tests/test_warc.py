"""WARC segment reader/writer (sources/warc.py): record walk, HTTP
stripping, type filtering, gzip members, truncation tolerance."""

import gzip

from search_engine_framework_ray.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_record_bytes,
    write_warc_file,
)


def _records():
    return [
        ("https://ex.com/a", 1_236_000_000, b"<html><p>alpha</p></html>"),
        ("https://ex.com/b", 1_236_000_001, b"<html><p>beta & more</p></html>"),
        ("https://ex.com/c", 1_236_000_002, b""),
    ]


def test_record_walk_and_http_strip():
    blob = b"".join(warc_record_bytes(u, t, b) for u, t, b in _records())
    got = list(iter_warc_records(blob))
    assert len(got) == 3
    fields, payload = got[0]
    assert fields["warc-type"] == "response"
    assert fields["warc-target-uri"] == "https://ex.com/a"
    assert fields["warc-date"] == "2009-03-02T13:20:00Z"
    assert payload.startswith(b"HTTP/1.1 200 OK")
    assert payload.endswith(b"<html><p>alpha</p></html>")


def test_truncated_tail_keeps_prefix():
    blob = b"".join(warc_record_bytes(u, t, b) for u, t, b in _records())
    assert len(list(iter_warc_records(blob[:-30]))) == 2  # last record cut
    assert list(iter_warc_records(b"garbage not a warc")) == []


def test_read_warc_roundtrip_plain_and_gz(ray_session, tmp_path):
    recs = _records()
    write_warc_file(str(tmp_path / "seg0.warc"), recs[:2])
    write_warc_file(str(tmp_path / "seg1.warc.gz"), recs[2:])
    out = (
        read_warc([str(tmp_path / "seg0.warc"), str(tmp_path / "seg1.warc.gz")])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out["url"]) == [u for u, _, _ in recs]
    assert list(out["ts_epoch"].astype(int)) == [t for _, t, _ in recs]
    assert [bytes(h) for h in out["html"]] == [b for _, _, b in recs]


def test_read_warc_filters_non_response(ray_session, tmp_path):
    blob = warc_record_bytes(
        "urn:warcinfo", 0, b"software: test", rec_type="warcinfo", http_wrap=False
    ) + warc_record_bytes("https://ex.com/x", 5, b"<html>x</html>")
    (tmp_path / "mix.warc").write_bytes(blob)
    out = read_warc(str(tmp_path / "mix.warc")).to_pandas()
    assert list(out["url"]) == ["https://ex.com/x"]
    assert bytes(out["html"][0]) == b"<html>x</html>"


def test_gzip_member_concatenation(ray_session, tmp_path):
    """Common Crawl gzips per record then concatenates members — the
    reader must decompress through member boundaries."""
    recs = _records()
    blob = b"".join(
        gzip.compress(warc_record_bytes(u, t, b), mtime=0) for u, t, b in recs
    )
    (tmp_path / "members.warc.gz").write_bytes(blob)
    out = (
        read_warc(str(tmp_path / "members.warc.gz"))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert [bytes(h) for h in out["html"]] == [b for _, _, b in recs]
