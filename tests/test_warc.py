"""WARC/WET source+sink (tildener_spark/sources/warc.py).

Reference parity: the reference's corpus unit is a directory of
plaintext files (ProcessDirectory.pl:55-73); the WARC surface is the
web-scale analog, with WET ``conversion`` records standing in for its
plaintext inputs.
"""

from datetime import datetime

import pytest

from tildener_spark.datagen import pages_df
from tildener_spark.functions.text import extract_text_py
from tildener_spark.sources import warc as W


def _sample_records():
    return [
        W.response_record("http://ex.lv/a", b"<html><p>A &amp; B</p></html>",
                          datetime(2024, 1, 2, 3, 4, 5)),
        W.conversion_record("http://ex.lv/a", "A & Bāč",
                            datetime(2024, 1, 2, 3, 4, 5)),
        W.response_record("http://ex.lv/empty", b"",
                          datetime(2024, 1, 1)),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    blob = W.build_warc(_sample_records(), gz=gz)
    recs = list(W.iter_warc_records(blob))
    assert [r.warc_type for r in recs] == [
        "warcinfo", "response", "conversion", "response"]
    assert recs[1].target_uri == "http://ex.lv/a"
    assert recs[1].http_body() == b"<html><p>A &amp; B</p></html>"
    assert recs[1].date == datetime(2024, 1, 2, 3, 4, 5)
    assert recs[2].payload.decode("utf-8") == "A & Bāč"
    assert recs[3].http_body() == b""  # zero-length payload survives


def test_deterministic_bytes():
    # identical input -> identical .warc.gz bytes (content-derived
    # record ids, fixed gzip header) — the idempotent-sink contract
    assert W.build_warc(_sample_records()) == W.build_warc(_sample_records())


def test_gzip_member_per_record():
    # Common Crawl layout: each record independently decompressible
    blob = W.build_warc(_sample_records(), gz=True, warcinfo=False)
    members = list(W._split_gzip_members(blob))
    assert len(members) == 3
    one = list(W._parse_records(members[1]))
    assert one[0].warc_type == "conversion"


def test_folded_header_and_angle_uri():
    raw = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: <http://ex.lv/x>\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"X-Folded: one\r\n\ttwo\r\n"
           b"Content-Length: 4\r\n\r\n"
           b"body\r\n\r\n")
    rec = next(W.iter_warc_records(raw))
    assert rec.target_uri == "http://ex.lv/x"  # <> unwrapped
    assert rec.headers["x-folded"] == "one two"
    assert rec.payload == b"body"


def test_payload_binary_safe():
    # Content-Length framing must carry CRLFs and gzip magic inside
    # the payload without resyncing on them
    evil = b"\r\n\r\nWARC/1.1\r\n\x1f\x8b" + bytes(range(256))
    rec = W._record_bytes("resource", evil, uri="http://ex.lv/bin")
    out = list(W.iter_warc_records(rec))
    assert len(out) == 1 and out[0].payload == evil


def test_truncated_inputs_raise():
    blob = W.build_warc(_sample_records(), gz=False)
    with pytest.raises(ValueError):
        list(W._parse_records(blob[: len(blob) - 40]))
    with pytest.raises(ValueError):
        list(W._parse_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_spark_write_read_roundtrip(spark, tmp_path):
    pages = pages_df(spark, 60, seed=7).cache()
    n_files = W.write_warc(pages, str(tmp_path), files=4, gz=True)
    assert n_files == 4
    assert len(list(tmp_path.glob("*.warc.gz"))) == 4

    back = W.read_warc(spark, str(tmp_path))
    got = {r["url"]: r for r in back.collect()}
    want = {r["url"]: r for r in pages.collect()}
    assert set(got) == set(want) and len(got) == 60
    for url, row in got.items():
        assert row["record_type"] == "response"
        assert bytes(row["html"]) == bytes(want[url]["html"])
        # per-row north-star invariant: byte-identical extracted text
        assert extract_text_py(bytes(row["html"])) == want[url]["text"]
    pages.unpersist()


def test_spark_wet_sink(spark, tmp_path):
    pages = pages_df(spark, 20, seed=7)
    W.write_warc(pages, str(tmp_path), files=2, gz=True, wet=True)
    back = W.read_warc(spark, str(tmp_path))
    rows = back.collect()
    assert len(rows) == 20
    assert {r["record_type"] for r in rows} == {"conversion"}
    want = {r["url"]: r["text"] for r in pages.collect()}
    for r in rows:
        assert bytes(r["html"]).decode("utf-8") == want[r["url"]]
