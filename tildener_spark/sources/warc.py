"""WARC / WET source and sink (ISO 28500 / WARC 1.1).

The north-star input is Common-Crawl-style web pages, and Common
Crawl ships them as WARC files (``.warc.gz`` with one gzip member
per record) plus WET text extracts (``WARC-Type: conversion``).
This module gives the engine a real WARC surface:

* ``build_warc`` / ``iter_warc_records`` — a from-scratch writer and
  streaming parser for WARC 1.1 ``response`` / ``conversion`` /
  ``warcinfo`` records, plain or per-record-gzip (the Common Crawl
  member convention, so any single record is seekable+decodable on
  its own).
* ``read_warc`` — distributed Spark source: ``binaryFile`` scan →
  Arrow-batched parse → pages-shaped rows (url, warc_ts, html).
  One task per WARC file; at 100 TB the unit of parallelism is the
  ~1 GB warc.gz segment, exactly how Common Crawl shards.
* ``write_warc`` — distributed sink: pages → one WARC file per
  partition, written executor-side (no driver collect).

Reference parity note: the reference ingests a *directory of
plaintext files* (ProcessDirectory.pl:55-73); WARC is the web-scale
equivalent of that corpus directory, and the WET ``conversion``
records correspond to its plaintext inputs.

Determinism: gzip members are emitted via zlib with a fixed header
(mtime 0, no filename), so identical records → identical bytes on
any host; record ids are content-derived UUIDs (uuid5), not random.
"""

from __future__ import annotations

import hashlib
import os
import uuid
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"
_UUID_NS = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 NS_URL


# --------------------------------------------------------------------------
# record model
# --------------------------------------------------------------------------

class WarcRecord:
    """One parsed WARC record: headers dict + raw payload block."""

    __slots__ = ("headers", "payload")

    def __init__(self, headers: dict, payload: bytes):
        self.headers = headers
        self.payload = payload

    @property
    def warc_type(self) -> str:
        return self.headers.get("warc-type", "")

    @property
    def target_uri(self) -> str:
        uri = self.headers.get("warc-target-uri", "")
        # WARC 1.0 tools sometimes wrap the URI in <>; tolerate both.
        if uri.startswith("<") and uri.endswith(">"):
            uri = uri[1:-1]
        return uri

    @property
    def date(self) -> datetime | None:
        raw = self.headers.get("warc-date")
        if not raw:
            return None
        return datetime.strptime(raw, _WARC_DATE_FMT)

    def http_body(self) -> bytes:
        """For ``response`` records: strip the HTTP header block."""
        if self.warc_type != "response":
            return self.payload
        sep = self.payload.find(_CRLF + _CRLF)
        if sep < 0:  # bare payload without HTTP headers
            return self.payload
        return self.payload[sep + 4:]


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def _record_bytes(warc_type: str, payload: bytes, *, uri: str | None = None,
                  date: datetime | None = None,
                  content_type: str | None = None,
                  extra: dict | None = None) -> bytes:
    date = date or datetime(2024, 1, 1)
    rid = uuid.uuid5(_UUID_NS, f"{warc_type}|{uri or ''}|"
                     + hashlib.sha1(payload).hexdigest())
    head = [
        b"WARC/1.1",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: <urn:uuid:" + str(rid).encode("ascii") + b">",
        b"WARC-Date: " + date.strftime(_WARC_DATE_FMT).encode("ascii"),
    ]
    if uri is not None:
        head.append(b"WARC-Target-URI: " + uri.encode("utf-8"))
    if content_type is not None:
        head.append(b"Content-Type: " + content_type.encode("ascii"))
    digest = hashlib.sha1(payload).hexdigest()
    head.append(b"WARC-Payload-Digest: sha1:" + digest.encode("ascii"))
    for k, v in (extra or {}).items():
        head.append(f"{k}: {v}".encode("utf-8"))
    head.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return (_CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF)


def response_record(url: str, html: bytes, date: datetime,
                    status: int = 200) -> bytes:
    """A ``response`` record whose payload is a minimal HTTP/1.1 reply."""
    http = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: text/html; charset=UTF-8\r\n"
            f"Content-Length: {len(html)}\r\n\r\n").encode("ascii") + html
    return _record_bytes("response", http, uri=url, date=date,
                         content_type="application/http; msgtype=response")


def conversion_record(url: str, text: str, date: datetime) -> bytes:
    """A WET-style ``conversion`` record carrying extracted plaintext."""
    return _record_bytes("conversion", text.encode("utf-8"), uri=url,
                         date=date, content_type="text/plain")


def warcinfo_record(fields: dict | None = None) -> bytes:
    body = "".join(f"{k}: {v}\r\n" for k, v in (fields or {
        "software": "tildener-spark",
        "format": "WARC File Format 1.1",
    }).items()).encode("utf-8")
    return _record_bytes("warcinfo", body,
                         content_type="application/warc-fields")


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime 0, no name) per record."""
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def build_warc(records: Iterable[bytes], *, gz: bool = True,
               warcinfo: bool = True) -> bytes:
    """Concatenate raw records into one WARC file's bytes.

    ``gz=True`` emits the Common Crawl layout: every record is its
    own gzip member, so readers can split work at member boundaries.
    """
    parts: list[bytes] = []
    if warcinfo:
        parts.append(warcinfo_record())
    parts.extend(records)
    if gz:
        return b"".join(_gzip_member(p) for p in parts)
    return b"".join(parts)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a stream of concatenated gzip members one by one."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(data[pos:])
        out += d.flush()
        yield out
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)


def _parse_records(data: bytes) -> Iterator[WarcRecord]:
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        sep = data.find(_CRLF + _CRLF, pos)
        if sep < 0:
            raise ValueError("truncated WARC header block")
        header_block = data[pos:sep].decode("utf-8", errors="replace")
        lines = header_block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers: dict[str, str] = {}
        last_key = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t") and last_key:  # folded continuation
                headers[last_key] += " " + line.strip()
                continue
            k, _, v = line.partition(":")
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        length = int(headers["content-length"])
        body_start = sep + 4
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield WarcRecord(headers, payload)
        pos = body_start + length


def iter_warc_records(data: bytes) -> Iterator[WarcRecord]:
    """Parse plain or per-record-gzip WARC bytes into records."""
    if data.startswith(_GZIP_MAGIC):
        for chunk in _split_gzip_members(data):
            yield from _parse_records(chunk)
    else:
        yield from _parse_records(data)


# --------------------------------------------------------------------------
# Spark source / sink
# --------------------------------------------------------------------------

PAGES_WARC_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                     "record_type string")


def _records_to_pdf(blobs: Iterable[bytes]) -> pd.DataFrame:
    rows = []
    for blob in blobs:
        if blob is None:
            continue
        for rec in iter_warc_records(bytes(blob)):
            if rec.warc_type == "response":
                rows.append((rec.target_uri, rec.date, rec.http_body(),
                             "response"))
            elif rec.warc_type == "conversion":
                rows.append((rec.target_uri, rec.date, rec.payload,
                             "conversion"))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                       "record_type"])


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan → (url, warc_ts, html, record_type).

    ``binaryFile`` gives one row per file; each file parses inside
    one Arrow batch, so parallelism == number of WARC segments —
    the Common Crawl sharding unit (~1 GB each at production scale).
    """
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.warc*")
           .load(path)
           .select("content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _records_to_pdf(pdf["content"])

    return raw.mapInPandas(parse, schema=PAGES_WARC_SCHEMA)


def pages_to_warc_bytes(pdf: pd.DataFrame, *, gz: bool = True,
                        wet: bool = False) -> bytes:
    """One pandas group of pages → one WARC (or WET) file's bytes."""
    recs = []
    for row in pdf.itertuples(index=False):
        ts = row.warc_ts.to_pydatetime() if hasattr(row.warc_ts, "to_pydatetime") else row.warc_ts
        if wet:
            recs.append(conversion_record(row.url, row.text, ts))
        else:
            recs.append(response_record(row.url, bytes(row.html), ts))
    return build_warc(recs, gz=gz)


def write_warc(pages: DataFrame, out_dir: str, *, files: int = 8,
               gz: bool = True, wet: bool = False) -> int:
    """Sink pages as ``files`` WARC segments, written executor-side.

    Returns the number of files written. Files are named by the
    group key, so reruns overwrite deterministically (idempotent
    sink — the same property the lineage checkpointer relies on).
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = ["url", "warc_ts", "text"] if wet else ["url", "warc_ts", "html"]
    keyed = pages.select(*cols).withColumn(
        "file_id", F.pmod(F.xxhash64("url"), F.lit(files)))
    ext = ".warc.wet" if wet else ".warc"
    if gz:
        ext += ".gz"

    def emit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        blob = pages_to_warc_bytes(pdf, gz=gz, wet=wet)
        name = f"part-{int(key[0]):05d}{ext}"
        with open(os.path.join(out_dir, name), "wb") as fh:
            fh.write(blob)
        return pd.DataFrame({"file": [name], "n_records": [len(pdf)]})

    out = keyed.groupBy("file_id").applyInPandas(
        emit, schema="file string, n_records long")
    return out.count()
