"""WARC (Web ARChive, ISO 28500) shard writer + reader — the
Common-Crawl container for the pages corpus this engine targets.

REAL format support with no external library: records are
``WARC/1.0`` header blocks (CRLF lines, case-insensitive header
names) followed by exactly ``Content-Length`` payload octets and a
CRLF CRLF terminator; shards are either plain concatenations or the
Common-Crawl convention of ONE GZIP MEMBER PER RECORD (stdlib zlib,
wbits=31), which is what makes CC shards seekable — ``iter_warc``
returns each record's member byte offset and compressed size so a
CDX-style index can point back into the shard. Parsing is driven by
``Content-Length`` alone (payloads legally contain ``WARC/1.0`` and
blank lines — a delimiter-scanning parser corrupts; the oracle query
plants exactly that). Reference framing: the engine's page sources
(SURVEY S7) read parquet; WARC is the upstream wire format those
tables are distilled from, so a user pointing the pipeline at raw
crawl output needs exactly this reader.

Scale shape: shards are independent binary blobs — decode is a fused
``map_batches`` over the binary column (same pattern as the media
codecs); nothing shuffles.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


class WarcFormatError(ValueError):
    pass


def build_warc(records, *, gzip_members: bool = True) -> bytes:
    """records: iterable of dicts with keys ``uri`` (str), ``date``
    (ISO-8601 str), ``payload`` (bytes), optional ``rec_type`` and
    ``content_type``. Returns the shard bytes (one gzip member per
    record when ``gzip_members``, the Common-Crawl convention)."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["payload"]
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('rec_type', 'response')}\r\n"
            f"WARC-Record-ID: <urn:rec:{i}>\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        body = hdr + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(body) + co.flush()
        else:
            out += body
    return bytes(out)


def _parse_record(body: bytes, offset: int) -> dict:
    """Parse ONE record from ``body`` (which must start at the record's
    version line). Returns the record dict + ``consumed`` bytes."""
    if not body.startswith(b"WARC/"):
        raise WarcFormatError("record does not start with a WARC version line")
    eol = body.find(b"\r\n")
    version = body[5:eol].decode("ascii", "replace")
    headers = {}
    pos = eol + 2
    while True:
        nxt = body.find(b"\r\n", pos)
        if nxt < 0:
            raise WarcFormatError("unterminated WARC header block")
        line = body[pos:nxt]
        pos = nxt + 2
        if not line:
            break
        k, sep, v = line.partition(b":")
        if not sep:
            raise WarcFormatError(f"malformed WARC header line {line!r}")
        headers[k.strip().decode("ascii").lower()] = \
            v.strip().decode("utf-8", "replace")
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError):
        raise WarcFormatError("missing or non-integer Content-Length")
    payload = body[pos:pos + clen]
    if len(payload) != clen:
        raise WarcFormatError("truncated WARC payload")
    pos += clen
    if body[pos:pos + 4] != b"\r\n\r\n":
        raise WarcFormatError("record not terminated by CRLF CRLF")
    return {"version": version, "headers": headers, "payload": payload,
            "offset": offset, "consumed": pos + 4}


def iter_warc(raw: bytes):
    """Yield records from a WARC shard — gzip-member shards (sniffed
    by the 1f 8b magic) or plain concatenations. Each yielded dict
    has ``version``, ``headers`` (lower-cased names), ``payload``,
    ``offset`` (member/record start in the SHARD) and ``stored_size``
    (compressed member size for gzip shards — the CDX index pair)."""
    if raw[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(raw):
            d = zlib.decompressobj(31)
            body = d.decompress(raw[pos:])
            body += d.flush()
            consumed = len(raw) - pos - len(d.unused_data)
            if consumed <= 0:
                raise WarcFormatError("corrupt gzip member")
            rec = _parse_record(body, pos)
            if rec["consumed"] != len(body):
                raise WarcFormatError(
                    "gzip member holds more than one record")
            rec["stored_size"] = consumed
            del rec["consumed"]
            yield rec
            pos += consumed
    else:
        pos = 0
        while pos < len(raw):
            rec = _parse_record(raw[pos:], pos)
            rec["stored_size"] = rec.pop("consumed")
            yield rec
            pos += rec["stored_size"]


def warc_records(ds, *, warc_col: str = "warc"):
    """Fused decode stage: binary WARC shards -> one row per record
    with (shard row order preserved inside each shard) columns
    rec (index in shard), uri, date, content_length (the HEADER
    value), payload_len (the measured bytes), offset, stored_size.
    Carries every other input column through (e.g. a shard id)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        carry = [c for c in df.columns if c != warc_col]
        out = {c: [] for c in carry}
        rows = {"rec": [], "uri": [], "date": [], "content_length": [],
                "payload_len": [], "offset": [], "stored_size": []}
        for _, row in df.iterrows():
            for i, rec in enumerate(iter_warc(row[warc_col])):
                for c in carry:
                    out[c].append(row[c])
                h = rec["headers"]
                rows["rec"].append(i)
                rows["uri"].append(h.get("warc-target-uri", ""))
                rows["date"].append(h.get("warc-date", ""))
                rows["content_length"].append(int(h["content-length"]))
                rows["payload_len"].append(len(rec["payload"]))
                rows["offset"].append(rec["offset"])
                rows["stored_size"].append(rec["stored_size"])
        res = pd.DataFrame(out)
        for c in ("rec", "content_length", "payload_len", "offset",
                  "stored_size"):
            res[c] = np.array(rows[c], dtype=np.int64)
        for c in ("uri", "date"):
            res[c] = rows[c]
        return res

    return ds.map_batches(fn, batch_format="pandas")
