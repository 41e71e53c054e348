"""WARC (Web ARChive, ISO 28500) source/sink — the format 100-TB web
corpora actually arrive in (Common Crawl ships WARC shards).  Built on
the repo's custom-datasource template (sources/ipc.py): the reader
composes ``read_binary_files`` (shard parallelism, streaming) with a
per-file parser inside ``map_batches``; the writer is shard-parallel
with the atomic-rename discipline.

Records are spec-conformant ``WARC-Type: resource`` records (a payload
stored under a URI, no fake HTTP envelope): a WARC/1.0 version line,
CRLF-terminated named headers including ``Content-Length`` (payload
byte count), one blank line, the payload, then the two mandatory
trailing CRLFs.  The parser walks records by Content-Length — it never
splits on payload bytes, so payloads containing "WARC/1.0" round-trip
exactly.  No external data and no randomness: record ids derive from
the payload sha256, so a rewritten shard is byte-identical.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa
import ray.data

_CRLF = b"\r\n"


def _encode_record(uri: str, date: str, payload: bytes) -> bytes:
    rid = hashlib.sha256(payload).hexdigest()[:32]
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + b"Content-Type: text/plain; charset=utf-8\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode()
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def write_warc(ds, out_dir: str, uri_col: str = "uri",
               date_col: str = "warc_date",
               content_col: str = "content") -> int:
    """One .warc shard per block, temp-name + atomic rename.  Returns
    the number of shards written; only per-shard counts reach the
    driver."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        parts = []
        uris = batch[uri_col].to_pylist()
        dates = batch[date_col].to_pylist()
        texts = batch[content_col].to_pylist()
        for u, d, t in zip(uris, dates, texts):
            parts.append(_encode_record(u, d, t.encode("utf-8")))
        blob = b"".join(parts)
        name = uuid.uuid4().hex
        tmp = os.path.join(out_dir, f".{name}.tmp")
        dst = os.path.join(out_dir, f"{name}.warc")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, dst)
        return pa.table({"shard": pa.array([dst], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    manifest = ds.map_batches(_write, batch_format="pyarrow").to_pandas()
    return len(manifest)


def _parse_warc(raw: bytes) -> pa.Table:
    """Parse one WARC shard: Content-Length-driven record walk.  Fails
    loudly on a malformed record (bad version line, missing
    Content-Length, truncated payload) — the JSONL reader's validate-
    don't-guess discipline."""
    uris, dates, texts, sizes = [], [], [], []
    pos, n = 0, len(raw)
    while pos < n:
        if raw[pos:pos + 2] == _CRLF:  # inter-record padding
            pos += 2
            continue
        end_head = raw.find(_CRLF + _CRLF, pos)
        if end_head < 0:
            raise ValueError(f"warc: unterminated header block at {pos}")
        lines = raw[pos:end_head].split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"warc: bad version line {lines[0][:40]!r} at {pos}")
        hdr = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            hdr[k.strip().lower()] = v.strip()
        if b"content-length" not in hdr:
            raise ValueError(f"warc: record at {pos} missing Content-Length")
        clen = int(hdr[b"content-length"])
        body_start = end_head + 4
        if body_start + clen > n:
            raise ValueError(f"warc: truncated payload at {pos}")
        payload = raw[body_start:body_start + clen]
        uris.append(hdr.get(b"warc-target-uri", b"").decode())
        dates.append(hdr.get(b"warc-date", b"").decode())
        texts.append(payload.decode("utf-8"))
        sizes.append(clen)
        pos = body_start + clen
    return pa.table({
        "uri": pa.array(uris, pa.string()),
        "warc_date": pa.array(dates, pa.string()),
        "content": pa.array(texts, pa.large_string()),
        "n_bytes": pa.array(np.asarray(sizes, dtype=np.int64), pa.int64()),
    })


def read_warc(dir_or_file: str):
    """Validating WARC reader: shards distribute via read_binary_files,
    each worker walks its files' records by Content-Length.  Returns
    (uri, warc_date, content, n_bytes) rows."""
    files = ray.data.read_binary_files(
        dir_or_file, file_extensions=["warc"])

    def _decode(batch: dict) -> pa.Table:
        tables = [_parse_warc(bytes(raw)) for raw in batch["bytes"]]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return files.map_batches(_decode, batch_format="numpy", batch_size=4)
