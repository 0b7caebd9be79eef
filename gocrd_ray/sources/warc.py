"""WARC source / sink — the web-crawl interchange format (ISO 28500).

CommonCrawl, Internet Archive and most crawler output ships as WARC:
a sequence of records, each a block of ``Name: value`` headers, a
blank line, ``Content-Length`` payload bytes, and a ``\\r\\n\\r\\n``
trailer.  This module reads and writes that framing with an exact
roundtrip contract for the pages/documents shapes:

* ``url``        ↔ ``WARC-Target-URI``
* ``warc_ts``    ↔ ``WARC-Date`` (WARC/1.1 ISO-8601 with exactly six
  fractional digits, so ``timestamp[us]`` roundtrips bit-exact)
* ``rec_id``     ↔ ``WARC-Record-ID``
* ``payload``    ↔ the record body, byte-exact via ``Content-Length``
  (never newline-mangled — WARC is the binary-safe text container)
* caller-named extension columns ↔ ``WARC-X-<Name>`` headers
  (string or int64; a NULL value writes no header and reads back as
  null, so null stays distinguishable from empty string)

Compression follows CommonCrawl's actual layout: ``record-gzip``
writes each record as its own gzip member so a reader can split a
shard at member boundaries without decompressing the whole file; the
reader auto-detects the 0x1f8b magic and walks members with a
``zlib.decompressobj`` loop.  Plain (uncompressed) WARC is the
default and what the streaming parser reads natively.

Scale shape: the source is a ``FileBasedDatasource`` whose
``_read_stream`` yields bounded record batches WHILE parsing — a
1 GB shard streams through the executor as many blocks instead of
materializing per file; thousands of shards parallelize exactly like
``read_parquet``.  The sink is a ``BlockBasedFileDatasink`` — one
.warc file per block, partitioned and resumable like the JSONL/CSV
sinks.  Null payloads are rejected loudly (a crawl record always has
a body); payload bytes dominate the writer's cost and cross as
buffer concatenation, headers are the only per-row string work.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.datasource import BlockBasedFileDatasink, FileBasedDatasource

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
#: records per yielded batch on the read side — bounds reader memory
#: regardless of shard size (payloads dominate; 4k html pages ≈ tens
#: of MB per batch, far under the object-store block target)
_BATCH_RECORDS = 4096


# ---------------------------------------------------------------------------
# header (de)serialization helpers
# ---------------------------------------------------------------------------

def _ts_to_warc_date(ts_us: int) -> str:
    """int64 epoch-microseconds → WARC/1.1 date, always 6 fractional
    digits (the write side of the bit-exact timestamp contract)."""
    s, us = divmod(int(ts_us), 1_000_000)
    import datetime as _dt

    d = _dt.datetime.fromtimestamp(s, _dt.timezone.utc)
    return f"{d:%Y-%m-%dT%H:%M:%S}.{us:06d}Z"


def _warc_date_to_us(s: str) -> int:
    """WARC date → epoch microseconds.  Accepts both WARC/1.0 second
    precision and WARC/1.1 fractional digits."""
    import datetime as _dt

    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    if "." in s:
        base, frac = s.split(".", 1)
        us = int(frac[:6].ljust(6, "0"))
    else:
        base, us = s, 0
    d = _dt.datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=_dt.timezone.utc
    )
    return int(d.timestamp()) * 1_000_000 + us


def _x_header(col: str) -> bytes:
    """Extension column name → ``WARC-X-<Title-Case>`` header bytes."""
    return b"WARC-X-" + col.replace("_", "-").title().encode("ascii")


# ---------------------------------------------------------------------------
# source
# ---------------------------------------------------------------------------

class WarcDatasource(FileBasedDatasource):
    """Streaming WARC record reader.

    Produces ``(rec_id, rec_type, url, warc_ts, content_type,
    payload, *x_cols)`` — the fixed WARC headers plus caller-declared
    ``WARC-X-`` extension columns (``x_cols`` maps column name →
    ``"string"`` | ``"int64"``).  Unknown headers are ignored (WARC
    consumers must tolerate extension fields they don't know).
    """

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, *, x_cols: dict[str, str] | None = None,
                 **kwargs):
        kwargs.setdefault("file_extensions", None)
        # this module owns the gzip framing (member-wise, so a shard
        # can split at member boundaries) — keep pyarrow from ALSO
        # auto-de/compressing on the .gz extension
        kwargs.setdefault("open_stream_args", {"compression": None})
        super().__init__(paths, **kwargs)
        self._x_cols = dict(x_cols or {})
        for c, t in self._x_cols.items():
            if t not in ("string", "int64"):
                raise ValueError(
                    f"WarcDatasource: x_cols[{c!r}] must be 'string' or "
                    f"'int64', got {t!r}")

    # -- raw byte stream, transparently de-gzipped member-wise --------
    @staticmethod
    def _iter_plain_chunks(f) -> Iterator[bytes]:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                return
            yield bytes(chunk)

    def _read_stream(self, f: "pa.NativeFile", path: str):
        head = f.read(2)
        chunks: Iterator[bytes]
        if bytes(head) == _GZIP_MAGIC:
            def _with_head(h=bytes(head)):
                yield h
                yield from self._iter_plain_chunks(f)
            chunks = self._iter_gunzip_chunks_from(_with_head())
        else:
            def _plain(h=bytes(head)):
                if h:
                    yield h
                yield from self._iter_plain_chunks(f)
            chunks = _plain()
        yield from self._parse_records(chunks, path)

    @classmethod
    def _iter_gunzip_chunks_from(cls, raw: Iterator[bytes]) -> Iterator[bytes]:
        d = zlib.decompressobj(wbits=31)
        for chunk in raw:
            buf = chunk
            while buf:
                out = d.decompress(buf)
                if out:
                    yield out
                if d.eof:
                    buf = d.unused_data
                    d = zlib.decompressobj(wbits=31)
                else:
                    buf = b""
        tail = d.flush()
        if tail:
            yield tail

    # -- record framing ------------------------------------------------
    def _parse_records(self, chunks: Iterator[bytes], path: str):
        buf = bytearray()
        rows: list[dict] = []

        def _flush():
            nonlocal rows
            out, rows = rows, []
            return self._rows_to_table(out)

        chunks = iter(chunks)

        def _fill(n: int) -> bool:
            """Grow buf to ≥ n bytes; False on clean EOF short."""
            while len(buf) < n:
                try:
                    buf.extend(next(chunks))
                except StopIteration:
                    return False
            return True

        while True:
            # skip inter-record CRLF padding; a clean EOF here (buf
            # empty or only CRLF fragments) ends the file
            while True:
                if len(buf) >= 2 and buf[:2] == _CRLF:
                    del buf[:2]
                    continue
                if len(buf) >= 2:
                    break
                if not _fill(len(buf) + 1):
                    if bytes(buf).strip(b"\r\n"):
                        raise ValueError(
                            f"warc: trailing garbage at end of {path}")
                    if rows:
                        yield _flush()
                    return
            # header block ends at CRLFCRLF
            while True:
                idx = buf.find(b"\r\n\r\n")
                if idx >= 0:
                    break
                if not _fill(len(buf) + 1):
                    raise ValueError(
                        f"warc: truncated header block in {path}")
            header_bytes = bytes(buf[:idx])
            del buf[: idx + 4]
            headers = self._parse_headers(header_bytes, path)
            n = int(headers.get(b"content-length", b"0"))
            if not _fill(n + 4):
                raise ValueError(f"warc: truncated payload in {path}")
            payload = bytes(buf[:n])
            if buf[n : n + 4] != b"\r\n\r\n":
                raise ValueError(
                    f"warc: missing record trailer after payload in {path}")
            del buf[: n + 4]
            rows.append(self._to_row(headers, payload))
            if len(rows) >= _BATCH_RECORDS:
                yield _flush()

    @staticmethod
    def _parse_headers(block: bytes, path: str) -> dict[bytes, bytes]:
        lines = block.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"warc: record does not start with a WARC version line "
                f"in {path}: {lines[0][:40]!r}")
        out: dict[bytes, bytes] = {}
        for ln in lines[1:]:
            if not ln:
                continue
            k, _, v = ln.partition(b":")
            out[k.strip().lower()] = v.strip()
        return out

    def _to_row(self, h: dict[bytes, bytes], payload: bytes) -> dict:
        row = {
            "rec_id": h.get(b"warc-record-id", b"").decode("utf-8"),
            "rec_type": h.get(b"warc-type", b"").decode("utf-8"),
            "url": (h[b"warc-target-uri"].decode("utf-8")
                    if b"warc-target-uri" in h else None),
            "warc_ts": (_warc_date_to_us(h[b"warc-date"].decode("ascii"))
                        if b"warc-date" in h else None),
            "content_type": (h[b"content-type"].decode("utf-8")
                             if b"content-type" in h else None),
            "payload": payload,
        }
        for col, typ in self._x_cols.items():
            key = _x_header(col).lower()
            if key in h:
                raw = h[key].decode("utf-8")
                row[col] = int(raw) if typ == "int64" else raw
            else:
                row[col] = None
        return row

    def _rows_to_table(self, rows: list[dict]) -> pa.Table:
        cols: dict[str, pa.Array] = {
            "rec_id": pa.array([r["rec_id"] for r in rows], pa.string()),
            "rec_type": pa.array([r["rec_type"] for r in rows], pa.string()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], pa.int64()
            ).cast(pa.timestamp("us")),
            "content_type": pa.array(
                [r["content_type"] for r in rows], pa.string()),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        }
        for col, typ in self._x_cols.items():
            cols[col] = pa.array(
                [r[col] for r in rows],
                pa.int64() if typ == "int64" else pa.string())
        return pa.table(cols)


def read_warc(paths, *, x_cols: dict[str, str] | None = None,
              **kwargs) -> ray.data.Dataset:
    """Read WARC shards (plain or gzip) into a Dataset — streaming
    within each shard, parallel across shards."""
    return ray.data.read_datasource(
        WarcDatasource(paths, x_cols=x_cols, **kwargs))


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

class WarcDatasink(BlockBasedFileDatasink):
    """One .warc file per block (partitioned, resumable).

    Expects columns ``rec_id`` (string), ``url`` (string, nullable),
    ``warc_ts`` (timestamp[us]), ``payload`` (binary, NOT null) and
    optional ``rec_type`` / ``content_type``; every other column named
    in ``x_cols`` crosses as a ``WARC-X-`` extension header.
    """

    def __init__(self, path: str, *, x_cols: tuple[str, ...] = (),
                 rec_type: str = "resource",
                 content_type: str = "text/html",
                 compression: str | None = None, **kwargs):
        if compression not in (None, "record-gzip"):
            raise ValueError(
                "WarcDatasink: compression must be None or 'record-gzip'")
        ext = "warc.gz" if compression == "record-gzip" else "warc"
        kwargs.setdefault("file_format", ext)
        # the sink writes its own per-record gzip members; suppress
        # pyarrow's whole-file compression auto-detected from .gz
        kwargs.setdefault("open_stream_args", {"compression": None})
        super().__init__(path, **kwargs)
        self._x_cols = tuple(x_cols)
        self._rec_type = rec_type
        self._content_type = content_type
        self._compression = compression

    def write_block_to_file(self, block, file) -> None:
        t = block.to_arrow().combine_chunks()
        n = t.num_rows
        payload = t.column("payload")
        if payload.null_count:
            raise TypeError(
                "write_warc: null payloads cannot cross the WARC "
                "boundary (a record always has a body) — filter or "
                "fill them first")
        # the other mandatory header fields get the same loud,
        # column-named contract (a null here would otherwise surface
        # as an opaque AttributeError deep inside the write task)
        for col in ("rec_id", "warc_ts") + (
            ("rec_type",) if "rec_type" in t.column_names else ()
        ):
            if t.column(col).null_count:
                raise TypeError(
                    f"write_warc: null values in mandatory header "
                    f"column {col!r} — every WARC record needs it; "
                    "filter or fill them first")
        rec_ids = t.column("rec_id").to_pylist()
        urls = (t.column("url").to_pylist()
                if "url" in t.column_names else [None] * n)
        ts = pc.cast(t.column("warc_ts"), pa.int64()).to_pylist()
        rec_types = (t.column("rec_type").to_pylist()
                     if "rec_type" in t.column_names
                     else [self._rec_type] * n)
        ctypes = (t.column("content_type").to_pylist()
                  if "content_type" in t.column_names
                  else [self._content_type] * n)
        xvals = {c: t.column(c).to_pylist() for c in self._x_cols}
        pay = payload.combine_chunks() if isinstance(
            payload, pa.ChunkedArray) else payload

        parts: list[bytes] = []
        for i in range(n):
            body = pay[i].as_py()
            hdr = [b"WARC/1.1"]
            hdr.append(b"WARC-Type: " + rec_types[i].encode("utf-8"))
            hdr.append(b"WARC-Record-ID: " + rec_ids[i].encode("utf-8"))
            hdr.append(b"WARC-Date: " +
                       _ts_to_warc_date(ts[i]).encode("ascii"))
            if urls[i] is not None:
                hdr.append(b"WARC-Target-URI: " + urls[i].encode("utf-8"))
            if ctypes[i] is not None:
                hdr.append(b"Content-Type: " + ctypes[i].encode("utf-8"))
            for c in self._x_cols:
                v = xvals[c][i]
                if v is not None:
                    sv = str(v) if not isinstance(v, str) else v
                    if "\r" in sv or "\n" in sv:
                        raise ValueError(
                            f"write_warc: extension column {c!r} value "
                            "contains CR/LF — WARC headers are "
                            "line-framed; move it to the payload")
                    hdr.append(_x_header(c) + b": " + sv.encode("utf-8"))
            hdr.append(b"Content-Length: " + str(len(body)).encode("ascii"))
            rec = _CRLF.join(hdr) + b"\r\n\r\n" + body + b"\r\n\r\n"
            if self._compression == "record-gzip":
                co = zlib.compressobj(level=6, wbits=31)
                rec = co.compress(rec) + co.flush()
            parts.append(rec)
        file.write(b"".join(parts))


def write_warc(ds, path: str, *, x_cols: tuple[str, ...] = (),
               compression: str | None = None, **kwargs) -> None:
    """Write a Dataset as WARC shards, one file per block."""
    ds.write_datasink(
        WarcDatasink(path, x_cols=x_cols, compression=compression,
                     **kwargs))
