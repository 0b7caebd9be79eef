"""Unit tests for the WARC source/sink (sources/warc.py): byte-exact
payload roundtrip (embedded CRLFCRLF framing bytes, non-UTF8), the
timestamp[us] WARC/1.1 date contract, null-vs-empty extension
headers, record-gzip member compression, streaming batch bounds, and
the loud null-payload / CR-LF-header rejections.  The full documents
roundtrip parity check runs in test_queries_vs_duckdb via the
`warc_roundtrip` registry entry."""

import gzip
import os
import tempfile

import pyarrow as pa
import pytest

from gocrd_ray.sources import warc


def _tricky_table() -> pa.Table:
    return pa.table({
        "rec_id": pa.array([f"<urn:x:{i}>" for i in range(5)]),
        "url": pa.array(
            ["http://a", None, "http://c/é中?q=1", "http://d", "http://e"]),
        "warc_ts": pa.array(
            [1488772926123456, 0, 999999, 1700000000000000,
             1488772926000000],
            pa.timestamp("us")),
        # payloads carry the record trailer bytes and non-UTF8 — the
        # Content-Length framing must keep them intact
        "payload": pa.array(
            [b"", b"\r\n\r\n", b"\xff\x00WARC/1.1\r\n", b"x" * 10000,
             "unicode é中".encode()],
            pa.binary()),
        "lang": pa.array(["de", None, "", "fr", "la"]),
        "n_chars": pa.array([0, None, 11, 10000, 12], pa.int64()),
    })


def _roundtrip(src: pa.Table, compression):
    import ray.data

    out = tempfile.mkdtemp(prefix="warc_t_", dir="/tmp")
    warc.write_warc(
        ray.data.from_arrow(src), out, x_cols=("lang", "n_chars"),
        compression=compression)
    back = warc.read_warc(
        out, x_cols={"lang": "string", "n_chars": "int64"}).take_all()
    back.sort(key=lambda r: r["rec_id"])
    return out, back


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("compression", [None, "record-gzip"])
def test_roundtrip_exact(compression):
    src = _tricky_table()
    out, back = _roundtrip(src, compression)
    for i, row in enumerate(back):
        for c in src.column_names:
            assert row[c] == src.column(c)[i].as_py(), (c, i)
    # null extension header vs empty-string extension header survive
    assert back[1]["lang"] is None and back[2]["lang"] == ""
    # defaults fill the unset record headers
    assert back[0]["rec_type"] == "resource"
    assert back[0]["content_type"] == "text/html"
    files = [f for f in os.listdir(out) if not f.startswith(".")]
    ext = ".warc.gz" if compression else ".warc"
    assert all(f.endswith(ext) for f in files)


@pytest.mark.usefixtures("ray_session")
def test_record_gzip_is_member_per_record():
    """CommonCrawl layout: each record its own gzip member — a plain
    gzip.decompress of the FIRST member yields exactly one record."""
    src = _tricky_table()
    out, _ = _roundtrip(src, "record-gzip")
    f = sorted(os.listdir(out))[0]
    raw = open(os.path.join(out, f), "rb").read()
    d = gzip.zlib.decompressobj(wbits=31)
    first = d.decompress(raw)
    assert first.startswith(b"WARC/1.1\r\n")
    assert first.endswith(b"\r\n\r\n")
    assert d.unused_data.startswith(b"\x1f\x8b")  # next member follows


@pytest.mark.usefixtures("ray_session")
def test_write_rejects_null_payload_and_crlf_headers():
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "rec_id": pa.array(["<urn:x:0>"]),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "payload": pa.array([None], pa.binary()),
    }))
    with pytest.raises(Exception, match="null payload"):
        warc.write_warc(ds, "/tmp/should_not_exist_warc")

    ds2 = ray.data.from_arrow(pa.table({
        "rec_id": pa.array(["<urn:x:0>"]),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "payload": pa.array([b"x"], pa.binary()),
        "lang": pa.array(["de\r\nWARC-Type: injected"]),
    }))
    with pytest.raises(Exception, match="CR/LF"):
        warc.write_warc(ds2, "/tmp/should_not_exist_warc2",
                        x_cols=("lang",))


@pytest.mark.usefixtures("ray_session")
def test_truncated_and_garbage_inputs_fail_loudly():
    import ray.data

    d = tempfile.mkdtemp(prefix="warc_bad_", dir="/tmp")
    with open(os.path.join(d, "t.warc"), "wb") as f:
        f.write(b"WARC/1.1\r\nWARC-Record-ID: <u:1>\r\n"
                b"Content-Length: 100\r\n\r\nshort")
    with pytest.raises(Exception, match="truncated"):
        warc.read_warc(d).take_all()

    d2 = tempfile.mkdtemp(prefix="warc_bad2_", dir="/tmp")
    with open(os.path.join(d2, "t.warc"), "wb") as f:
        f.write(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(Exception, match="WARC version"):
        warc.read_warc(d2).take_all()


@pytest.mark.usefixtures("ray_session")
def test_streaming_batches_bounded():
    """A single shard with more records than _BATCH_RECORDS parses
    into MULTIPLE yielded batches — the within-file streaming bound."""
    import ray.data

    n = warc._BATCH_RECORDS + 10
    t = pa.table({
        "rec_id": pa.array([f"<urn:x:{i:06d}>" for i in range(n)]),
        "warc_ts": pa.array([i for i in range(n)], pa.timestamp("us")),
        "payload": pa.array([b"p%d" % i for i in range(n)], pa.binary()),
    })
    out = tempfile.mkdtemp(prefix="warc_big_", dir="/tmp")
    warc.write_warc(
        ray.data.from_arrow(t).repartition(1), out)
    src = warc.WarcDatasource(out)
    path = [os.path.join(out, f) for f in os.listdir(out)][0]
    with open(path, "rb") as f:
        batches = list(src._parse_records(
            iter(lambda: f.read(1 << 16) or None, None), path))
    assert len(batches) == 2
    assert sum(b.num_rows for b in batches) == n
    ds = warc.read_warc(out)
    assert ds.count() == n
