"""Unit tests for the JSONL source/sink (sources/jsonl.py): exact
pages-schema roundtrip incl. timestamp[us] and unicode, gzip shard
reading, and the loud binary-column rejection.  The full documents
roundtrip parity check runs in test_queries_vs_duckdb via the
`jsonl_roundtrip` registry entry."""

import gzip
import json
import os
import tempfile

import pyarrow as pa
import pytest

from gocrd_ray.sources import jsonl


def _pages_table() -> pa.Table:
    return pa.table({
        "url": pa.array(["http://a/x", "http://b/y", "http://c/z"]),
        "warc_ts": pa.array(
            [1700000000123456, 1700000111000001, 1699999999999999],
            pa.timestamp("us")),
        "text": pa.array(["plain", "uni é中\n line2 \"q\"", None]),
        "lang": pa.array(["en", "de", None]),
    })


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_pages_exact():
    import ray.data

    src = _pages_table()
    out = tempfile.mkdtemp(prefix="jsonl_t_", dir="/tmp")
    jsonl.write_jsonl(ray.data.from_arrow(src), out)
    back = jsonl.read_jsonl(out).take_all()
    back.sort(key=lambda r: r["url"])
    for i, row in enumerate(back):
        for c in src.column_names:
            assert row[c] == src.column(c)[i].as_py(), (c, i)


@pytest.mark.usefixtures("ray_session")
def test_read_gzip_shards():
    d = tempfile.mkdtemp(prefix="jsonl_gz_", dir="/tmp")
    rows = [{"doc_id": i, "text": f"t{i} €"} for i in range(7)]
    for shard in range(2):
        with gzip.open(os.path.join(d, f"s{shard}.jsonl.gz"), "wt",
                       encoding="utf-8") as f:
            for r in rows[shard::2]:
                f.write(json.dumps(r) + "\n")
    got = jsonl.read_jsonl(
        [os.path.join(d, "s0.jsonl.gz"), os.path.join(d, "s1.jsonl.gz")]
    ).take_all()
    got.sort(key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in got] == list(range(7))
    assert got[3]["text"] == "t3 €"


@pytest.mark.usefixtures("ray_session")
def test_write_rejects_binary_columns():
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u"]),
        "html": pa.array([b"\x00\xff"], pa.binary()),
    }))
    with pytest.raises(TypeError, match="binary"):
        jsonl.write_jsonl(ds, "/tmp/should_not_exist_jsonl")


@pytest.mark.usefixtures("ray_session")
def test_write_one_file_per_block_resumable():
    import ray.data

    ds = ray.data.range(40, override_num_blocks=4).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="jsonl_b_", dir="/tmp")
    jsonl.write_jsonl(ds, out)
    files = [f for f in os.listdir(out) if not f.startswith(".")]
    assert len(files) >= 2  # partitioned output, never one giant file
    assert jsonl.read_jsonl(out).count() == 40
