"""Unit tests for the CSV source/sink (sources/csvio.py): exact
roundtrip incl. null-vs-empty-string, embedded newlines/quotes,
timestamp[us], and the loud binary rejection.  The full documents
roundtrip parity check runs in test_queries_vs_duckdb via the
`csv_roundtrip` registry entry."""

import os
import tempfile

import pyarrow as pa
import pytest

from gocrd_ray.sources import csvio


def _tricky_table() -> pa.Table:
    return pa.table({
        "url": pa.array(["http://a", "http://b", "http://c", "http://d"]),
        "warc_ts": pa.array(
            [1700000000123456, None, 1699999999999999, 1700000000000000],
            pa.timestamp("us")),
        "text": pa.array(["", None, "line1\nline2", 'quo"te,comma é中']),
        "n": pa.array([1, None, 3, 4], pa.int64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_exact_null_vs_empty():
    import ray.data

    src = _tricky_table()
    out = tempfile.mkdtemp(prefix="csv_t_", dir="/tmp")
    csvio.write_csv(ray.data.from_arrow(src), out)
    back = csvio.read_csv(out).take_all()
    back.sort(key=lambda r: r["url"])
    for i, row in enumerate(back):
        for c in src.column_names:
            assert row[c] == src.column(c)[i].as_py(), (c, i)
    # the distinction that naive CSV loses
    assert back[0]["text"] == "" and back[1]["text"] is None


@pytest.mark.usefixtures("ray_session")
def test_write_rejects_binary_columns():
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["u"]),
        "payload": pa.array([b"\x00"], pa.binary()),
    }))
    with pytest.raises(TypeError, match="binary"):
        csvio.write_csv(ds, "/tmp/should_not_exist_csv")


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_one_file_per_block():
    import ray.data

    ds = ray.data.range(40, override_num_blocks=4).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="csv_b_", dir="/tmp")
    csvio.write_csv(ds, out)
    files = [f for f in os.listdir(out) if not f.startswith(".")]
    assert len(files) >= 2
    assert csvio.read_csv(out).count() == 40
