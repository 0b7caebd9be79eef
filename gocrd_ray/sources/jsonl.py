"""JSONL source / sink — the web-text interchange format.

Large public text corpora (Dolma, RedPajama, fineweb dumps) ship as
gzipped JSON-lines of text documents, not Parquet.  This module reads
and writes that shape with an exact roundtrip contract for the
TEXT-mode pages / documents schemas (strings, int64, timestamps at
microsecond precision).  Raw ``html`` bytes stay Parquet-only — JSON
has no binary type, and the text interchange is what the format is
used for in practice.

Scale shape: ``ray.data.read_json`` splits the shard list into blocks
exactly like ``read_parquet`` (thousands of .jsonl.gz shards →
streaming read → extract → write, no driver materialization); the
sink writes one file per block so output stays resumable and
partitioned.  Timestamp columns cross the text boundary as
``YYYY-MM-DD HH:MM:SS.ffffff`` strings via Arrow's vectorized
timestamp↔string CASTS (always 6 fractional digits, so the
timestamp[us] roundtrip is bit-exact; the space separator also keeps
the Arrow JSON reader's type inference from grabbing the column, so
every shard reads back with a stable string schema).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .pages import strip_schema_metadata


def _ts_to_iso(batch: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    for c in cols:
        if c in batch.column_names:
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c, pc.cast(batch.column(c), pa.string()))
    return batch


def _iso_to_ts(batch: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    for c in cols:
        if c in batch.column_names:
            col = batch.column(c)
            i = batch.schema.get_field_index(c)
            # defensive: a shard whose column the JSON reader DID
            # infer as timestamp casts the same way
            batch = batch.set_column(
                i, c, pc.cast(col, pa.timestamp("us")))
    return batch


def write_jsonl(ds, path: str, *, ts_cols: tuple[str, ...] = ("warc_ts",),
                **kwargs) -> None:
    """Write a Dataset as JSON-lines, one file per block (resumable,
    partitioned output).  Timestamp columns serialize as ISO-8601
    microseconds; binary columns are rejected loudly (JSON has no
    binary type — keep html on the Parquet path)."""
    bin_cols = [f.name for f in ds.schema().base_schema
                if pa.types.is_binary(f.type) or
                pa.types.is_large_binary(f.type)]
    if bin_cols:
        raise TypeError(
            f"write_jsonl: binary columns {bin_cols} cannot cross the "
            "JSON boundary — select them out or use write_parquet")
    ds.map_batches(
        _ts_to_iso, fn_kwargs={"cols": ts_cols}, batch_format="pyarrow"
    ).write_json(path, **kwargs)


def read_jsonl(paths, *, ts_cols: tuple[str, ...] = ("warc_ts",),
               **kwargs) -> ray.data.Dataset:
    """Read JSON-lines shards (plain or .gz) into a Dataset; timestamp
    columns named in ``ts_cols`` are parsed back to timestamp[us].

    Compression is decided per CALL, not per file (Ray's open-stream
    args are global to the read), so a path list must be uniformly
    plain or uniformly .gz — mixed lists raise loudly here instead of
    failing inside read tasks (or worse, gunzipping plain shards);
    issue two reads and ``union`` them."""
    path_list = list(paths) if isinstance(paths, (list, tuple)) else [paths]
    gz = {str(p).endswith(".gz") for p in path_list}
    if gz == {True, False}:
        raise ValueError(
            "read_jsonl: mixed .gz and plain shards in one call — "
            "compression is a per-call setting; read each group "
            "separately and union the Datasets"
        )
    if gz == {True}:
        kwargs.setdefault("arrow_open_stream_args", {"compression": "gzip"})
        kwargs.setdefault("file_extensions", None)
    ds = ray.data.read_json(paths, **kwargs)
    return ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    ).map_batches(
        _iso_to_ts, fn_kwargs={"cols": ts_cols}, batch_format="pyarrow"
    )
