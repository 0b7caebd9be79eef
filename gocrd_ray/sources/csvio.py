"""CSV source / sink — the tabular text interchange.

Crawl metadata tables, TPC-H-style exports and spreadsheet-shaped
side tables ship as CSV.  This module reads and writes CSV shards
with an EXACT roundtrip contract, including the two cases naive CSV
loses: the null-vs-empty-string distinction (write quotes every
valid value — ``""`` — and leaves nulls as bare empty fields; the
read side maps only UNQUOTED empties back to null) and timestamps
(cross as ``YYYY-MM-DD HH:MM:SS.ffffff`` strings via the same Arrow
cast contract as :mod:`gocrd_ray.sources.jsonl`).  Embedded
newlines, quotes and unicode are handled by Arrow's quoting.

Scale shape: identical to the JSONL path — ``ray.data.read_csv``
splits the shard list into streaming blocks; the sink writes one
file per block (partitioned, resumable); binary columns are rejected
loudly (CSV has no binary type).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from .jsonl import _iso_to_ts, _ts_to_iso
from .pages import strip_schema_metadata


def write_csv(ds, path: str, *, ts_cols: tuple[str, ...] = ("warc_ts",),
              **kwargs) -> None:
    """Write a Dataset as CSV shards, one file per block.  Every
    valid value is quoted so empty string stays distinguishable from
    null on the way back."""
    bin_cols = [f.name for f in ds.schema().base_schema
                if pa.types.is_binary(f.type) or
                pa.types.is_large_binary(f.type)]
    if bin_cols:
        raise TypeError(
            f"write_csv: binary columns {bin_cols} cannot cross the "
            "CSV boundary — select them out or use write_parquet")
    # WriteOptions is an unpicklable Arrow Cython object — build it on
    # the writing worker via arrow_csv_args_fn
    kwargs.setdefault(
        "arrow_csv_args_fn",
        lambda: {"write_options":
                 pacsv.WriteOptions(quoting_style="all_valid")})
    ds.map_batches(
        _ts_to_iso, fn_kwargs={"cols": ts_cols}, batch_format="pyarrow"
    ).write_csv(path, **kwargs)


def read_csv(paths, *, ts_cols: tuple[str, ...] = ("warc_ts",),
             **kwargs) -> ray.data.Dataset:
    """Read CSV shards into a Dataset; only unquoted empty fields
    become null, and ``ts_cols`` are parsed back to timestamp[us]."""
    kwargs.setdefault("convert_options", pacsv.ConvertOptions(
        strings_can_be_null=True, quoted_strings_can_be_null=False))
    ds = ray.data.read_csv(paths, **kwargs)
    return ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    ).map_batches(
        _iso_to_ts, fn_kwargs={"cols": ts_cols}, batch_format="pyarrow"
    )
