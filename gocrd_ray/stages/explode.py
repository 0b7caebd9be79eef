"""Vectorized explode of the nested extraction hierarchy into flat views.

The reference's point-lookup surface (page.Match / Find*, SURVEY.md §2.3)
maps onto filters over flattened ``(url, region_id, line_id, word_id, …)``
tables. These batch functions turn the full-extract nested ``regions``
column (model.EXTRACT_FULL_SCHEMA) into those views using only pyarrow
kernels — ``list_flatten`` / ``list_parent_indices`` / ``struct_field`` /
``take`` — so the hot path never iterates Python rows.

Each function is a ``map_batches`` body (Arrow in / Arrow out); the
``*_flat`` helpers lift them to Dataset level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..model import LINES_FLAT_SCHEMA, REGIONS_FLAT_SCHEMA, WORDS_FLAT_SCHEMA


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _seq_within(list_arr: pa.Array) -> pa.Array:
    """0-based position of each flattened element within its parent list.

    Aligned with ``pc.list_flatten(list_arr)`` (null lists contribute no
    elements).
    """
    lengths = pc.list_value_length(list_arr).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0.0).astype(np.int64)
    total = int(lengths.sum())
    starts = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths) > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    seq = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    return pa.array(seq.astype(np.int32), type=pa.int32())


def _bbox_fields(struct_arr: pa.Array) -> dict[str, pa.Array]:
    bbox = pc.struct_field(struct_arr, "bbox")
    return {k: pc.struct_field(bbox, k) for k in ("x0", "y0", "x1", "y1")}


def _flatten_regions(batch: pa.Table):
    regions = _as_array(batch.column("regions"))
    rparents = pc.list_parent_indices(regions)
    rflat = pc.list_flatten(regions)
    rseq = _seq_within(regions)
    url = pc.take(_as_array(batch.column("url")), rparents)
    return url, rflat, rseq


def explode_regions(batch: pa.Table) -> pa.Table:
    url, rflat, rseq = _flatten_regions(batch)
    f = lambda name: pc.struct_field(rflat, name)  # noqa: E731
    cols = {
        "url": url,
        "region_id": f("region_id"),
        "tag": f("tag"),
        "rtype": f("rtype"),
        "ro_index": f("ro_index"),
        "ro_pos": f("ro_pos"),
        "ro_malformed": f("ro_malformed"),
        "doc_order": f("doc_order"),
        "region_seq": rseq,
        "text": f("text"),
        "n_lines": pc.list_value_length(f("lines")),
        **_bbox_fields(rflat),
    }
    return pa.table(cols).cast(REGIONS_FLAT_SCHEMA)


def explode_lines(batch: pa.Table) -> pa.Table:
    url, rflat, rseq = _flatten_regions(batch)
    lines = pc.struct_field(rflat, "lines")
    lparents = pc.list_parent_indices(lines)
    lflat = pc.list_flatten(lines)
    lseq = _seq_within(lines)
    take = lambda arr: pc.take(arr, lparents)  # noqa: E731
    f = lambda name: pc.struct_field(lflat, name)  # noqa: E731
    cols = {
        "url": take(url),
        "region_id": take(pc.struct_field(rflat, "region_id")),
        "region_tag": take(pc.struct_field(rflat, "tag")),
        "ro_index": take(pc.struct_field(rflat, "ro_index")),
        "doc_order": take(pc.struct_field(rflat, "doc_order")),
        "region_seq": take(rseq),
        "line_id": f("line_id"),
        "line_seq": lseq,
        "text": f("text"),
        "n_words": pc.list_value_length(f("words")),
        **_bbox_fields(lflat),
    }
    return pa.table(cols).cast(LINES_FLAT_SCHEMA)


def _words_from(batch: pa.Table, lines_field: str, line_seq_base: int) -> pa.Table:
    url, rflat, rseq = _flatten_regions(batch)
    lines = pc.struct_field(rflat, lines_field)
    lparents = pc.list_parent_indices(lines)
    lflat = pc.list_flatten(lines)
    lseq = _seq_within(lines)
    if line_seq_base:
        lseq = pc.add(lseq, pa.scalar(line_seq_base, pa.int32()))
        lseq = pc.cast(lseq, pa.int32())
    words = pc.struct_field(lflat, "words")
    wparents = pc.list_parent_indices(words)
    wflat = pc.list_flatten(words)
    wseq = _seq_within(words)
    take_l = lambda arr: pc.take(arr, lparents)  # noqa: E731
    take_w = lambda arr: pc.take(arr, wparents)  # noqa: E731
    f = lambda name: pc.struct_field(wflat, name)  # noqa: E731
    cols = {
        "url": take_w(take_l(url)),
        "region_id": take_w(take_l(pc.struct_field(rflat, "region_id"))),
        "region_tag": take_w(take_l(pc.struct_field(rflat, "tag"))),
        "ro_index": take_w(take_l(pc.struct_field(rflat, "ro_index"))),
        "doc_order": take_w(take_l(pc.struct_field(rflat, "doc_order"))),
        "region_seq": take_w(take_l(rseq)),
        "line_id": take_w(pc.struct_field(lflat, "line_id")),
        "line_tag": take_w(pc.struct_field(lflat, "tag")),
        "line_seq": take_w(lseq),
        "word_id": f("word_id"),
        "word_seq": wseq,
        "text": f("text"),
        **_bbox_fields(wflat),
    }
    return pa.table(cols).cast(WORDS_FLAT_SCHEMA)


def explode_words(batch: pa.Table) -> pa.Table:
    """All Word rows: TextLine words plus stray words (Words under
    non-TextLine region children — the /Page/*/*/Word wildcard surface).
    Stray rows get line_seq >= 100000: they sort after real lines, an
    approximation of document order that only matters for first-match
    among duplicate word ids straddling both kinds of container."""
    main = _words_from(batch, "lines", 0)
    stray = _words_from(batch, "stray_lines", 100_000)
    return pa.concat_tables([main, stray]) if stray.num_rows else main


# -- Dataset-level helpers ---------------------------------------------------


def regions_flat(full_ds, **kwargs):
    """full-extract Dataset → flattened regions Dataset."""
    return full_ds.map_batches(explode_regions, batch_format="pyarrow", **kwargs)


def lines_flat(full_ds, **kwargs):
    return full_ds.map_batches(explode_lines, batch_format="pyarrow", **kwargs)


def words_flat(full_ds, **kwargs):
    return full_ds.map_batches(explode_words, batch_format="pyarrow", **kwargs)
