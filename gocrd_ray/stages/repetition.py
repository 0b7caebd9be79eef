"""Repetition-based quality signals (the duplicate-line family of the
Gopher rules, Rae et al. 2021 Appendix A): per document, how much of it
is the same line repeated.

Pure per-row map — no shuffle at any scale. All integer outputs
(counts and codepoint totals, never floats) so the result is
order-independent and bit-checkable against the SQL mirror; callers
derive the Gopher ratios (dup_line_frac = n_dup_lines / n_lines,
dup_line_char_frac = dup_line_chars / total_line_chars) downstream.

Vectorization: one C++ split per batch, then TWO pyarrow group_by
passes ((row, line) → line counts, then scatter-add per row) — no
Python loop over rows or lines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def repetition_stats_batch(batch: pa.Table, *, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """(id, n_lines, n_dup_lines, dup_line_chars, total_line_chars).

    A "dup line" is any occurrence beyond the first of a line string
    within one document (so n_dup_lines = n_lines − n_distinct_lines);
    dup_line_chars counts EVERY occurrence of a repeated line,
    total_line_chars is the codepoint sum over all lines (newlines
    excluded by the split). Matches the SQL mirror by construction.
    """
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(col, ""), "\n")
    flat = pc.list_flatten(lines)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)

    n = len(batch)
    n_lines = np.zeros(n, dtype=np.int64)
    n_dup = np.zeros(n, dtype=np.int64)
    dup_chars = np.zeros(n, dtype=np.int64)
    tot_chars = np.zeros(n, dtype=np.int64)
    if len(flat):
        per_line = (
            pa.table({"row": pa.array(parents), "line": flat,
                      "len": pa.array(lens)})
            .group_by(["row", "line"])
            .aggregate([("len", "min"), ("len", "count")])
        )
        rows = per_line.column("row").to_numpy(zero_copy_only=False)
        llen = per_line.column("len_min").to_numpy(zero_copy_only=False)
        c = per_line.column("len_count").to_numpy(zero_copy_only=False)
        np.add.at(n_lines, rows, c)
        np.add.at(n_dup, rows, c - 1)
        np.add.at(tot_chars, rows, c * llen)
        rep = c > 1
        np.add.at(dup_chars, rows[rep], (c * llen)[rep])
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_lines": pa.array(n_lines),
            "n_dup_lines": pa.array(n_dup),
            "dup_line_chars": pa.array(dup_chars),
            "total_line_chars": pa.array(tot_chars),
        }
    )


def repetition_stats(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document duplicate-line counts as a streaming map."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
