"""Corpus metrics — per-host aggregates with explicit partial
aggregation (SURVEY.md §2.4 A4).

host = url authority. The combiner runs inside map_batches (one Arrow
group_by per batch), so the global shuffle only moves one row per
(batch, host) — at 10^12 docs with ~10^7 hosts this is the difference
between shuffling 10^12 rows and ~10^8 partials.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scalars import host_of_url as host_of


def per_host_partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "host": host_of(batch.column("url")),
            "n_words": pc.cast(batch.column("n_words"), pa.int64()),
            "is_error": pc.cast(
                pc.is_valid(batch.column("error")), pa.int64()
            ),
        }
    )
    part = pa.TableGroupBy(t, "host").aggregate(
        [("n_words", "sum"), ("is_error", "sum"), ("host", "count")]
    )
    name_map = {
        "n_words_sum": "total_words",
        "is_error_sum": "n_errors",
        "host_count": "n_docs",
        "host": "host",
    }
    return part.rename_columns([name_map[c] for c in part.column_names])


def per_host_stats(extracted_ds):
    """(host, n_docs, total_words, n_errors) over the extraction output."""
    partials = extracted_ds.map_batches(per_host_partial, batch_format="pyarrow")
    agg = partials.groupby("host").sum(["n_docs", "total_words", "n_errors"])

    def rename(b: pa.Table) -> pa.Table:
        out = {"host": b.column("host")}
        for src, dst in (
            ("sum(n_docs)", "n_docs"),
            ("sum(total_words)", "total_words"),
            ("sum(n_errors)", "n_errors"),
        ):
            out[dst] = b.column(src)
        return pa.table(out)

    return agg.map_batches(rename, batch_format="pyarrow")


def top_hosts(extracted_ds, n: int = 10):
    """Top-n hosts by document count, host ascending as tiebreak —
    deterministic under ties (a bare LIMIT after sort-desc is not)."""
    stats = per_host_stats(extracted_ds)
    return stats.sort(["n_docs", "host"], descending=[True, False]).limit(n)
