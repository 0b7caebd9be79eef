"""Windowed aggregation over the events stream table.

The reference has no streaming features (SURVEY.md §2.10); this is
[scale] plumbing: tumbling event-time windows as a two-phase aggregate —
per-batch PARTIAL groupby inside map_batches (the combiner), then a
small global groupby over partials. Only (window, key, partial-counts)
rows ever shuffle, never raw events.

Money-typed values are summed as integer cents (round(value*100)) so the
result is order-independent and bit-exact vs the SQL oracle — float
summation order would differ between engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_partial(batch: pa.Table, unit: str = "hour") -> pa.Table:
    """events batch → partial (window_start, event_type, n_events, sum_cents)."""
    win = pc.floor_temporal(batch.column("ts"), unit=unit)
    cents = pa.array(
        np.round(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64),
        pa.int64(),
    )
    t = pa.table(
        {
            "window_start": win,
            "event_type": batch.column("event_type"),
            "cents": cents,
        }
    )
    part = pa.TableGroupBy(t, ["window_start", "event_type"]).aggregate(
        [("cents", "sum"), ("cents", "count")]
    )
    name_map = {
        "window_start": "window_start",
        "event_type": "event_type",
        "cents_sum": "sum_cents",
        "cents_count": "n_events",
    }
    return part.rename_columns([name_map[c] for c in part.column_names])


def tumbling_window(events_ds, unit: str = "hour"):
    """Tumbling-window count + cent-sum per event_type.

    Returns a Dataset of (window_start, event_type, n_events, sum_cents).
    """
    partials = events_ds.map_batches(
        tumbling_partial, fn_kwargs={"unit": unit}, batch_format="pyarrow"
    )
    agg = partials.groupby(["window_start", "event_type"]).sum(
        ["n_events", "sum_cents"]
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["window_start", "event_type", "n_events", "sum_cents"]
        )

    return agg.map_batches(rename, batch_format="pyarrow")
