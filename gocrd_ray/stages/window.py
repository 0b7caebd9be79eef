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


def sessionize(events_ds, gap_minutes: int = 30):
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event (ordered by ts, event_id) exceeds the
    gap. Returns (user_id, session_seq, n_events, first_ts, last_ts).

    The groupby(user_id) hash shuffle moves raw events once; session
    assignment is a sorted linear scan per group — state never crosses
    groups, so users partition freely across the cluster.
    """
    import datetime

    gap = datetime.timedelta(minutes=gap_minutes)

    def per_user(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("ts").to_pylist(),
                group.column("event_id").to_pylist(),
            )
        )
        user = group.column("user_id")[0].as_py()
        seq = -1
        prev = None
        out = []  # (session_seq, ts)
        for ts, _eid in rows:
            if prev is None or (ts - prev) > gap:
                seq += 1
            out.append((seq, ts))
            prev = ts
        sessions = {}
        for s, ts in out:
            if s not in sessions:
                sessions[s] = [0, ts, ts]
            sessions[s][0] += 1
            sessions[s][2] = ts
        return pa.table(
            {
                "user_id": pa.array([user] * len(sessions), pa.int64()),
                "session_seq": pa.array(sorted(sessions), pa.int64()),
                "n_events": pa.array(
                    [sessions[s][0] for s in sorted(sessions)], pa.int64()
                ),
                "first_ts": pa.array(
                    [sessions[s][1] for s in sorted(sessions)],
                    pa.timestamp("us"),
                ),
                "last_ts": pa.array(
                    [sessions[s][2] for s in sorted(sessions)],
                    pa.timestamp("us"),
                ),
            }
        )

    return events_ds.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )


def preceding_window_count(
    events_ds,
    *,
    by: str = "user_id",
    anchor_type: str = "purchase",
    match_type: str = "click",
    minutes: int = 30,
):
    """Per-key banded range join: for every anchor event, the number of
    match-type events by the same key in the preceding window
    (ts − minutes, ts] — the classic "clicks in the last 30 minutes
    before each purchase" feature.

    Shape: ONE groupby(by) hash shuffle of the pruned event rows; per
    key both sides sort once and every anchor's count is two
    np.searchsorted probes — O((a+m)·log m) per key, no per-row Python,
    no cross-key state (keys partition freely across the cluster).

    Returns (event_id, ts, {by}, n_preceding).
    """
    window_us = np.int64(minutes) * 60_000_000

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b.column("event_type"),
            value_set=pa.array([anchor_type, match_type]),
        )
        return b.filter(keep).select(["event_id", "ts", by, "event_type"])

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            (by, pa.int64()),
            ("n_preceding", pa.int64()),
        ]
    )

    def per_key(group: pa.Table) -> pa.Table:
        et = group.column("event_type")
        anchors = group.filter(pc.equal(et, anchor_type))
        if anchors.num_rows == 0:
            return out_schema.empty_table()
        a_ts = anchors.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        matches = group.filter(pc.equal(et, match_type))
        m_ts = np.sort(
            matches.column("ts").to_numpy(zero_copy_only=False).astype(
                "datetime64[us]"
            ).astype(np.int64)
        )
        # count of m with a_ts - window < m <= a_ts
        lo = np.searchsorted(m_ts, a_ts - window_us, side="right")
        hi = np.searchsorted(m_ts, a_ts, side="right")
        return pa.table(
            {
                "event_id": pc.cast(anchors.column("event_id"), pa.int64()),
                "ts": anchors.column("ts"),
                by: pc.cast(anchors.column(by), pa.int64()),
                "n_preceding": pa.array(hi - lo, pa.int64()),
            }
        ).cast(out_schema)

    return (
        events_ds.map_batches(prune, batch_format="pyarrow")
        .groupby(by)
        .map_groups(per_key, batch_format="pyarrow")
    )


def sliding_window(events_ds, *, size_hours: int = 2, step_hours: int = 1):
    """Sliding event-time windows: each event contributes to every
    window [start, start+size) whose step-aligned start covers it —
    assignment happens vectorized per batch (one output row per
    (event, covered window)), then the usual partial-combine + global
    groupby. size/step in whole hours keeps window starts exact.

    Returns (window_start, event_type, n_events, sum_cents).
    """
    n_covers = size_hours // step_hours

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        # epoch hours, floored to the step grid
        step_us = np.int64(step_hours) * 3_600_000_000
        base = (ts.astype("datetime64[us]").astype(np.int64) // step_us) * step_us
        cents = np.round(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        et = batch.column("event_type")
        parts = []
        for k in range(n_covers):
            start = base - np.int64(k) * step_us
            parts.append(
                pa.table(
                    {
                        "window_start": pa.array(
                            start.astype("datetime64[us]"), pa.timestamp("us")
                        ),
                        "event_type": et,
                        "cents": pa.array(cents, pa.int64()),
                    }
                )
            )
        t = pa.concat_tables(parts)
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

    partials = events_ds.map_batches(assign, batch_format="pyarrow")
    agg = partials.groupby(["window_start", "event_type"]).sum(
        ["n_events", "sum_cents"]
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["window_start", "event_type", "n_events", "sum_cents"]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def event_funnel(events_ds, steps=("view", "click", "purchase")):
    """Ordered multi-step funnel (the product-analytics staple): how
    many users complete step 1, then step 2 STRICTLY after their first
    step-1 event, and so on. Returns one row per step:
    (step, step_name, n_users), n_users = users reaching >= step.

    Scale shape: ONE groupby(user_id) hash shuffle of the narrow
    (user, ts, type) projection; the per-user strict-order scan is
    vectorized numpy over that user's events only (groups are
    event-count-per-user sized, never corpus-sized); the per-user
    reached values collapse through a tiny (reached, n) histogram
    groupby — the returned table is len(steps) rows, the only
    driver-side materialization.
    """
    import numpy as np

    steps = tuple(steps)

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        types = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        reached = 0
        t_prev = None
        for s in steps:
            m = types == s
            if t_prev is not None:
                m = m & (ts > t_prev)
            if not m.any():
                break
            t_prev = ts[m].min()
            reached += 1
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "reached": pa.array([reached], pa.int64()),
        })

    per = events_ds.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )

    def hist(b: pa.Table) -> pa.Table:
        part = pa.TableGroupBy(b.select(["reached"]), "reached").aggregate(
            [([], "count_all")]
        )
        return part.rename_columns(["reached", "n"])

    agg = per.map_batches(hist, batch_format="pyarrow").groupby(
        "reached"
    ).sum("n")
    rows = agg.take_all()  # bounded: <= len(steps)+1 rows
    counts = {int(r["reached"]): int(r["sum(n)"]) for r in rows}
    out_n = [
        sum(n for r, n in counts.items() if r >= s)
        for s in range(1, len(steps) + 1)
    ]
    return pa.table({
        "step": pa.array(range(1, len(steps) + 1), pa.int64()),
        "step_name": pa.array(list(steps), pa.string()),
        "n_users": pa.array(out_n, pa.int64()),
    })


WEEK_US = 7 * 86400 * 1_000_000


def cohort_retention(events_ds):
    """Weekly cohort retention (the growth-analytics staple): users are
    cohorted by the week of their FIRST event; a (cohort_week,
    week_offset) cell counts the cohort's users active in that week.

    Scale shape: ONE groupby(user_id) shuffle of the narrow (user, ts)
    projection — the per-user fold (cohort = min week, distinct
    offsets) is numpy over that user's events only — then the per-user
    (cohort, offset) rows collapse through per-block DISTINCT partial
    counts into ONE narrow (cohort_week, week_offset) groupby; cells,
    not users, are what the final shuffle moves. Weeks are integer
    epoch-microsecond floors (``epoch_us // WEEK_US``) so both engines
    agree bit-for-bit.
    """
    import numpy as np

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        wk = ts.astype("datetime64[us]").astype(np.int64) // WEEK_US
        cohort = int(wk.min())
        offs = np.unique(wk - cohort)
        return pa.table({
            "cohort_week": pa.array([cohort] * len(offs), pa.int64()),
            "week_offset": pa.array(offs, pa.int64()),
        })

    cells = events_ds.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )

    def partial(b: pa.Table) -> pa.Table:
        part = pa.TableGroupBy(
            b.select(["cohort_week", "week_offset"]),
            ["cohort_week", "week_offset"],
        ).aggregate([([], "count_all")])
        return part.rename_columns(["cohort_week", "week_offset", "n"])

    agg = cells.map_batches(partial, batch_format="pyarrow").groupby(
        ["cohort_week", "week_offset"]
    ).sum("n")

    def finish(b: pa.Table) -> pa.Table:
        t = b.rename_columns(["cohort_week", "week_offset", "n_users"])
        return t.set_column(
            t.schema.get_field_index("n_users"),
            "n_users",
            pc.cast(t.column("n_users"), pa.int64()),
        )

    return agg.map_batches(finish, batch_format="pyarrow")
