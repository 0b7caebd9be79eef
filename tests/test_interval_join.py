"""interval_join_broadcast (stages/join.py) — range-join semantics
pins.  The DuckDB mirror equality runs in test_queries_vs_duckdb.py
via the events_range_join registry entry."""

import pyarrow as pa
import ray.data

from gocrd_ray.stages import join


def _left(ts, ids=None, blocks=1):
    ids = list(range(len(ts))) if ids is None else ids
    t = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
    })
    return ray.data.from_arrow(t).repartition(blocks)


def _intervals(rows):
    return pa.table({
        "window_id": pa.array([r[0] for r in rows], pa.int64()),
        "lo": pa.array([r[1] for r in rows], pa.int64()),
        "hi": pa.array([r[2] for r in rows], pa.int64()),
    })


def _run(ds, iv, **kw):
    out = join.interval_join_broadcast(
        ds, iv, ts_col="ts", left_cols=["event_id"],
        interval_cols=["window_id"], **kw
    ).to_pandas()
    return sorted(map(tuple, out[["event_id", "window_id"]].values.tolist()))


def test_overlapping_intervals_multi_match(ray_session):
    iv = _intervals([(0, 0, 15), (1, 10, 25)])  # overlap on [10, 15)
    got = _run(_left([5, 12, 20, 30]), iv)
    assert got == [(0, 0), (1, 0), (1, 1), (2, 1)]  # 30 matches none


def test_half_open_bounds(ray_session):
    iv = _intervals([(7, 10, 20)])
    got = _run(_left([9, 10, 19, 20]), iv)
    assert got == [(1, 7), (2, 7)]  # lo inclusive, hi exclusive


def test_block_layout_invariant(ray_session):
    iv = _intervals([(0, 0, 50), (1, 25, 100), (2, 90, 200)])
    ts = list(range(0, 150, 7))
    ref = _run(_left(ts), iv)
    assert _run(_left(ts, blocks=5), iv) == ref
    assert len(ref) > len(ts)  # overlaps really multi-match


def test_timestamp_column_compares_as_epoch_us(ray_session):
    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([base, base + 10], pa.timestamp("us")),
    })
    iv = _intervals([(0, base, base + 5)])
    out = join.interval_join_broadcast(
        ray.data.from_arrow(t), iv, ts_col="ts",
        left_cols=["event_id"], interval_cols=["window_id"],
    ).to_pandas()
    assert out.event_id.tolist() == [1]


def test_no_match_rows_drop_and_schema_stable(ray_session):
    iv = _intervals([(0, 1000, 2000)])
    out = join.interval_join_broadcast(
        _left([1, 2, 3], blocks=3), iv, ts_col="ts",
        left_cols=["event_id"], interval_cols=["window_id"],
    )
    assert sorted(out.schema().names) == ["event_id", "window_id"]
    assert out.count() == 0
