"""Full-outer mode of the co-partitioned hash join (§2.6 J3's outer
variant, used by the crawl_diff query) — null-side semantics and
partition invariance beyond the DuckDB parity gate."""

import pyarrow as pa
import ray.data

from gocrd_ray.stages import join


def _mk(name_key, rows, blocks=1):
    t = pa.table(
        {
            name_key: pa.array([k for k, _ in rows], pa.int64()),
            f"{name_key[0]}val": pa.array([v for _, v in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def test_full_outer_join_emits_both_null_sides(ray_session):
    left = _mk("okey", [(1, "a"), (2, "b"), (3, "c")])
    right = _mk("nkey", [(2, "B"), (3, "X"), (4, "Y")])
    out = join.partitioned_hash_join(
        left, right, left_key="okey", right_key="nkey",
        join_type="full outer",
    ).take_all()
    got = {r["okey"]: (r["oval"], r["nval"]) for r in out}
    assert got == {
        1: ("a", None),   # left-only: right side null
        2: ("b", "B"),
        3: ("c", "X"),
        4: (None, "Y"),   # right-only: key coalesced into left name
    }


def test_full_outer_join_partition_invariant(ray_session):
    left = _mk("okey", [(i, f"l{i}") for i in range(200)], blocks=7)
    right = _mk(
        "nkey", [(i, f"r{i}") for i in range(100, 300)], blocks=5
    )
    out = join.partitioned_hash_join(
        left, right, left_key="okey", right_key="nkey",
        join_type="full outer", n_buckets=8,
    ).take_all()
    assert len(out) == 300
    by_key = {r["okey"]: r for r in out}
    assert by_key[50] == {"okey": 50, "oval": "l50", "nval": None}
    assert by_key[150] == {"okey": 150, "oval": "l150", "nval": "r150"}
    assert by_key[250] == {"okey": 250, "oval": None, "nval": "r250"}
