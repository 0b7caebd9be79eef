"""Round-4 ADVICE fixes: (1) _hash2's object-container integer path
must fail LOUDLY when the int64 cast fails (None / mixed types) instead
of silently diverging from the int64 fast path — the silent form made
``Bloom.contains`` return False for every blocked key; (2) build-side
scans drop nulls like the probe side; (3) the one-pass
``bloom_blocklist_filter_ds`` scans its input exactly once."""

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import bloom


def test_hash2_object_int_with_none_raises():
    arr = np.asarray([3, 77, 150, None], dtype=object)
    with pytest.raises(TypeError, match="object container"):
        bloom._hash2(arr)


def test_hash2_object_int_mixed_types_raises():
    arr = np.asarray([3, "x", 150], dtype=object)
    with pytest.raises(TypeError, match="object container"):
        bloom._hash2(arr)


def test_hash2_pure_object_ints_match_int64_fast_path():
    keys = [3, 77, 150, 9]
    h_obj = bloom._hash2(np.asarray(keys, dtype=object))
    h_i64 = bloom._hash2(np.asarray(keys, dtype=np.int64))
    assert np.array_equal(h_obj[0], h_i64[0])
    assert np.array_equal(h_obj[1], h_i64[1])


def test_blocklist_filter_tolerates_none_in_blocked(ray_session):
    """The ADVICE repro: Bloom built from [3, 77, 150, None] must still
    block int64 probes 3/77/150 (the old silent-fallback build blocked
    NOTHING because the probe side hashed via the int64 fast path)."""
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([3, 9, 77, 150, 42], pa.int64())})
    )
    kept = bloom.bloom_blocklist_filter(
        ds, [3, 77, 150, None], key_col="k"
    ).take_all()
    assert sorted(r["k"] for r in kept) == [9, 42]


def test_build_from_dataset_drops_null_keys(ray_session):
    """Null-bearing int64 blocklist datasets must build (nulls dropped,
    matching the probe side) on BOTH the small and sharded paths, and
    the two paths stay bit-identical."""
    import ray.data

    keys = pa.table(
        {"k": pa.array([5, None, 123, None, 999_999], pa.int64())}
    )
    kds = ray.data.from_arrow(keys)
    small = bloom.build_from_dataset(kds, key_col="k", n_expected=3)
    big = bloom.build_from_dataset(
        kds, key_col="k", n_expected=3, small_threshold=0
    )
    assert np.array_equal(small.bits, big.bits)
    probe = np.asarray([5, 123, 999_999, 7], dtype=np.int64)
    assert small.contains(probe).tolist() == [True, True, True, False]


def _expected_kept(path, blocked):
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["doc_id"])
    return sorted(
        v for v in t.column("doc_id").to_pylist() if v not in blocked
    )


@pytest.mark.parametrize("one_pass", [True, False])
def test_filter_ds_one_pass_matches_two_scan(ray_session, one_pass):
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id"])
    blocked = {3, 10, 25, 999_999_999}
    bds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(sorted(blocked), pa.int64())})
    )
    kept = bloom.bloom_blocklist_filter_ds(
        ds, bds, key_col="doc_id", one_pass=one_pass
    )
    got = sorted(r["doc_id"] for r in kept.take_all())
    assert got == _expected_kept(path, blocked)


def test_one_pass_scans_input_once(ray_session):
    """The one-pass shape must have exactly ONE read of the input in
    the executor plan (r4 verdict #3); the two-scan shape has two."""
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    bds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([3, 10], pa.int64())})
    )

    def n_reads(one_pass):
        ds = ray.data.read_parquet(path, columns=["doc_id"])
        out = bloom.bloom_blocklist_filter_ds(
            ds, bds, key_col="doc_id", one_pass=one_pass
        ).materialize()
        return out.stats().count("ReadParquet")

    assert n_reads(True) == 1
    assert n_reads(False) >= 2
