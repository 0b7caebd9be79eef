"""HyperLogLog: accuracy vs exact distinct, associativity of merges."""

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages.sketch import HyperLogLog, distinct_tokens


def test_accuracy_across_scales():
    for n in (100, 5000, 100_000):
        vals = [f"value-{i}" for i in range(n)]
        est = HyperLogLog().add(vals).estimate()
        assert abs(est - n) / n < 0.05, (n, est)


def test_merge_equals_single_pass():
    a = [f"x{i}" for i in range(3000)]
    b = [f"x{i}" for i in range(1500, 4500)]  # overlapping
    single = HyperLogLog().add(a + b)
    merged = HyperLogLog().add(a).merge(HyperLogLog().add(b))
    assert np.array_equal(single.registers, merged.registers)
    est = merged.estimate()
    assert abs(est - 4500) / 4500 < 0.05


def test_serialization_roundtrip():
    h = HyperLogLog().add([str(i) for i in range(1000)])
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)


def test_distinct_tokens_vs_exact(ray_session):
    import duckdb
    import ray.data

    docs = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet")
    est = distinct_tokens(docs)
    exact = duckdb.sql(
        "SELECT count(DISTINCT t.tok) FROM ("
        "SELECT unnest(string_split(text,' ')) AS tok FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')) t"
    ).fetchone()[0]
    assert abs(est - exact) / max(exact, 1) < 0.1, (est, exact)
