"""Unit tests for the DSIR importance-resampling stage
(stages/dsir.py).  The full SQL-parity check runs in
test_queries_vs_duckdb via the `dsir_weights` registry entry; these
pin the pieces: md5 bucketing, the fixed-point term vector, a
hand-computable end-to-end score, and edge rows (empty / null text)."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import dsir


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)


def test_bucket_ids_match_md5_and_memoize():
    toks = pa.array(["alpha", "beta", "alpha", ""])
    memo = {}
    ids = dsir._bucket_ids(toks, memo)
    assert ids.tolist() == [
        _bucket("alpha"), _bucket("beta"), _bucket("alpha"), _bucket("")
    ]
    # memo carries the distinct vocabulary
    assert set(memo) == {"alpha", "beta", ""}
    # poisoned memo proves reuse (no rehash of known tokens)
    memo["alpha"] = 7
    assert dsir._bucket_ids(pa.array(["alpha"]), memo).tolist() == [7]


def test_bucket_ids_empty():
    assert dsir._bucket_ids(pa.array([], pa.string()), {}).tolist() == []


def test_term_vector_fixed_point():
    t = np.zeros(dsir.N_BUCKETS, np.int64)
    r = np.zeros(dsir.N_BUCKETS, np.int64)
    t[5], r[5] = 9, 3
    r[7] = 10
    term = dsir.dsir_term_vector(t, r)
    assert term[5] == math.floor(1e7 * math.log(10)) - math.floor(
        1e7 * math.log(4)
    )
    assert term[7] == 0 - math.floor(1e7 * math.log(11))
    # absent-everywhere buckets are exactly zero
    assert term[0] == 0 and np.count_nonzero(term) == 2


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_hand_computed():
    import ray
    import ray.data

    target = ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": ["aa aa bb"]})
    )
    raw = ray.data.from_arrow(
        pa.table({"doc_id": [2, 3], "text": ["aa bb", "cc"]})
    )
    out = {
        r["doc_id"]: r
        for r in dsir.dsir_weights(raw, target).take_all()
    }

    def fp(v):
        return math.floor(1e7 * math.log(v))

    # target counts: aa=2, bb=1; raw counts: aa=1, bb=1, cc=1
    t_aa = fp(3) - fp(2)
    t_bb = fp(2) - fp(2)
    t_cc = fp(1) - fp(2)
    assert out[2]["weight_fp"] == t_aa + t_bb
    assert out[2]["n_tokens"] == 2
    assert out[3]["weight_fp"] == t_cc
    assert out[2]["avg_weight"] == (t_aa + t_bb) / (1e7 * 2)


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_empty_and_null_text_rows():
    import ray.data

    target = ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": ["x y"]})
    )
    raw = ray.data.from_arrow(
        pa.table({"doc_id": [2, 3], "text": ["", None]})
    )
    rows = {
        r["doc_id"]: r
        for r in dsir.dsir_weights(raw, target).take_all()
    }
    # '' and NULL both tokenize to the single '' token (the SQL
    # COALESCE contract): every row survives with n_tokens == 1
    assert set(rows) == {2, 3}
    for r in rows.values():
        assert r["n_tokens"] == 1
        assert r["weight_fp"] == rows[2]["weight_fp"]


@pytest.mark.usefixtures("ray_session")
def test_hashed_bucket_counts_accumulates_across_blocks():
    """Many blocks emit partials for the SAME bucket, and iter_batches
    may concatenate several partial tables into one driver batch — the
    merge must accumulate duplicate bucket rows (np.add.at), not
    overwrite them (fancy +=)."""
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": ["a a b"] * 64})
    ).repartition(16)
    vec = dsir.hashed_bucket_counts(ds)
    assert vec.sum() == 192
    assert vec[_bucket("a")] == 128
    assert vec[_bucket("b")] == 64


@pytest.mark.usefixtures("ray_session")
def test_hashed_bucket_counts_total():
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": ["a b c", "d e", None, ""]})
    )
    vec = dsir.hashed_bucket_counts(ds)
    # 3 + 2 + 1 + 1 tokens ('' rows contribute their '' token)
    assert vec.sum() == 7
    assert vec[_bucket("a")] >= 1
