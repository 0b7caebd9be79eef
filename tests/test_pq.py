"""Product quantization (stages/pq.py) — exactness, path-equivalence
and shape pins.  Full DuckDB mirror equality runs in
test_queries_vs_duckdb.py via the pq_codes / pq_adc_topk registry
entries."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gocrd_ray.stages import pq
from gocrd_ray.stages.kmeans import SCALE_BITS


def _mk_ds(vecs, ids=None, blocks=1):
    ids = list(range(len(vecs))) if ids is None else ids
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in vecs],
            pa.list_(pa.float32()),
        ),
    })
    return ray.data.from_arrow(t).repartition(blocks)


def _brute_pq(vecs, ids, m, k, n_iter):
    """Driver-free reference: the module's documented recurrence,
    run independently per subspace."""
    q = np.floor(
        np.asarray(vecs, dtype=np.float32).astype(np.float64)
        * (1 << SCALE_BITS)
    ).astype(np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    dsub = q.shape[1] // m
    order = np.argsort(ids, kind="stable")[: min(k, len(ids))]
    cents = np.stack(
        [q[order][:, s * dsub:(s + 1) * dsub].copy() for s in range(m)]
    )
    for _ in range(n_iter):
        for s in range(m):
            sub = q[:, s * dsub:(s + 1) * dsub]
            d = ((sub[:, None, :] - cents[s][None]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            new = cents[s].copy()
            for j in range(k):
                msk = a == j
                if msk.any():
                    new[j] = np.floor_divide(
                        sub[msk].sum(axis=0, dtype=np.int64),
                        int(msk.sum()),
                    )
            cents[s] = new
    codes = np.empty((len(ids), m), dtype=np.int64)
    for s in range(m):
        sub = q[:, s * dsub:(s + 1) * dsub]
        d = ((sub[:, None, :] - cents[s][None]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)
    return cents, {int(i): c.tolist() for i, c in zip(ids, codes)}


def _codes_df(ds, **kw):
    out = pq.pq_codes(ds, **kw).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def test_codes_match_brute_force_and_block_invariant(ray_session):
    rng = np.random.RandomState(11)
    vecs = rng.uniform(-0.5, 0.5, size=(80, 8)).astype(np.float32)
    ids = rng.permutation(80) * 7 + 2
    _, ref = _brute_pq(vecs, ids, m=4, k=3, n_iter=2)
    for blocks in (1, 6):
        out = _codes_df(
            _mk_ds(vecs, list(ids), blocks=blocks), m=4, k=3, n_iter=2
        )
        assert len(out) == 80
        got = {
            int(r.vec_id): [int(r.c0), int(r.c1), int(r.c2), int(r.c3)]
            for r in out.itertuples()
        }
        assert got == ref
        # packed code is the big-endian base-k pack of the columns
        for r in out.itertuples():
            assert r.code == ((r.c0 * 3 + r.c1) * 3 + r.c2) * 3 + r.c3


def test_small_and_distributed_paths_bit_identical(ray_session):
    rng = np.random.RandomState(5)
    vecs = rng.uniform(-0.5, 0.5, size=(50, 6)).astype(np.float32)
    ds = _mk_ds(vecs, blocks=5)
    small = pq.fit_pq(ds, m=3, k=4, n_iter=2)  # default cap: driver
    dist = pq.fit_pq(ds, m=3, k=4, n_iter=2, small_cap_elems=0)
    assert small.shape == dist.shape == (3, 4, 2)
    assert (small == dist).all()
    sdf = _codes_df(ds, m=3, k=4, n_iter=2)
    # encoding goes through fit_pq; the distributed fit must yield the
    # same codes when injected via the same public entrypoint
    ddf = pq.pq_codes(ds, m=3, k=4, n_iter=2).to_pandas()
    ddf = ddf.sort_values("vec_id").reset_index(drop=True)
    assert sdf.equals(ddf)


def test_dim_not_divisible_is_loud(ray_session):
    ds = _mk_ds([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    with pytest.raises(ValueError, match="split evenly"):
        pq.fit_pq(ds, m=2, k=2, n_iter=1)


def test_adc_equals_table_free_recompute(ray_session):
    """ADC distances must equal the explicit per-pair sum of
    query-subvector-to-assigned-centroid distances (the lookup table
    is an optimization, not an approximation of the contract)."""
    rng = np.random.RandomState(23)
    vecs = rng.uniform(-0.5, 0.5, size=(40, 8)).astype(np.float32)
    ids = list(range(40))
    m, k = 4, 3
    cents, codes = _brute_pq(vecs, ids, m=m, k=k, n_iter=2)
    q = np.floor(
        vecs.astype(np.float64) * (1 << SCALE_BITS)
    ).astype(np.int64)
    dsub = q.shape[1] // m
    out = pq.pq_adc_topk(
        _mk_ds(vecs, ids, blocks=4), [0, 1], k_neighbors=40,
        m=m, k=k, n_iter=2,
    ).to_pandas()
    assert set(out.query_id) == {0, 1}
    for r in out.itertuples():
        expect = 0
        for s in range(m):
            c = cents[s][codes[int(r.neighbor_id)][s]]
            d = q[int(r.query_id), s * dsub:(s + 1) * dsub] - c
            expect += int((d * d).sum())
        assert int(r.adc_dist_fp) == expect
    # ranks are 1..k dense per query, ordered by (dist, neighbor_id)
    for qid in (0, 1):
        sub = out[out.query_id == qid].sort_values("rank")
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))
        pairs = list(zip(sub.adc_dist_fp, sub.neighbor_id))
        assert pairs == sorted(pairs)
        assert qid not in set(sub.neighbor_id)


def test_adc_excludes_query_and_caps_k(ray_session):
    vecs = np.eye(6, 8, dtype=np.float32) * 0.3
    out = pq.pq_adc_topk(
        _mk_ds(vecs), [0], k_neighbors=3, m=2, k=2, n_iter=1
    ).to_pandas()
    assert len(out) == 3
    assert 0 not in set(out.neighbor_id)
