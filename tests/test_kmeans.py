"""Distributed Lloyd's k-means (stages/kmeans.py) — exactness and
path-equivalence pins.  The full DuckDB mirror equality runs in
test_queries_vs_duckdb.py via the kmeans_clusters registry entry."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gocrd_ray.stages import kmeans


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


def _brute(vecs, ids, k, n_iter):
    """Driver-free reference: the module's documented recurrence."""
    q = np.floor(
        np.asarray(vecs, dtype=np.float32).astype(np.float64)
        * (1 << kmeans.SCALE_BITS)
    ).astype(np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    cents = q[order[: min(k, len(ids))]].copy()
    for _ in range(n_iter):
        d = ((q[:, None, :] - cents[None]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = cents.copy()
        for j in range(len(cents)):
            m = a == j
            if m.any():
                new[j] = np.floor_divide(
                    q[m].sum(axis=0, dtype=np.int64), int(m.sum())
                )
        cents = new
    d = ((q[:, None, :] - cents[None]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    return ids, a, d[np.arange(len(a)), a]


def _run(ds, **kw):
    out = kmeans.lloyd_kmeans(ds, **kw).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def test_matches_brute_force_and_block_invariant(ray_session):
    rng = np.random.RandomState(7)
    vecs = rng.uniform(-0.5, 0.5, size=(90, 6)).astype(np.float32)
    ids = rng.permutation(90) * 3 + 1  # non-contiguous, shuffled ids
    ref_ids, ref_a, ref_d = _brute(vecs, ids, k=5, n_iter=3)
    ref = {
        int(i): (int(a), int(d))
        for i, a, d in zip(ref_ids, ref_a, ref_d)
    }
    for blocks in (1, 7):
        out = _run(_mk_ds(vecs, list(ids), blocks=blocks), k=5, n_iter=3)
        assert len(out) == 90
        got = {
            int(r.vec_id): (int(r.cluster), int(r.dist_fp))
            for r in out.itertuples()
        }
        assert got == ref


def test_small_and_distributed_paths_bit_identical(ray_session):
    rng = np.random.RandomState(3)
    vecs = rng.uniform(-0.5, 0.5, size=(60, 5)).astype(np.float32)
    ds = _mk_ds(vecs, blocks=5)
    small = _run(ds, k=4, n_iter=2)  # default cap -> driver-local
    dist = _run(ds, k=4, n_iter=2, small_cap_elems=0)  # force actors
    assert small.equals(dist)


def test_empty_cluster_keeps_centroid(ray_session):
    # two tight groups, k=3: the seed from the third id starts inside
    # group A, loses all members after iteration 1, and must retain
    # its (updated-from-nothing) centroid instead of crashing/NaN
    vecs = [[0.0, 0.0], [0.01, 0.0], [0.02, 0.0],
            [0.4, 0.4], [0.41, 0.4], [0.42, 0.4]]
    out = _run(_mk_ds(vecs), k=3, n_iter=3)
    assert len(out) == 6
    # both groups end in internally-consistent clusters
    a = out.cluster.tolist()
    assert len({a[0], a[1], a[2]}) == 1 or len({a[3], a[4], a[5]}) == 1


def test_k_exceeding_corpus_degrades(ray_session):
    out = _run(_mk_ds([[0.1, 0.2], [0.3, 0.4]]), k=8, n_iter=2)
    assert len(out) == 2
    assert set(out.cluster) <= {0, 1}


def test_tie_breaks_to_lowest_cluster(ray_session):
    # a point equidistant from two identical centroids must take the
    # lower cluster index (the SQL ORDER BY dist, cl contract)
    vecs = [[0.1, 0.1], [0.1, 0.1], [0.1, 0.1]]
    out = _run(_mk_ds(vecs), k=2, n_iter=1)
    assert out.cluster.tolist() == [0, 0, 0]


def test_overflow_guard_is_loud(ray_session):
    ds = _mk_ds([[4096.0, 0.0]])  # |q| = 2^32 > 2^31 guard
    with pytest.raises(Exception, match="overflow guard"):
        kmeans.lloyd_kmeans(ds, k=1, n_iter=1).take_all()


def test_empty_input_is_loud(ray_session):
    ds = _mk_ds([[0.1, 0.2]]).filter(lambda r: False)
    with pytest.raises(ValueError, match="empty input"):
        kmeans.lloyd_kmeans(ds, k=2, n_iter=1)


def test_semdedup_kmeans_drops_exact_duplicates(ray_session):
    rng = np.random.RandomState(11)
    vecs = rng.uniform(-0.5, 0.5, size=(40, 8)).astype(np.float32)
    # random vectors never reach 0.95 cosine; inject exact dups of the
    # first 6 under new ids — exactly one of each pair must survive
    all_vecs = np.concatenate([vecs, vecs[:6]])
    ids = list(range(40)) + [100 + i for i in range(6)]
    out = kmeans.semdedup_kmeans(
        _mk_ds(all_vecs, ids, blocks=4), threshold=0.95, k=4, n_iter=2
    ).to_pandas()
    assert len(out) == 46
    dropped = set(out[~out.keep].vec_id)
    # the duplicate has identical dist_fp; tie-break by id keeps the
    # ORIGINAL (smaller id) and drops the +100 copy
    assert dropped == {100 + i for i in range(6)}


def test_semdedup_kmeans_all_kept_without_dups(ray_session):
    rng = np.random.RandomState(5)
    vecs = rng.uniform(-0.5, 0.5, size=(30, 8)).astype(np.float32)
    out = kmeans.semdedup_kmeans(
        _mk_ds(vecs, blocks=3), threshold=0.95, k=4, n_iter=2
    ).to_pandas()
    assert len(out) == 30 and out.keep.all()


def test_semdedup_kmeans_clusters_match_lloyd(ray_session):
    # the partition must be exactly lloyd_kmeans' assignment
    rng = np.random.RandomState(9)
    vecs = rng.uniform(-0.5, 0.5, size=(50, 6)).astype(np.float32)
    ds = _mk_ds(vecs, blocks=4)
    sd = kmeans.semdedup_kmeans(ds, k=3, n_iter=2).to_pandas()
    km = kmeans.lloyd_kmeans(ds, k=3, n_iter=2).to_pandas()
    merged = sd.merge(km, on="vec_id", suffixes=("_sd", "_km"))
    assert (merged.cluster_sd == merged.cluster_km).all()


def test_ivf_fixed_full_probe_equals_brute_force(ray_session):
    from gocrd_ray.stages import similarity

    rng = np.random.RandomState(21)
    vecs = rng.uniform(-0.5, 0.5, size=(80, 8)).astype(np.float32)
    ds = _mk_ds(vecs, blocks=4)
    ivf = kmeans.ivf_topk_fixed(
        ds, [0, 1, 2], k=5, n_buckets=4, n_iter=2, n_probe=4
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    bf = similarity.brute_force_topk(ds, [0, 1, 2], k=5).to_pandas()
    bf = bf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert ivf[["query_id", "neighbor_id", "rank"]].equals(
        bf[["query_id", "neighbor_id", "rank"]]
    )


def test_ivf_fixed_partial_probe_is_deterministic_subset(ray_session):
    rng = np.random.RandomState(22)
    vecs = rng.uniform(-0.5, 0.5, size=(80, 8)).astype(np.float32)
    ds = _mk_ds(vecs, blocks=4)
    a = kmeans.ivf_topk_fixed(
        ds, [0, 1], k=5, n_buckets=4, n_iter=2, n_probe=2
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = kmeans.ivf_topk_fixed(
        _mk_ds(vecs, blocks=9), [0, 1], k=5, n_buckets=4, n_iter=2,
        n_probe=2,
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    # block-layout invariant (the approximation is a function of the
    # data, not the partitioning)
    assert a.equals(b)
    # every returned neighbor lives in a probed bucket of its query
    labels = kmeans.lloyd_kmeans(
        ds, k=4, n_iter=2
    ).to_pandas().set_index("vec_id").cluster
    for qid in (0, 1):
        got = a[a.query_id == qid].neighbor_id
        assert len(got) == 5
        assert len(set(labels[got])) <= 2


# -- bitext_match (large x large co-partitioned similarity join) -------------


def _mk_sided(vecs, sides, ids=None, blocks=1):
    ids = list(range(len(vecs))) if ids is None else ids
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
        ),
        "side": pa.array(sides, pa.int64()),
    })
    return ray.data.from_arrow(t).repartition(blocks)


def _bitext(ds, **kw):
    rows = kmeans.bitext_match(ds, **kw).take_all()
    return {r["query_id"]: (r["match_id"], r["dist_fp"]) for r in rows}


def test_bitext_match_known_case_and_ties(ray_session):
    # two well-separated groups; k=2 with ids 0,1 as seeds puts them in
    # distinct clusters. Targets 0,2 are EQUIDISTANT from query 5
    # (tie -> lowest target id); query 7 sits alone with target 4.
    # All coords are powers of two so float32 represents them exactly
    # and the quantized tie is genuine.
    vecs = [
        [0.0, 0.0],     # 0 target, cluster A
        [10.0, 10.0],   # 1 target, cluster B
        [0.5, 0.0],     # 2 target, cluster A
        [0.25, 0.25],   # 3 target, cluster A
        [10.5, 10.0],   # 4 target, cluster B
        [0.25, 0.0],    # 5 query, cluster A: dist to 0 == dist to 2
        [10.5, 10.25],  # 7 query, cluster B: uniquely closest to 4
    ]
    sides = [0, 0, 0, 0, 0, 1, 1]
    got = _bitext(
        _mk_sided(vecs, sides, ids=[0, 1, 2, 3, 4, 5, 7]),
        k=2, n_iter=2,
    )
    s = 1 << kmeans.SCALE_BITS
    q = np.floor(np.asarray(vecs, np.float32).astype(np.float64) * s
                 ).astype(np.int64)
    exp5 = int(((q[5] - q[0]) ** 2).sum())
    assert ((q[5] - q[2]) ** 2).sum() == exp5  # genuinely tied
    exp7 = int(((q[6] - q[4]) ** 2).sum())
    assert got == {5: (0, exp5), 7: (4, exp7)}


def test_bitext_match_targetless_cluster_emits_nothing(ray_session):
    # cluster B holds only queries -> no output rows for them
    vecs = [[0.0, 0.0], [10.0, 10.0], [0.1, 0.1], [10.1, 10.1]]
    sides = [0, 1, 1, 1]
    got = _bitext(_mk_sided(vecs, sides), k=2, n_iter=2)
    assert set(got) == {2}  # only the query sharing cluster A
    assert got[2][0] == 0


def test_bitext_match_partition_and_chunk_invariant(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 6)).astype(np.float32)
    sides = [i % 2 for i in range(120)]
    a = _bitext(_mk_sided(vecs, sides, blocks=1), k=4, n_iter=2)
    b = _bitext(_mk_sided(vecs, sides, blocks=9), k=4, n_iter=2)
    # force the chunked argmin path (working set of ONE pair-dist each)
    c = _bitext(
        _mk_sided(vecs, sides, blocks=3), k=4, n_iter=2, max_pair_elems=1
    )
    assert a == b == c and len(a) > 0
