"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the baseline: the query matrix is broadcast
once (``ray.put``) and every batch does one float64 matmul against it,
emitting per-batch LOCAL top-k; a tiny groupby then merges the local
winners into the global top-k. Only (query_id, vec_id, sim) triples ever
shuffle — never the embeddings.

The scale path (`ivf_topk`) buckets vectors by nearest centroid
(k-means-lite on a seeded sample) and probes only the closest buckets —
same broadcast-and-matmul inner loop, restricted per bucket.

Near-duplicate detection (`cosine_neardup_pairs`) reuses the broadcast
pattern with the corpus itself as the query side at test scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class TopKScorer:
    """Actor-pool stage: per-batch local top-k against broadcast queries.

    __init__ fetches + normalizes the query matrix once per actor;
    __call__ is one matmul + argpartition per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id"):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.q = _normalize(qmat)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(batch))
        sims = self.q @ x.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            # local top-k only — global merge happens in the groupby
            part = np.argpartition(-row, k - 1)[:k]
            out_q.extend([qid] * len(part))
            out_v.extend(ids[part].tolist())
            out_s.extend(row[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(
    ds,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Global cosine top-k per query: broadcast queries → local top-k per
    batch → groupby(query_id) merge. Returns (query_id, neighbor_id, rank).
    """
    import ray
    import pyarrow.compute as pc

    qset = set(query_ids)

    def grab_queries(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), value_set=pa.array(query_ids))
        return batch.filter(mask)

    qtbl = ds.map_batches(grab_queries, batch_format="pyarrow").take_all()
    qrows = sorted(qtbl, key=lambda r: query_ids.index(r[id_col]))
    qids = [r[id_col] for r in qrows]
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    queries_ref = ray.put((qids, qmat))

    local = ds.map_batches(
        TopKScorer,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k + 1, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
        qid = rows[0]["query_id"]
        out = []
        rank = 0
        for r in rows:
            if exclude_self and r["vec_id"] == qid:
                continue
            rank += 1
            if rank > k:
                break
            out.append(
                {"query_id": qid, "neighbor_id": r["vec_id"], "rank": rank}
            )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [
                    ("query_id", pa.int64()),
                    ("neighbor_id", pa.int64()),
                    ("rank", pa.int64()),
                ]
            ),
        )

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def cosine_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id"):
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).

    Test-scale form: normalized corpus broadcast once, each batch matmuls
    against it and keeps pairs (i < j). At 10^12 scale the same kernel
    runs per LSH/IVF bucket instead of against the full corpus.
    """
    import ray

    mat_parts = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "embedding": b.column("embedding"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    full = pa.concat_tables([ray.get(r) for r in mat_parts.to_arrow_refs()])
    all_ids = full.column(id_col).to_numpy(zero_copy_only=False)
    all_mat = _normalize(_emb_matrix(full))
    ref = ray.put((all_ids, all_mat))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(batch))
        sims = x @ mat_all.T
        bi, bj = np.nonzero(sims >= threshold)
        keep = ids[bi] < ids_all[bj]
        return pa.table(
            {
                "id_a": pa.array(ids[bi][keep], pa.int64()),
                "id_b": pa.array(ids_all[bj][keep], pa.int64()),
                "sim": pa.array(sims[bi, bj][keep], pa.float64()),
            }
        )

    return mat_parts.map_batches(pairs, batch_format="pyarrow")


def ivf_topk(
    ds,
    query_ids: list[int],
    k: int = 10,
    n_buckets: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    seed: int = 11,
):
    """IVF-style approximate top-k: seeded-sample centroids → assign each
    vector to its nearest centroid inside map_batches → probe only the
    n_probe buckets closest to each query. The bucket assignment is the
    ONE shuffle key; everything else is broadcast + matmul.

    Approximate by construction (recall < 1 when true neighbors live in
    unprobed buckets) — benchmark against brute_force_topk for recall.
    """
    import ray

    sample = ds.limit(max(n_buckets * 8, 128)).take_all()
    rng = np.random.RandomState(seed)
    smat = _normalize(
        np.array([r["embedding"] for r in sample], dtype=np.float64)
    )
    centroids = smat[rng.choice(len(smat), size=n_buckets, replace=False)]
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _normalize(_emb_matrix(batch))
        bucket = (x @ c.T).argmax(axis=1)
        return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    bucketed = ds.map_batches(assign, batch_format="pyarrow")

    qtbl = [r for r in ds.take_all() if r[id_col] in set(query_ids)]
    qids = [r[id_col] for r in qtbl]
    qmat = _normalize(np.array([r["embedding"] for r in qtbl], dtype=np.float64))
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    qref = ray.put((qids, qmat, probe))

    def score(batch: pa.Table) -> pa.Table:
        ids_q, qm, pr = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        x = _normalize(_emb_matrix(batch))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids_q):
            mask = np.isin(buckets, pr[qi])
            if not mask.any():
                continue
            row = qm[qi] @ x[mask].T
            kk = min(k + 1, row.shape[0])
            part = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([qid] * len(part))
            out_v.extend(ids[mask][part].tolist())
            out_s.extend(row[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    local = bucketed.map_batches(score, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
        qid = rows[0]["query_id"]
        out = []
        rank = 0
        for r in rows:
            if r["vec_id"] == qid:
                continue
            rank += 1
            if rank > k:
                break
            out.append({"query_id": qid, "neighbor_id": r["vec_id"], "rank": rank})
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("rank", pa.int64())]
            ),
        )

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")
