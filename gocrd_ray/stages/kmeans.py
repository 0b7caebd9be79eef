"""Distributed Lloyd's k-means over an embedding Dataset — exact
integer fixed-point arithmetic, bit-identical to an unrolled SQL
mirror (the lm.py / dsir.py / graphrank.py exactness contract).

k-means is the workhorse quantizer of large-scale curation: SemDeDup
(Abbas et al. 2023, arXiv:2303.09540) clusters the embedding space
before within-cluster dedup, and IVF ANN indexes (Jégou et al. 2011)
partition vectors by nearest centroid.  ``similarity.py`` fits its
centroids on a driver-held SAMPLE (`_fit_centroids`) — correct for a
quantizer, but the trainer itself should scale to the full corpus.
This stage is that trainer: full-pass Lloyd iterations where every
pass is a pure streaming ``map_batches`` and the driver state is
O(k x dim).

Arithmetic contract (all int64, bit-reproducible):

    q[i,d]  = floor(float64(emb[i,d]) * 2^SCALE_BITS)   (quantize)
    dist    = sum_d (q[i,d] - c[j,d])^2                 (int64 exact)
    assign  = argmin_j (dist, j)                        (ties: low j)
    c'[j,d] = floordiv(sum_{i in j} q[i,d], n_j)        (floor, not
                                                         truncate)
    empty cluster keeps its previous centroid.

float32 -> float64 is exact, multiplying by a power of two is exact,
and floor is exact, so numpy and DuckDB quantize identically.  Floor
division must NOT use SQL's ``//`` directly (DuckDB truncates toward
zero on negatives); both sides compute
``(s - (((s % n) + n) % n)) / n`` whose numerator is exactly
divisible — every division mode agrees there.

Init is deterministic and SQL-expressible: cluster j's seed is the
row with the (j+1)-th smallest id.  (k-means++ would need a random
stream; a fixed-id init keeps the mirror exact and is standard for
reproducible runs.)

Overflow budget: |emb| <= 2048 after quantization gives |q| < 2^31,
per-dim squared diff < 2^64/dim for dim <= 4096 — guarded loudly in
``_quantize``.

Scale shape (10^9 vectors x 10^2..3 dims): each of the K iterations
is ONE streaming pass over the corpus; the (k x dim) int64 centroid
matrix is broadcast ONCE per iteration via ``ray.put``; every block
reduces map-side to <= k narrow partial rows (cluster, count, packed
sums), so the driver merge is O(k x dim x n_blocks) bytes of
pre-reduced partials — the HLL-partial / graphrank-contrib shape.  No
all-to-all anywhere: the corpus is never shuffled, sorted, or grouped.
The final labeling pass streams once more and can fuse into whatever
consumes the labels (e.g. the SemDeDup within-cluster groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE_BITS = 20
_SCALE = float(1 << SCALE_BITS)


def _q_abs_max(dim: int) -> int:
    """Largest |q| that provably cannot overflow the int64 per-point
    squared-distance sum: dist = sum_dim (q_i - c_i)^2 with
    |q_i - c_i| <= 2*|q|_max (centroids are floor-div means, so they
    stay inside the quantized hull), hence we need
    dim * (2*qmax)^2 <= 2^63 - 1. Exact integer sqrt — no float
    rounding at the boundary."""
    import math

    return math.isqrt((2**63 - 1) // (4 * max(dim, 1)))


def _floordiv(s: np.ndarray, n: int) -> np.ndarray:
    """Floor division matching the SQL mirror's explicit formula.
    numpy's ``//`` already floors; the formula is spelled out in the
    SQL string (DuckDB ``//`` truncates toward zero)."""
    return np.floor_divide(s, n)


def _quantize(emb_col, dim_guard: int = 4096) -> np.ndarray:
    """Arrow list<float> column -> (n, dim) int64 fixed-point matrix."""
    if isinstance(emb_col, pa.ChunkedArray):
        emb_col = emb_col.combine_chunks()
    flat = emb_col.flatten().to_numpy(zero_copy_only=False)
    n = len(emb_col)
    if n == 0:
        return np.empty((0, 0), dtype=np.int64)
    dim = len(flat) // n
    q = np.floor(flat.astype(np.float64) * _SCALE).astype(np.int64)
    qmax = int(np.abs(q).max()) if len(q) else 0
    if dim > dim_guard or qmax > _q_abs_max(dim):
        raise ValueError(
            "kmeans fixed-point overflow guard: the int64 distance sum "
            f"needs dim * (2*|q|)^2 <= 2^63-1, i.e. |quantized| <= "
            f"{_q_abs_max(dim)} at dim={dim}, and dim <= {dim_guard} "
            f"(got max|q|={qmax}); rescale the embeddings or lower "
            "SCALE_BITS"
        )
    return q.reshape(n, dim)


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignments, min dists) — int64 exact; ties pick the lowest
    cluster index (np.argmin first-occurrence == SQL ORDER BY dist, cl)."""
    # loop over k (small) instead of a (n, k, dim) broadcast: bounds
    # peak memory at one (n, dim) temp per cluster
    dists = np.empty((q.shape[0], cents.shape[0]), dtype=np.int64)
    for j in range(cents.shape[0]):
        d = q - cents[j]
        dists[:, j] = np.einsum("nd,nd->n", d, d)
    a = dists.argmin(axis=1)
    return a.astype(np.int64), dists[np.arange(len(a)), a]


class _InitPartial:
    """Per-block partial for the deterministic init: the block's k
    smallest ids and their packed quantized vectors (narrow rows)."""

    def __init__(self, k: int, id_col: str, emb_col: str):
        self.k, self.id_col, self.emb_col = k, id_col, emb_col

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column(self.id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "qvec": pa.array([], pa.binary()),
            })
        q = _quantize(b.column(self.emb_col))
        keep = np.argsort(ids, kind="stable")[: self.k]
        return pa.table({
            "vec_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
            "qvec": pa.array([q[i].tobytes() for i in keep], pa.binary()),
        })


def _fetch_query_rows(ds, query_ids, id_col: str, emb_col: str):
    """Fetch ONLY the listed query vectors (the similarity.ivf_topk
    pattern: filtered map then take_all of a handful of rows), in
    query_ids order. Returns (qids, float64 (n, dim) matrix)."""
    import pyarrow.compute as pc

    def grab(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(id_col), value_set=pa.array(query_ids))
        )

    qrows = ds.map_batches(grab, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: query_ids.index(r[id_col]))
    qids = [r[id_col] for r in qrows]
    qraw = np.array([r[emb_col] for r in qrows], dtype=np.float64)
    return qids, qraw


class _SumPartial:
    """One Lloyd half-step over a block: assign against the broadcast
    centroids (fetched ONCE per actor) and emit <= k pre-reduced rows
    (cluster, count, packed per-dim int64 sums)."""

    def __init__(self, cents_ref, id_col: str, emb_col: str):
        import ray

        self.cents = ray.get(cents_ref)
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, b: pa.Table) -> pa.Table:
        empty = pa.table({
            "cluster": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sums": pa.array([], pa.binary()),
        })
        if b.num_rows == 0:
            return empty
        q = _quantize(b.column(self.emb_col))
        a, _ = _assign(q, self.cents)
        clusters = np.unique(a)
        rows_c, rows_n, rows_s = [], [], []
        for j in clusters:
            m = a == j
            rows_c.append(int(j))
            rows_n.append(int(m.sum()))
            rows_s.append(q[m].sum(axis=0, dtype=np.int64).tobytes())
        return pa.table({
            "cluster": pa.array(rows_c, pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
            "sums": pa.array(rows_s, pa.binary()),
        })


class _Label:
    """Final labeling pass: (id, cluster, dist_fp) per row."""

    def __init__(self, cents_ref, id_col: str, emb_col: str):
        import ray

        self.cents = ray.get(cents_ref)
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column(self.id_col)
        if b.num_rows == 0:
            return pa.table({
                self.id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "dist_fp": pa.array([], pa.int64()),
            })
        q = _quantize(b.column(self.emb_col))
        a, d = _assign(q, self.cents)
        return pa.table({
            self.id_col: ids,
            "cluster": pa.array(a, pa.int64()),
            "dist_fp": pa.array(d, pa.int64()),
        })


def _lloyd_update(cents: np.ndarray, sums: np.ndarray,
                  counts: np.ndarray) -> np.ndarray:
    """Centroid update shared by both paths: floor-div means, empty
    clusters keep their previous centroid."""
    new = cents.copy()
    for j in np.flatnonzero(counts):
        new[j] = _floordiv(sums[j], int(counts[j]))
    return new


def fit_kmeans(
    ds,
    *,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
    small_cap_elems: int = 8_000_000,
) -> np.ndarray:
    """K Lloyd iterations over an embedding Dataset; returns the
    final (k x dim) int64 fixed-point centroid matrix.

    Every pass streams (map_batches actor pool, centroids fetched
    ONCE per actor); the only driver state is the (k x dim) centroid
    matrix plus per-block pre-reduced partials.  Adaptive small side
    (the graphrank ``small_p_cap`` pattern): when ``n_rows x dim`` is
    under ``small_cap_elems`` the quantized matrix is collected once
    and the identical integer recurrence runs driver-local —
    bit-identical output (test-pinned), none of the per-iteration Ray
    job fixed cost.  See the module docstring for the exactness
    contract.
    """
    n_rows = ds.count()
    if n_rows == 0:
        raise ValueError("lloyd_kmeans: empty input dataset")
    dim = len(ds.take(1)[0][emb_col])

    if n_rows * dim <= small_cap_elems:
        # ---- small-corpus fast path: same recurrence, driver-local ----
        tbl = pa.concat_tables([
            b for b in ds.map_batches(
                lambda b: b.select([id_col, emb_col]),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow") if b.num_rows
        ])
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        q = _quantize(tbl.column(emb_col))
        order = np.argsort(ids, kind="stable")
        cents = q[order[: min(k, n_rows)]].copy()
        for _ in range(n_iter):
            a, _ = _assign(q, cents)
            counts = np.bincount(a, minlength=len(cents)).astype(np.int64)
            sums = np.zeros_like(cents)
            np.add.at(sums, a, q)
            cents = _lloyd_update(cents, sums, counts)
        return cents

    import ray

    # ---- deterministic init: k globally-smallest ids ----------------
    parts = ds.map_batches(
        _InitPartial,
        fn_constructor_args=(k, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()  # bounded: <= k rows per block
    parts.sort(key=lambda r: r["vec_id"])
    seeds = parts[: min(k, len(parts))]
    cents = np.stack(
        [np.frombuffer(r["qvec"], dtype=np.int64) for r in seeds]
    ).astype(np.int64)

    # ---- Lloyd iterations: one streaming pass each -------------------
    for _ in range(n_iter):
        cref = ray.put(cents)
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        partials = ds.map_batches(
            _SumPartial,
            fn_constructor_args=(cref, id_col, emb_col),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        # <= k rows per block, pre-reduced map-side
        for b in partials.iter_batches(batch_format="pyarrow"):
            for r in b.to_pylist():
                j = r["cluster"]
                sums[j] += np.frombuffer(r["sums"], dtype=np.int64)
                counts[j] += r["n"]
        cents = _lloyd_update(cents, sums, counts)
    return cents


def lloyd_kmeans(ds, *, k: int = 8, n_iter: int = 3,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 concurrency=(1, 8), small_cap_elems: int = 8_000_000):
    """``fit_kmeans`` + one streaming labeling pass; returns the
    labeled Dataset ``(id_col, cluster, dist_fp)`` — ``cluster`` the
    final nearest-centroid assignment, ``dist_fp`` the exact int64
    squared fixed-point distance to it.  SQL mirror:
    ``queries.SQL_KMEANS_CLUSTERS``."""
    import ray

    cents = fit_kmeans(
        ds, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col,
        concurrency=concurrency, small_cap_elems=small_cap_elems,
    )
    cref = ray.put(cents)
    return ds.map_batches(
        _Label,
        fn_constructor_args=(cref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _LabelWithEmb:
    """Labeling pass that keeps the embedding column — feeds the
    within-cluster SemDeDup group stage."""

    def __init__(self, cents_ref, id_col: str, emb_col: str):
        import ray

        self.cents = ray.get(cents_ref)
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, b: pa.Table) -> pa.Table:
        dim = self.cents.shape[1]
        if b.num_rows == 0:
            return pa.table({
                self.id_col: pa.array([], pa.int64()),
                self.emb_col: pa.array([], pa.list_(pa.float32())),
                "cluster": pa.array([], pa.int64()),
                "dist_fp": pa.array([], pa.int64()),
            })
        q = _quantize(b.column(self.emb_col))
        assert q.shape[1] == dim
        a, d = _assign(q, self.cents)
        emb = b.column(self.emb_col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({
            self.id_col: b.column(self.id_col),
            self.emb_col: emb,
            "cluster": pa.array(a, pa.int64()),
            "dist_fp": pa.array(d, pa.int64()),
        })


def semdedup_kmeans(
    ds,
    *,
    threshold: float = 0.95,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) with the EXACT
    fixed-point k-means partition: cluster with ``fit_kmeans``, then
    within each cluster drop every item whose cosine similarity to an
    EARLIER item exceeds ``threshold``.  "Earlier" = closer to the
    centroid first — here the exact int64 ``dist_fp`` ascending, ties
    by id — so the partition AND the visit order are both
    deterministic integers, which makes the ENTIRE SemDeDup pipeline
    SQL-mirrorable (``similarity.semantic_dedup``'s k-means form is
    rows-only because its sampled float centroids aren't; the grid
    form mirrors but fixes the partition).  The float cosine is only
    COMPARED against the threshold; callers keep the output
    float-free (id, cluster, keep) so the mirror is robust to
    last-ulp engine differences.

    Scale shape: fit is n_iter streaming passes (see ``fit_kmeans``);
    assignment is one streaming pass; the ONE shuffle is the groupby
    on cluster id, and the O(m²) similarity matrix is per cluster —
    bounded by choosing k ∝ corpus size, exactly as the paper runs
    50k clusters for LAION-440M.
    """
    import ray

    cents = fit_kmeans(
        ds, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col,
        concurrency=concurrency,
    )
    cref = ray.put(cents)
    assigned = ds.map_batches(
        _LabelWithEmb,
        fn_constructor_args=(cref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        dist = group.column("dist_fp").to_numpy(zero_copy_only=False)
        flat = group.column(emb_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        x = flat.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(ids), -1)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        x = x / norms[:, None]
        order = np.lexsort((ids, dist))  # dist_fp asc, ties by id
        xo = x[order]
        m = len(order)
        sims = xo @ xo.T
        iu = np.triu_indices(m, k=1)
        upper = np.full((m, m), -np.inf)
        upper[iu] = sims[iu]
        max_prior = upper.max(axis=0) if m > 1 else np.full(m, -np.inf)
        max_prior[0] = -np.inf
        keep = ~(max_prior > threshold)
        cluster = group.column("cluster").to_numpy(
            zero_copy_only=False)[0]
        return pa.table({
            id_col: pa.array(ids[order].astype(np.int64), pa.int64()),
            "cluster": pa.array(
                np.full(m, cluster, dtype=np.int64), pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow"
    )


def ivf_topk_fixed(
    ds,
    query_ids: list[int],
    *,
    k: int = 10,
    n_buckets: int = 8,
    n_iter: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
):
    """IVF approximate top-k with the EXACT fixed-point k-means coarse
    quantizer (Jégou et al. 2011 structure): bucket every vector by
    ``fit_kmeans`` assignment, probe only the ``n_probe`` buckets whose
    centroids are closest to each query (int64 distance, ties by
    cluster id), brute-force cosine inside the probed buckets.

    Unlike ``similarity.ivf_topk`` (sampled float centroids —
    rows-only w.r.t. SQL), every branch of THIS approximation is
    deterministic integer arithmetic, so the approximate result
    itself — including which true neighbors it misses — is
    bit-mirrorable in SQL (``queries.SQL_KNN_IVF_FIXED``).

    Scale shape: fit is n_iter streaming passes; bucketing is one
    streaming pass; scoring is one streaming pass with the query
    matrix broadcast once and per-block local top-(k+1); the ONE
    shuffle is the tiny (query_id-keyed) candidate merge.
    """
    import ray

    cents = fit_kmeans(
        ds, k=n_buckets, n_iter=n_iter, id_col=id_col, emb_col=emb_col,
        concurrency=concurrency,
    )
    cref = ray.put(cents)
    bucketed = ds.map_batches(
        _LabelWithEmb,
        fn_constructor_args=(cref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    qids, qraw = _fetch_query_rows(ds, query_ids, id_col, emb_col)
    qq = np.floor(qraw * _SCALE).astype(np.int64)
    # probe order per query: int64 distance asc, ties by cluster id asc
    probes = np.empty((len(qids), n_probe), dtype=np.int64)
    for i in range(len(qids)):
        dists = np.einsum(
            "kd,kd->k", qq[i] - cents, qq[i] - cents
        )
        probes[i] = np.argsort(dists, kind="stable")[:n_probe]
    norms = np.linalg.norm(qraw, axis=1)
    norms[norms == 0] = 1.0
    qmat = qraw / norms[:, None]
    qref = ray.put((qids, qmat, probes))

    class _Score:
        def __init__(self, qref, id_col, emb_col, k):
            import ray

            self.qids, self.qmat, self.probes = ray.get(qref)
            self.id_col, self.emb_col, self.k = id_col, emb_col, k

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_q, out_v, out_s = [], [], []
            if batch.num_rows:
                ids = batch.column(self.id_col).to_numpy(
                    zero_copy_only=False)
                buckets = batch.column("cluster").to_numpy(
                    zero_copy_only=False)
                flat = batch.column(self.emb_col)
                if isinstance(flat, pa.ChunkedArray):
                    flat = flat.combine_chunks()
                x = flat.flatten().to_numpy(zero_copy_only=False).astype(
                    np.float64).reshape(len(ids), -1)
                nm = np.linalg.norm(x, axis=1)
                nm[nm == 0] = 1.0
                x = x / nm[:, None]
                for qi, qid in enumerate(self.qids):
                    mask = np.isin(buckets, self.probes[qi])
                    if not mask.any():
                        continue
                    row = self.qmat[qi] @ x[mask].T
                    sub_ids = ids[mask]
                    kk = min(self.k + 1, row.shape[0])
                    order = np.lexsort((sub_ids, -row))[:kk]
                    out_q.extend([qid] * len(order))
                    out_v.extend(sub_ids[order].tolist())
                    out_s.extend(row[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    local = bucketed.map_batches(
        _Score,
        fn_constructor_args=(qref, id_col, emb_col, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

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
            out.append({
                "query_id": qid, "neighbor_id": r["vec_id"], "rank": rank,
            })
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
            ("rank", pa.int64()),
        ]))

    return local.groupby("query_id").map_groups(
        merge, batch_format="pyarrow"
    )


def bitext_match(
    ds,
    *,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    side_col: str = "side",
    concurrency=(1, 8),
    max_pair_elems: int = 8_000_000,
):
    """Large × large cross-corpus nearest-neighbor alignment — the
    bitext-mining shape (CCMatrix, Schwenk et al. 2021,
    arXiv:1911.04944: align every foreign sentence to its best
    counterpart in a huge target corpus). For every side-1 ("query")
    vector, return the best side-0 ("target") vector SHARING ITS
    K-MEANS CLUSTER by exact int64 fixed-point squared L2 (ties:
    lowest target id).

    This is the similarity-join case the broadcast kNN stages cannot
    serve: BOTH sides are corpus-scale, so neither may broadcast.
    The exact quantizer (``fit_kmeans`` over the two-side union — the
    module's bit-reproducible integer contract) co-partitions the
    sides instead: one streaming label pass, then ONE cluster-keyed
    shuffle of (id, side, embedding) rows; within a cluster the
    argmin is a chunked integer broadcast whose working set is capped
    at ``max_pair_elems`` elements. Queries landing in a cluster with
    no target member emit nothing — the n_probe=1 approximation,
    itself deterministic and SQL-mirrorable
    (``queries.SQL_BITEXT_MINE``); probe more clusters upstream if
    recall matters.

    At 10^9+ rows per side, size ``k`` so a cluster's rows fit a
    worker (k ≈ n/10^5); skewed clusters split further by re-running
    with k·2 — the assignment stays deterministic either way.

    Returns ``(query_id, match_id, dist_fp)``.
    """
    import ray

    cents = fit_kmeans(
        ds, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col,
        concurrency=concurrency,
    )
    cref = ray.put(cents)

    class _LabelSide:
        def __init__(self, cents_ref, id_col, emb_col, side_col):
            import ray as _r

            self.cents = _r.get(cents_ref)
            self.id_col, self.emb_col = id_col, emb_col
            self.side_col = side_col

        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            if b.num_rows == 0:
                return pa.table({
                    self.id_col: pa.array([], pa.int64()),
                    self.side_col: pa.array([], pa.int64()),
                    self.emb_col: pa.array([], pa.list_(pa.float32())),
                    "cluster": pa.array([], pa.int64()),
                })
            q = _quantize(b.column(self.emb_col))
            a, _ = _assign(q, self.cents)
            emb = b.column(self.emb_col)
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            return pa.table({
                self.id_col: _pc.cast(b.column(self.id_col), pa.int64()),
                self.side_col: _pc.cast(b.column(self.side_col), pa.int64()),
                self.emb_col: emb,
                "cluster": pa.array(a, pa.int64()),
            })

    labeled = ds.map_batches(
        _LabelSide,
        fn_constructor_args=(cref, id_col, emb_col, side_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def match_in_cluster(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "match_id": pa.array([], pa.int64()),
            "dist_fp": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        sides = g.column(side_col).to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        q = _quantize(g.column(emb_col))
        a_mask = sides == 0
        b_mask = sides == 1
        if not a_mask.any() or not b_mask.any():
            return empty
        # targets ascending by id: argmin first-occurrence == lowest id
        a_order = np.argsort(ids[a_mask], kind="stable")
        A = q[a_mask][a_order]
        a_ids = ids[a_mask][a_order]
        B = q[b_mask]
        b_ids = ids[b_mask]
        n_b, dim = B.shape
        best = np.full(n_b, np.iinfo(np.int64).max, dtype=np.int64)
        best_id = np.full(n_b, -1, dtype=np.int64)
        chunk = max(1, max_pair_elems // max(1, n_b * dim))
        for s in range(0, len(A), chunk):
            Ac = A[s : s + chunk]
            d = Ac[None, :, :] - B[:, None, :]  # (n_b, c, dim) int64
            dist = np.einsum("bcd,bcd->bc", d, d)
            arg = dist.argmin(axis=1)
            m = dist[np.arange(n_b), arg]
            better = m < best  # strict: earlier chunk = lower ids win ties
            best[better] = m[better]
            best_id[better] = a_ids[s + arg[better]]
        return pa.table({
            "query_id": pa.array(b_ids, pa.int64()),
            "match_id": pa.array(best_id, pa.int64()),
            "dist_fp": pa.array(best, pa.int64()),
        })

    return labeled.groupby("cluster").map_groups(
        match_in_cluster, batch_format="pyarrow"
    )
