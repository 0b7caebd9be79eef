"""Product quantization (PQ) over an embedding Dataset — Jégou,
Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
Search" (IEEE TPAMI).  PQ is the memory-compression half of
billion-scale ANN: each vector is split into ``m`` subspaces, each
subspace is vector-quantized independently with a tiny k-means
codebook, and a vector is stored as ``m`` small codes (here
``m * log2(k)`` bits) instead of ``dim`` floats.  Search uses
asymmetric distance computation (ADC): per query, a ``m x k`` lookup
table of exact query-subvector-to-centroid distances is built once,
and every database vector's approximate distance is just ``m`` table
lookups — no float math per candidate.

Exactness contract: identical to stages/kmeans.py (quantize =
``floor(emb * 2^20)`` int64; int64 squared distances; ``(dist, cl)``
argmin; floor-div centroid means via the explicit mod formula), so
the trained codebooks, the per-vector codes AND the ADC top-k —
including which true neighbors the approximation misses — are
bit-mirrorable in SQL (``queries.SQL_PQ_CODES`` /
``SQL_PQ_ADC_TOPK``).

Scale shape (10^9 vectors x 10^2..3 dims):

* ``fit_pq`` trains ALL ``m`` codebooks in the SAME streaming pass
  per Lloyd iteration — one corpus scan per iteration total, not per
  subspace; blocks pre-reduce to <= m*k narrow partial rows
  (subspace, cluster, count, packed per-dim sums) and the only
  driver state is the (m, k, dim/m) codebook tensor.
* ``pq_codes`` / ``pq_adc_topk`` are single streaming passes with
  the codebooks (and for ADC the per-query distance tables) broadcast
  ONCE via ``ray.put``; ADC blocks emit bounded local top-k
  candidates per query, merged by the one tiny query-keyed groupby.
* Adaptive small side (the fit_kmeans ``small_cap_elems`` pattern):
  tiny corpora run the identical integer recurrence driver-local —
  bit-identical output, test-pinned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kmeans import (
    _SCALE,
    _InitPartial,
    _assign,
    _fetch_query_rows,
    _lloyd_update,
    _quantize,
)


def _split_dims(dim: int, m: int) -> int:
    if m <= 0 or dim % m != 0:
        raise ValueError(
            f"fit_pq: embedding dim {dim} must split evenly into m={m} "
            "subspaces"
        )
    return dim // m


def _seed_codebooks(q: np.ndarray, ids: np.ndarray, m: int,
                    k: int) -> np.ndarray:
    """Deterministic init shared by every path: subspace ``s``'s seed
    ``j`` is the ``(j+1)``-th-smallest-id row's ``s``-th subvector
    (the fit_kmeans init, applied per subspace)."""
    dsub = q.shape[1] // m
    order = np.argsort(ids, kind="stable")[: min(k, len(ids))]
    seeds = q[order]
    return np.stack(
        [seeds[:, s * dsub:(s + 1) * dsub].copy() for s in range(m)]
    )


# the per-block init partial is kmeans._InitPartial verbatim (the full
# packed vectors are sliced into subspaces on the driver) — shared so
# the two deterministic inits cannot drift
_PQInitPartial = _InitPartial


class _PQSumPartial:
    """One Lloyd half-step for ALL m subspaces over a block: assign
    each subvector against the broadcast codebooks (fetched ONCE per
    actor) and emit <= m*k pre-reduced rows."""

    def __init__(self, cents_ref, id_col: str, emb_col: str):
        import ray

        self.cents = ray.get(cents_ref)  # (m, k, dsub) int64
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, b: pa.Table) -> pa.Table:
        empty = pa.table({
            "sub": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sums": pa.array([], pa.binary()),
        })
        if b.num_rows == 0:
            return empty
        q = _quantize(b.column(self.emb_col))
        m, _, dsub = self.cents.shape
        rows_s, rows_c, rows_n, rows_b = [], [], [], []
        for s in range(m):
            sub = q[:, s * dsub:(s + 1) * dsub]
            a, _ = _assign(sub, self.cents[s])
            for j in np.unique(a):
                mask = a == j
                rows_s.append(s)
                rows_c.append(int(j))
                rows_n.append(int(mask.sum()))
                rows_b.append(
                    sub[mask].sum(axis=0, dtype=np.int64).tobytes()
                )
        return pa.table({
            "sub": pa.array(rows_s, pa.int64()),
            "cluster": pa.array(rows_c, pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
            "sums": pa.array(rows_b, pa.binary()),
        })


def _encode(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, m) int64 code matrix — per-subspace nearest codebook entry
    (ties: lowest cluster index, = SQL ORDER BY dist, cl)."""
    m, _, dsub = cents.shape
    codes = np.empty((q.shape[0], m), dtype=np.int64)
    for s in range(m):
        a, _ = _assign(q[:, s * dsub:(s + 1) * dsub], cents[s])
        codes[:, s] = a
    return codes


def fit_pq(
    ds,
    *,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
    small_cap_elems: int = 8_000_000,
) -> np.ndarray:
    """Train the (m, k, dim/m) PQ codebook tensor: ``n_iter`` Lloyd
    iterations per subspace, ALL subspaces in the same streaming pass.
    Returns int64 fixed-point centroids (see module docstring)."""
    n_rows = ds.count()
    if n_rows == 0:
        raise ValueError("fit_pq: empty input dataset")
    dim = len(ds.take(1)[0][emb_col])
    dsub = _split_dims(dim, m)

    if n_rows * dim <= small_cap_elems:
        # ---- small-corpus fast path: same recurrence, driver-local ---
        tbl = pa.concat_tables([
            b for b in ds.map_batches(
                lambda b: b.select([id_col, emb_col]),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow") if b.num_rows
        ])
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        q = _quantize(tbl.column(emb_col))
        cents = _seed_codebooks(q, ids, m, k)
        for _ in range(n_iter):
            new = np.empty_like(cents)
            for s in range(m):
                sub = q[:, s * dsub:(s + 1) * dsub]
                a, _ = _assign(sub, cents[s])
                counts = np.bincount(
                    a, minlength=cents.shape[1]).astype(np.int64)
                sums = np.zeros_like(cents[s])
                np.add.at(sums, a, sub)
                new[s] = _lloyd_update(cents[s], sums, counts)
            cents = new
        return cents

    import ray

    # ---- deterministic init: k globally-smallest ids -----------------
    parts = ds.map_batches(
        _PQInitPartial,
        fn_constructor_args=(k, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()  # bounded: <= k rows per block
    parts.sort(key=lambda r: r["vec_id"])
    seeds = parts[: min(k, len(parts))]
    qseed = np.stack(
        [np.frombuffer(r["qvec"], dtype=np.int64) for r in seeds]
    ).astype(np.int64)
    cents = _seed_codebooks(
        qseed, np.arange(len(qseed), dtype=np.int64), m, k
    )

    # ---- Lloyd iterations: ONE streaming pass each (all subspaces) ---
    for _ in range(n_iter):
        cref = ray.put(cents)
        sums = np.zeros_like(cents)
        counts = np.zeros(cents.shape[:2], dtype=np.int64)
        partials = ds.map_batches(
            _PQSumPartial,
            fn_constructor_args=(cref, id_col, emb_col),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        for b in partials.iter_batches(batch_format="pyarrow"):
            for r in b.to_pylist():
                s, j = r["sub"], r["cluster"]
                sums[s][j] += np.frombuffer(r["sums"], dtype=np.int64)
                counts[s][j] += r["n"]
        new = np.empty_like(cents)
        for s in range(m):
            new[s] = _lloyd_update(cents[s], sums[s], counts[s])
        cents = new
    return cents


class _PQEncode:
    """Final encoding pass: (id, c0..c_{m-1}, packed code) per row."""

    def __init__(self, cents_ref, id_col: str, emb_col: str):
        import ray

        self.cents = ray.get(cents_ref)
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, b: pa.Table) -> pa.Table:
        m, k, _ = self.cents.shape
        cols = {self.id_col: pa.array([], pa.int64())}
        for s in range(m):
            cols[f"c{s}"] = pa.array([], pa.int64())
        cols["code"] = pa.array([], pa.int64())
        if b.num_rows == 0:
            return pa.table(cols)
        q = _quantize(b.column(self.emb_col))
        codes = _encode(q, self.cents)
        packed = np.zeros(len(codes), dtype=np.int64)
        for s in range(m):
            packed = packed * k + codes[:, s]
        cols = {self.id_col: b.column(self.id_col)}
        for s in range(m):
            cols[f"c{s}"] = pa.array(codes[:, s], pa.int64())
        cols["code"] = pa.array(packed, pa.int64())
        return pa.table(cols)


def pq_codes(
    ds,
    *,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
):
    """Train PQ codebooks and encode the corpus: one streaming pass
    after ``fit_pq``, codebooks broadcast once.  Output:
    (id, c0..c_{m-1}, code) — ``code`` is the big-endian base-k pack
    (the value a binary PQ index would store)."""
    import ray

    cents = fit_pq(
        ds, m=m, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col,
        concurrency=concurrency,
    )
    cref = ray.put(cents)
    return ds.map_batches(
        _PQEncode,
        fn_constructor_args=(cref, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _PQAdcScore:
    """Fused encode + ADC scoring pass: per block, compute each
    vector's codes, look its per-subspace distances up in the
    broadcast query tables, and emit a bounded local top-k per query.

    The per-candidate cost is m integer table lookups — the PQ search
    contract; no float math touches database vectors."""

    def __init__(self, state_ref, id_col: str, emb_col: str, k: int):
        import ray

        self.cents, self.qids, self.dtab = ray.get(state_ref)
        self.id_col, self.emb_col, self.k = id_col, emb_col, k

    def __call__(self, b: pa.Table) -> pa.Table:
        out_q, out_v, out_d = [], [], []
        if b.num_rows:
            ids = b.column(self.id_col).to_numpy(zero_copy_only=False)
            q = _quantize(b.column(self.emb_col))
            codes = _encode(q, self.cents)  # (n, m)
            m = codes.shape[1]
            subs = np.arange(m)
            for qi, qid in enumerate(self.qids):
                # ADC: sum of m table lookups per candidate
                d = self.dtab[qi][subs, codes].sum(
                    axis=1, dtype=np.int64)
                mask = ids != qid
                sub_ids, sub_d = ids[mask], d[mask]
                kk = min(self.k, len(sub_ids))
                order = np.lexsort((sub_ids, sub_d))[:kk]
                out_q.extend([qid] * len(order))
                out_v.extend(sub_ids[order].tolist())
                out_d.extend(sub_d[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_v, pa.int64()),
            "adc_dist_fp": pa.array(out_d, pa.int64()),
        })


def pq_adc_topk(
    ds,
    query_ids: list[int],
    *,
    k_neighbors: int = 10,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
):
    """Approximate top-k by PQ asymmetric distance (Jégou et al. 2011
    §4.2): exact int64 query-to-codebook distance tables, ADC =
    ``sum_s dtab[s, code_s]`` per candidate.  Every branch is
    deterministic integer arithmetic, so the approximate result
    itself is bit-mirrorable in SQL (``queries.SQL_PQ_ADC_TOPK``).

    Scale shape: fit is n_iter streaming passes; scoring is ONE
    streaming pass with (codebooks, query tables) broadcast once and
    per-block local top-k; the one shuffle is the tiny query-keyed
    candidate merge."""
    import pyarrow.compute as pc
    import ray

    cents = fit_pq(
        ds, m=m, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col,
        concurrency=concurrency,
    )
    dsub = cents.shape[2]

    qids, qraw = _fetch_query_rows(ds, query_ids, id_col, emb_col)
    qq = np.floor(qraw * _SCALE).astype(np.int64)
    # per-query (m, k) exact distance tables
    dtab = np.empty((len(qids), m, cents.shape[1]), dtype=np.int64)
    for qi in range(len(qids)):
        for s in range(m):
            diff = qq[qi, s * dsub:(s + 1) * dsub] - cents[s]
            dtab[qi, s] = np.einsum("kd,kd->k", diff, diff)
    sref = ray.put((cents, qids, dtab))

    local = ds.map_batches(
        _PQAdcScore,
        fn_constructor_args=(sref, id_col, emb_col, k_neighbors),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (r["adc_dist_fp"], r["neighbor_id"]))
        out = []
        for rank, r in enumerate(rows[:k_neighbors], start=1):
            out.append({
                "query_id": r["query_id"],
                "neighbor_id": r["neighbor_id"],
                "adc_dist_fp": r["adc_dist_fp"],
                "rank": rank,
            })
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
            ("adc_dist_fp", pa.int64()), ("rank", pa.int64()),
        ]))

    return local.groupby("query_id").map_groups(
        merge, batch_format="pyarrow"
    )
