"""Link-graph centrality — fixed-point PageRank over an edge Dataset.

Web-corpus curation ranks hosts by link centrality (the CommonCrawl
host-level ranking step; Page et al. 1999) and uses the score as a
quality prior for sampling.  This stage computes K power-iteration
steps of PageRank over an ``(src, dst)`` edge Dataset with EXACT
integer fixed-point arithmetic, so the result is bit-identical to an
unrolled SQL mirror (the same exactness contract as
:mod:`gocrd_ray.stages.lm` / :mod:`gocrd_ray.stages.dsir`):

    r0(v)   = SCALE // N                       (uniform start)
    agg(v)  = sum over edges (u,v) of  cnt(u,v) * (r(u) // outdeg(u))
    r'(v)   = BASE + (DAMP_NUM * agg(v)) // DAMP_DEN
    BASE    = ((DAMP_DEN - DAMP_NUM) * (SCALE // N)) // DAMP_DEN

Multigraph semantics: each edge ROW is one link; ``outdeg`` counts
link multiplicity.  Dangling nodes (no outlinks) simply do not
contribute — the classic "simple" variant, mirrored identically in
SQL.  All quantities stay positive int64, every division is a floor
division, and sums never exceed the total rank mass (≤ SCALE), so
numpy and DuckDB agree to the bit.

Scale shape (10^11 docs / 10^8 hosts): the full edge set is touched
by exactly ONE narrow all-to-all — the ``groupby(src, dst).count``
collapse into the pair table P (host-pair-sized, orders of magnitude
smaller than the corpus; pre-reduced per input block by a map-side
combiner).  Each of the K iterations is a pure streaming
``map_batches`` over P with the (N,)-int64 contrib vector broadcast
ONCE per iteration via ``ray.put``; per-block partials arrive at the
driver pre-reduced to ≤N narrow rows and merge with one vectorized
``np.add.at`` (the same HLL-partial shape as
``dsir.hashed_bucket_counts`` — no per-iteration shuffle).  The
node-sized driver state (index, outdeg, rank vectors) is guarded by
``max_nodes`` and raises loudly past it (the ``heavyhitters``
contract); past that bound the path is a partitioned join per
iteration, not a bigger driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 10**12
DAMP_NUM = 85
DAMP_DEN = 100


def collapse_edges(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Edge Dataset → pair table P ``(src, dst, cnt)``.  A map-side
    combiner pre-reduces every input block to its distinct pairs, so
    the single all-to-all moves only narrow pre-counted rows."""

    def combine(b: pa.Table) -> pa.Table:
        t = b.select([src_col, dst_col]).group_by(
            [src_col, dst_col]).aggregate([([src_col], "count")])
        return pa.table({
            src_col: t.column(src_col),
            dst_col: t.column(dst_col),
            "cnt": t.column(f"{src_col}_count").cast(pa.int64()),
        })

    parts = edges.map_batches(combine, batch_format="pyarrow")
    return parts.groupby([src_col, dst_col]).sum("cnt").map_batches(
        lambda b: pa.table({
            src_col: b.column(src_col),
            dst_col: b.column(dst_col),
            "cnt": b.column("sum(cnt)").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


class _Contrib:
    """Per-iteration streaming partial: contrib vector fetched ONCE in
    ``__init__`` (actor pool), each P block reduces to ≤N narrow
    ``(dst_idx, agg)`` rows."""

    def __init__(self, contrib_ref, idx_ref, src_col, dst_col, n):
        import ray

        self.contrib = ray.get(contrib_ref)
        self.idx = ray.get(idx_ref)
        self.src_col, self.dst_col, self.n = src_col, dst_col, n

    def __call__(self, b: pa.Table) -> pa.Table:
        src = self._lookup(b.column(self.src_col))
        dst = self._lookup(b.column(self.dst_col))
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        agg = np.zeros(self.n, dtype=np.int64)
        np.add.at(agg, dst, cnt * self.contrib[src])
        nz = np.flatnonzero(agg)
        return pa.table({
            "dst_idx": pa.array(nz.astype(np.int64), pa.int64()),
            "agg": pa.array(agg[nz], pa.int64()),
        })

    def _lookup(self, col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # index_in against the broadcast node vocabulary — vectorized
        # Arrow kernel, no Python loop over rows
        import pyarrow.compute as pc

        return pc.index_in(col, value_set=self.idx).to_numpy(
            zero_copy_only=False).astype(np.int64)


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             n_iter: int = 3, max_nodes: int = 5_000_000,
             small_p_cap: int = 4_000_000, concurrency=(1, 8)):
    """PageRank over an edge Dataset.  Returns a Dataset of
    ``(node, rank_fp, rank)`` — ``rank_fp`` the exact int64
    fixed-point score (sums to ≤ SCALE), ``rank = rank_fp / SCALE``
    its float view.  See the module docstring for the arithmetic
    contract and the scale shape.

    Adaptive small side: the node-discovery pass already streams the
    whole pair table to the driver, so when P has ≤ ``small_p_cap``
    rows the K iterations run directly on the collected int-indexed
    numpy arrays — identical integer recurrence, bit-identical output
    (test-pinned), none of the per-iteration Ray job fixed cost.
    Above the cap the iterations run distributed as described in the
    module docstring."""
    import ray
    import ray.data

    p = collapse_edges(edges, src_col=src_col, dst_col=dst_col)
    p = p.materialize()  # pair-table-sized; consumed once per iteration

    # node universe + out-degree: stream P's narrow columns, merge
    # driver-side (pair-table blocks arrive pre-reduced)
    deg_map: dict = {}
    nodes_set: set = set()
    small_batches: list | None = []
    n_pair_rows = 0
    for b in p.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        n_pair_rows += b.num_rows
        if small_batches is not None:
            if n_pair_rows <= small_p_cap:
                small_batches.append(b)
            else:
                small_batches = None  # too big — iterate distributed
        srcs = np.asarray(b.column(src_col).to_pylist(), dtype=object)
        cnts = b.column("cnt").to_numpy(zero_copy_only=False)
        # fold to batch-unique srcs before touching the dict (bincount
        # partial sums stay < 2^53, so the int64 cast is lossless)
        uniq, inv = np.unique(srcs, return_inverse=True)
        sums = np.bincount(inv, weights=cnts).astype(np.int64)
        for s, c in zip(uniq.tolist(), sums.tolist()):
            deg_map[s] = deg_map.get(s, 0) + c
        nodes_set.update(uniq.tolist())
        nodes_set.update(b.column(dst_col).to_pylist())
        if len(nodes_set) > max_nodes:
            raise ValueError(
                f"pagerank: node universe exceeds max_nodes={max_nodes}; "
                "the broadcast-vector iteration no longer fits — use a "
                "partitioned-join iteration or raise max_nodes explicitly"
            )
    if not nodes_set:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank_fp": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64()),
        }))

    nodes = sorted(nodes_set)  # deterministic index assignment
    n = len(nodes)
    idx_arr = pa.array(nodes, pa.string())
    outdeg = np.array([deg_map.get(v, 0) for v in nodes], dtype=np.int64)
    has_out = outdeg > 0

    base = ((DAMP_DEN - DAMP_NUM) * (SCALE // n)) // DAMP_DEN
    r = np.full(n, SCALE // n, dtype=np.int64)

    if small_batches is not None:
        # small-P fast path: same recurrence on the collected arrays
        import pyarrow.compute as pc

        pt = pa.concat_tables(small_batches)
        src_idx = pc.index_in(
            pt.column(src_col).combine_chunks(), value_set=idx_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        dst_idx = pc.index_in(
            pt.column(dst_col).combine_chunks(), value_set=idx_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = pt.column("cnt").to_numpy(zero_copy_only=False)
        for _ in range(n_iter):
            contrib = np.zeros(n, dtype=np.int64)
            np.floor_divide(r, outdeg, out=contrib, where=has_out)
            agg = np.zeros(n, dtype=np.int64)
            np.add.at(agg, dst_idx, cnt * contrib[src_idx])
            r = base + (DAMP_NUM * agg) // DAMP_DEN
        return ray.data.from_arrow(pa.table({
            "node": idx_arr,
            "rank_fp": pa.array(r, pa.int64()),
            "rank": pa.array(r / float(SCALE), pa.float64()),
        }))

    idx_ref = ray.put(idx_arr)

    for _ in range(n_iter):
        contrib = np.zeros(n, dtype=np.int64)
        np.floor_divide(r, outdeg, out=contrib, where=has_out)
        agg = np.zeros(n, dtype=np.int64)
        parts = p.map_batches(
            _Contrib,
            fn_constructor_args=(ray.put(contrib), idx_ref,
                                 src_col, dst_col, n),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        for b in parts.iter_batches(batch_format="pyarrow"):
            if "dst_idx" not in b.column_names or b.num_rows == 0:
                continue
            np.add.at(
                agg,
                b.column("dst_idx").to_numpy(zero_copy_only=False),
                b.column("agg").to_numpy(zero_copy_only=False),
            )
        r = base + (DAMP_NUM * agg) // DAMP_DEN

    return ray.data.from_arrow(pa.table({
        "node": idx_arr,
        "rank_fp": pa.array(r, pa.int64()),
        "rank": pa.array(r / float(SCALE), pa.float64()),
    }))
