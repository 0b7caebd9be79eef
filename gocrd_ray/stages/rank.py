"""Distributed global ranking: assign every row its exact position in
the total order over (key, id) — the corpus-wide ORDER BY the engine
needs for "take the best N% by quality" style curation cuts.

The classic range-partition + order-statistics shape (TeraSort lineage):

1. sample keys per block → driver picks ≤ n_buckets−1 cutpoints
   (deterministic: sorted per-batch samples, fixed stride);
2. per-block bincount against the cutpoints → driver sums bucket
   totals into prefix offsets BEFORE anything shuffles (two cheap
   scans of the materialized narrow (key, id) table — object-store
   reads, no exchange);
3. every row routes to the bucket its key falls in (vectorized
   searchsorted) — ONE narrow shuffle of (key, id) pairs, the only
   all-to-all in the whole operator;
4. per bucket: vectorized lexsort gives local ranks and the global
   rank = precomputed bucket offset + local rank is attached IN the
   same map_groups — no post-shuffle count aggregate, no second
   materialize barrier, no separate finalize pass (the round-3 form
   paid all three: measured 1.9→6.5 s at sf0.1; this shape restores
   the wall while keeping driver state O(buckets + samples)).

Only (key, id) pairs ever move — never payload columns; the driver
sees one sample slice and one (bucket, partial-count) row per
non-empty (block, bucket). Equal keys cannot straddle buckets
(cutpoint routing is side='right' on the key alone), so ties are
ranked wholly inside one bucket by the deterministic (key, id)
tiebreak. A single massively-hot key value makes one big bucket —
inherent to exact ranking (those rows must meet to be ordered); the
vectorized in-bucket lexsort keeps even that case O(n log n) C time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def global_rank(ds, *, key_col: str, id_col: str = "doc_id",
                descending: bool = True, n_buckets: int = 64,
                sample_per_block: int = 64):
    """Append ``rank`` (0-based, dense total order) to (id, key) rows.

    Returns a Dataset of (id_col, key_col, rank:int64) ranked by
    (key [desc|asc], id asc). Keys must be integers (the engine's
    quality/count signals are integer by convention — exactness).
    """
    import ray

    sign = np.int64(-1) if descending else np.int64(1)

    def keyed(b: pa.Table) -> pa.Table:
        kc = b.column(key_col)
        ic = b.column(id_col)
        # a null-containing int column round-trips through float64 in
        # to_numpy: NaN → INT64_MIN on astype (silently ranking nulls
        # first) and keys > 2^53 lose bits — exact ranking of null keys
        # is undefined, so refuse loudly; filter or fill upstream
        if kc.null_count or ic.null_count:
            raise ValueError(
                f"global_rank: null values in {key_col!r}/{id_col!r} — "
                "drop or fill them before ranking"
            )
        k = kc.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pc.cast(b.column(id_col), pa.int64()),
                key_col: pa.array(k),
                "__k": pa.array(sign * k),
            }
        )

    # materialized once: consumed by the sample scan, the count scan
    # and the bucket shuffle — a lazy dataset would re-run the read
    # per consumer
    narrow = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    # pass 0a: deterministic sample → cutpoints. Sampling happens
    # INSIDE map_batches (each block emits ≤ sample_per_block keys),
    # so the driver pulls O(n_blocks × sample_per_block) rows — never
    # the full key column.
    def sample_block(b: pa.Table) -> pa.Table:
        ks = np.sort(b.column("__k").to_numpy(zero_copy_only=False))
        stride = max(1, len(ks) // sample_per_block)
        return pa.table({"__k": pa.array(ks[::stride][:sample_per_block])})

    samp_rows = (
        narrow.select_columns(["__k"])
        .map_batches(sample_block, batch_format="pyarrow")
        .take_all()
    )
    allsamp = np.sort(np.array([r["__k"] for r in samp_rows], dtype=np.int64))
    if len(allsamp) > n_buckets - 1:
        idx = np.linspace(0, len(allsamp) - 1, n_buckets - 1).astype(np.int64)
        cuts = np.unique(allsamp[idx])
    else:
        cuts = np.unique(allsamp)
    cuts_ref = ray.put(cuts)

    # pass 0b: per-block bucket bincount → driver sums → prefix
    # offsets, all BEFORE the shuffle. Each block emits one narrow
    # (bucket, n) row per non-empty bucket; the driver holds
    # O(buckets) ints. Knowing offsets up front is what lets the
    # offset attach fuse into the per-bucket rank map below.
    def count_block(b: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        k = b.column("__k").to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(c, k, side="right")
        n = np.bincount(bucket, minlength=len(c) + 1)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "__bucket": pa.array(nz.astype(np.int32)),
                "__n": pa.array(n[nz].astype(np.int64)),
            }
        )

    counts = np.zeros(len(cuts) + 1, dtype=np.int64)
    for r in (
        narrow.select_columns(["__k"])
        .map_batches(count_block, batch_format="pyarrow")
        .take_all()
    ):
        counts[int(r["__bucket"])] += int(r["__n"])
    offsets = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        k = b.column("__k").to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(c, k, side="right").astype(np.int32)
        return b.append_column("__bucket", pa.array(bucket))

    bucketed = narrow.map_batches(assign, batch_format="pyarrow")

    def rank_bucket(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)  # zero-copy shared ndarray
        k = group.column("__k").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        lr = np.empty(len(k), dtype=np.int64)
        lr[order] = np.arange(len(k), dtype=np.int64)
        bucket = int(group.column("__bucket")[0].as_py())
        return pa.table(
            {
                id_col: group.column(id_col),
                key_col: group.column(key_col),
                "rank": pa.array(lr + off[bucket]),
            }
        )

    return bucketed.groupby("__bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )
