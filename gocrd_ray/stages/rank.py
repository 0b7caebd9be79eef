"""Distributed global ranking: assign every row its exact position in
the total order over (key, id) — the corpus-wide ORDER BY the engine
needs for "take the best N% by quality" style curation cuts.

The classic range-partition + order-statistics shape (TeraSort lineage):

1. sample keys per block → driver picks ≤ n_buckets−1 cutpoints
   (deterministic: sorted per-batch samples, fixed stride);
2. every row routes to the bucket its key falls in (vectorized
   searchsorted) — ONE narrow shuffle of (key, id) pairs;
3. per bucket: vectorized lexsort gives local ranks, bucket row-counts
   go back to the driver (one int per bucket);
4. global rank = prefix-sum offset of the bucket + local rank,
   attached in a second pass over the same grouped rows.

Only (key, id) pairs ever move — never payload columns; the driver
sees one sample slice and one count per bucket. Equal keys cannot
straddle buckets (cutpoint routing is side='right' on the key alone),
so ties are ranked wholly inside one bucket by the deterministic
(key, id) tiebreak. A single massively-hot key value makes one big
bucket — inherent to exact ranking (those rows must meet to be
ordered); the vectorized in-bucket lexsort keeps even that case
O(n log n) C time.
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

    narrow = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    # pass 0: deterministic sample → cutpoints. Sampling happens INSIDE
    # map_batches (each block emits ≤ sample_per_block keys), so the
    # driver pulls O(n_blocks × sample_per_block) rows — never the
    # full key column.
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

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        k = b.column("__k").to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(c, k, side="right").astype(np.int32)
        return b.append_column("__bucket", pa.array(bucket))

    bucketed = narrow.map_batches(assign, batch_format="pyarrow")

    def local_rank(group: pa.Table) -> pa.Table:
        k = group.column("__k").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        lr = np.empty(len(k), dtype=np.int64)
        lr[order] = np.arange(len(k), dtype=np.int64)
        return pa.table(
            {
                id_col: group.column(id_col),
                key_col: group.column(key_col),
                "__bucket": group.column("__bucket"),
                "__local": pa.array(lr),
            }
        )

    ranked_local = bucketed.groupby("__bucket").map_groups(
        local_rank, batch_format="pyarrow"
    ).materialize()

    # bucket sizes → prefix offsets: distributed count, then one tiny
    # (bucket, count) table on the driver — O(n_buckets), never O(n)
    counts: dict[int, int] = {
        int(r["__bucket"]): int(r["count()"])
        for r in ranked_local.groupby("__bucket").count().take_all()
    }
    offsets = {}
    acc = 0
    for bb in sorted(counts):
        offsets[bb] = acc
        acc += counts[bb]
    off_ref = ray.put(offsets)

    def finalize(b: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        bk = b.column("__bucket").to_numpy(zero_copy_only=False)
        okeys = np.array(sorted(off), dtype=np.int64)
        ovals = np.array([off[int(x)] for x in okeys], dtype=np.int64)
        rank = (
            b.column("__local").to_numpy(zero_copy_only=False)
            + ovals[np.searchsorted(okeys, bk)]
        )
        return pa.table(
            {
                id_col: b.column(id_col),
                key_col: b.column(key_col),
                "rank": pa.array(rank),
            }
        )

    return ranked_local.map_batches(finalize, batch_format="pyarrow")
