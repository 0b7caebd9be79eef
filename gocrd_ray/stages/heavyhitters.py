"""Bounded-memory heavy hitters: exact top-k with per-block state
capped at C counter entries (the Misra–Gries / SpaceSaving family,
Misra & Gries 1982; mergeable-summary analysis per Agarwal et al.
2013).

`top_tokens`-style partial counting keeps one counter per DISTINCT
token per block — vocabulary-sized state that grows with the data. At
10^12 docs the web vocabulary (urls, numbers, typos) is effectively
unbounded; this operator caps each block's summary at its top-C
counters instead:

1. per block: EXACT vectorized value_counts, truncated to the C most
   frequent (one Arrow group_by + argpartition, no Python loop);
2. candidates = union of the block summaries — any token absent from
   EVERY block top-C has total count ≤ Σ_i n_i/C = n/C, so the union
   contains every token with global frequency > n/C;
3. exact recount of the candidate set only (broadcast via ray.put,
   vectorized `index_in` per block, nonzero partials back) → true
   counts → top-k.

The composed result is therefore EXACTLY the global top-k whenever
the k-th token's true count exceeds n/C (any realistic Zipf corpus
with C ≫ k). The guarantee degrades loudly, not silently: if the
k-th recount ≤ n/C a missed token can't be ruled out and
``top_k_bounded`` raises unless ``allow_unverified``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(b: pa.Table, text_col: str) -> pa.Array:
    toks = pc.list_flatten(
        pc.split_pattern(pc.fill_null(b.column(text_col), ""), " ")
    )
    return toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks


def _block_topc(tokens: pa.Array, cap: int) -> pa.Table:
    counts = pa.TableGroupBy(pa.table({"token": tokens}), "token").aggregate(
        [("token", "count")]
    )
    if len(counts) > cap:
        n = counts.column("token_count").to_numpy(zero_copy_only=False)
        keep = np.argpartition(-n, cap)[:cap]
        counts = counts.take(pa.array(np.sort(keep)))
    return pa.table({"token": counts.column("token")})


def top_k_bounded(ds, *, k: int = 20, cap: int = 4096,
                  text_col: str = "text", allow_unverified: bool = False):
    """Exact top-k tokens with O(cap) summary state per block.

    Returns a pa.Table (token, n) sorted by (n desc, token asc) —
    equal to the unbounded top-k whenever the n/cap guarantee holds
    (checked; raises otherwise unless ``allow_unverified``).
    """
    import ray

    def summarize(b: pa.Table) -> pa.Table:
        return _block_topc(_flat_tokens(b, text_col), cap)

    cand: set = set()
    for blk in ds.map_batches(
        summarize, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        cand.update(blk.column("token").to_pylist())
    cand_list = sorted(cand)
    cand_arr = pa.array(cand_list, pa.string())
    cand_ref = ray.put(cand_arr)

    def recount(b: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        toks = _flat_tokens(b, text_col)
        idx = pc.index_in(toks, value_set=cset)
        hits = pc.drop_null(idx).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        counts = np.zeros(len(cset), dtype=np.int64)
        np.add.at(counts, hits, 1)
        nz = np.flatnonzero(counts)
        out = pa.table(
            {
                "cand_idx": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz]),
            }
        )
        # one extra row (idx = -1) carries this block's token mass for
        # the n/cap guarantee check
        total = pa.table(
            {
                "cand_idx": pa.array([-1], pa.int64()),
                "n": pa.array([len(toks)], pa.int64()),
            }
        )
        return pa.concat_tables([out, total])

    merged = np.zeros(len(cand_arr), dtype=np.int64)
    n_total = 0
    for blk in ds.map_batches(recount, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        ci = blk.column("cand_idx").to_numpy(zero_copy_only=False)
        nn = blk.column("n").to_numpy(zero_copy_only=False)
        mass = ci < 0
        n_total += int(nn[mass].sum())
        # np.add.at, NOT merged[idx] += : one iter_batches batch can
        # concatenate several blocks' partials, repeating cand_idx —
        # plain fancy-index assignment silently keeps only one of the
        # repeats (observed: counts off by ~n_blocks)
        np.add.at(merged, ci[~mass], nn[~mass])

    order = sorted(
        range(len(cand_list)), key=lambda i: (-merged[i], cand_list[i])
    )[:k]
    counts_sorted = merged[order]
    if len(order) == k and len(order) and counts_sorted[-1] * cap <= n_total:
        if not allow_unverified:
            raise RuntimeError(
                f"top_k_bounded: guarantee not met (k-th count "
                f"{counts_sorted[-1]} ≤ n/cap = {n_total}/{cap}) — raise cap"
            )
    return pa.table(
        {
            "token": pa.array([cand_list[i] for i in order], pa.string()),
            "n": pa.array(counts_sorted.astype(np.int64)),
        }
    )
