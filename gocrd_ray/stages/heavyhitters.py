"""Bounded-memory heavy hitters: exact top-k with per-block state
capped at C counter entries (the Misra–Gries / SpaceSaving family,
Misra & Gries 1982, Metwally et al. 2005; mergeable-summary analysis
per Agarwal et al. 2013).

`top_tokens`-style partial counting keeps one counter per DISTINCT
token per block — vocabulary-sized state that grows with the data. At
10^12 docs the web vocabulary (urls, numbers, typos) is effectively
unbounded; this operator bounds BOTH sides:

1. per block: EXACT vectorized value_counts, truncated to the C most
   frequent (one Arrow group_by + argpartition, no Python loop). A
   token absent from block i's summary has count ≤ n_i/C there, so
   truncation hides at most n/C of any token's global mass.
2. driver: block summaries stream into a SpaceSaving structure of
   capacity D (NOT an unbounded union — the union would grow
   ~C·n_blocks): evicting the minimum counter means a token absent
   from the final structure has observed mass ≤ n/D. Candidate set
   = the D survivors; driver state is O(D) regardless of block count.
3. exact recount of the candidates only (broadcast via ray.put,
   vectorized `index_in` per block, nonzero partials merged with
   np.add.at) → true counts → top-k.

Miss bound: a token outside the candidate set has true count ≤
n/C + n/D. The result equals the unbounded top-k whenever the k-th
recount exceeds that bound — checked at runtime; degrades LOUDLY
(raises unless ``allow_unverified``), never silently. When no block
truncated and no driver eviction happened, the candidates are the
full vocabulary and the result is exact with no bound needed.
"""

from __future__ import annotations

import heapq

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
    truncated = len(counts) > cap
    if truncated:
        n = counts.column("token_count").to_numpy(zero_copy_only=False)
        keep = np.argpartition(-n, cap)[:cap]
        counts = counts.take(pa.array(np.sort(keep)))
    return pa.table(
        {
            "token": counts.column("token"),
            "n": pc.cast(counts.column("token_count"), pa.int64()),
            "truncated": pa.array(
                np.full(len(counts), truncated, dtype=bool)
            ),
        }
    )


class _SpaceSaving:
    """Driver-side bounded merge of block summaries (Metwally et al.
    2005 'stream summary'): capacity D counters; inserting a new token
    when full evicts the current minimum and inherits its count as the
    overestimate floor. Survivors ⊇ every token whose observed mass
    exceeds total/D."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counts: dict[str, int] = {}
        self.evicted = False
        # lazy-deletion min-heap of (count, token); an entry is live
        # iff it matches counts[token]. O(log D) amortized per offer
        # vs the O(D) min-scan; compacted when stale entries pile up
        # so memory stays O(D).
        self._heap: list[tuple[int, str]] = []

    def _evict_min(self) -> int:
        while True:
            cnt, tok = heapq.heappop(self._heap)
            if self.counts.get(tok) == cnt:
                del self.counts[tok]
                return cnt

    def offer(self, token: str, n: int) -> None:
        c = self.counts
        if token in c:
            c[token] += n
        elif len(c) < self.capacity:
            c[token] = n
        else:
            self.evicted = True
            n += self._evict_min()  # inherit the victim's count floor
            c[token] = n
        heapq.heappush(self._heap, (c[token], token))
        if len(self._heap) > 4 * self.capacity:
            self._heap = [(v, t) for t, v in c.items()]
            heapq.heapify(self._heap)


def top_k_bounded(ds, *, k: int = 20, cap: int = 4096,
                  driver_cap: int | None = None, text_col: str = "text",
                  allow_unverified: bool = False):
    """Exact top-k tokens with O(cap) state per block and
    O(driver_cap) state on the driver (default 8·cap).

    Returns a pa.Table (token, n) sorted by (n desc, token asc) —
    equal to the unbounded top-k whenever the n/cap + n/driver_cap
    guarantee holds (checked; raises otherwise unless
    ``allow_unverified``; provably exact with no bound when nothing
    truncated or evicted).
    """
    import ray

    driver_cap = driver_cap or cap * 8

    def summarize(b: pa.Table) -> pa.Table:
        return _block_topc(_flat_tokens(b, text_col), cap)

    ss = _SpaceSaving(driver_cap)
    any_truncated = False
    for blk in ds.map_batches(
        summarize, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        toks = blk.column("token").to_pylist()
        ns = blk.column("n").to_numpy(zero_copy_only=False)
        any_truncated |= bool(
            blk.column("truncated").to_numpy(zero_copy_only=False).any()
        )
        for t, n in zip(toks, ns):
            ss.offer(t, int(n))
    cand_list = sorted(ss.counts)
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
        # the guarantee check
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
    lossy = any_truncated or ss.evicted
    if lossy:
        # a token outside the candidates can hold up to this much mass
        miss_bound = (n_total // cap if any_truncated else 0) + (
            n_total // driver_cap if ss.evicted else 0
        )
        kth = int(counts_sorted[-1]) if len(order) == k else 0
        if (len(order) < k or kth <= miss_bound) and not allow_unverified:
            raise RuntimeError(
                f"top_k_bounded: guarantee not met (k-th count {kth} ≤ "
                f"miss bound {miss_bound} with n={n_total}, cap={cap}, "
                f"driver_cap={driver_cap}) — raise cap/driver_cap"
            )
    return pa.table(
        {
            "token": pa.array([cand_list[i] for i in order], pa.string()),
            "n": pa.array(counts_sorted.astype(np.int64)),
        }
    )
