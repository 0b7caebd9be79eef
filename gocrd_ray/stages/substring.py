"""Substring-level exact dedup: find every maximal character span that
is part of some length-L window occurring >= 2 times anywhere in the
corpus (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" — the suffix-array family; a substring of length >= L
repeats iff it contains a repeated window of exactly L, so L-window
counting finds exactly the same spans the suffix array does).

This is the residual a paragraph-level exact dedup (dedup.paragraph_
dedup) cannot see: cross-document repeated substrings INSIDE otherwise
distinct paragraphs (licence boilerplate, templated sentences, quoted
chunks). No reference analog (SURVEY-plus [scale] operator).

Scale shape (two linear passes, no suffix sort, no all-to-all of text):
1. COUNT: each batch computes double 64-bit rolling hashes of all
   L-windows of its docs vectorized, pre-aggregates to (h1, h2, count)
   partials per batch, and ONE global groupby sums them — only narrow
   hash partials shuffle, never window text. Hashes with total count
   >= 2 form the dup-window table (bounded by the corpus's actual
   repetition, typically orders of magnitude below total windows).
2. MARK: a second scan probes each window against the dup table and
   merges hit windows into maximal per-doc spans in numpy. The dup
   table ships as one broadcast (ray.put) below ~10^8 entries
   (repeated_substring_spans / repeated_substring_cut); beyond that,
   repeated_substring_spans_bucketed keeps it a DATASET — only the
   Bloom bits broadcast and maybe-windows verify exactly in a
   co-partitioned bucket groupby (equality with the broadcast form is
   pinned in tests).

Exactness: the window key is a PAIR of independent 64-bit rolling
hashes (distinct multiplier bases over the mod-2^64 ring). A false
span requires a full 128-bit collision; at 10^12 windows the expected
number of colliding pairs is ~(10^12)^2 / 2^129 ≈ 1.5e-15 — the same
trade the hash-based variants of the suffix-array literature make.
The DuckDB oracle groups on the literal window text, so any collision
at test scale would surface as a gate mismatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_B1 = np.uint64(1000003)       # rolling-hash bases: distinct odd
_B2 = np.uint64(0x9E3779B97F4A7C15)  # multipliers over the 2^64 ring


def _codepoints(text: str) -> np.ndarray:
    """Text -> uint64 code points (UTF-32 view; SQL substr() and
    Python slicing both index characters, so hashes align with the
    oracle's character windows)."""
    return np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)


def _window_hashes(cp: np.ndarray, L: int,
                   base: np.uint64) -> np.ndarray:
    """All length-L window hashes of one doc, vectorized:
    h[i] = sum_{j<L} cp[i+j] * base^(L-1-j)  (mod 2^64, natural wrap).

    Via prefix sums over descending powers: with n = len(cp) and
    P[i] = sum_{j>=i} cp[j] * base^(n-1-j),
    h[i] = (P[i] - P[i+L]) * inv(base^(n-i-L))  — division by a power
    is exact in the 2^64 ring because ``base`` is odd (units are
    invertible mod 2^64)."""
    n = len(cp)
    if n < L:
        return np.zeros(0, dtype=np.uint64)
    # pows[j] = base^(n-1-j): cumprod over the 2^64 ring (wrap is the
    # ring arithmetic), fully vectorized
    steps = np.full(n, base, dtype=np.uint64)
    steps[0] = np.uint64(1)
    pows = np.cumprod(steps, dtype=np.uint64)[::-1]
    weighted = cp * pows
    suffix = np.concatenate(
        [np.cumsum(weighted[::-1], dtype=np.uint64)[::-1],
         np.zeros(1, np.uint64)]
    )
    diffs = suffix[: n - L + 1] - suffix[L:]
    # h[i] = diffs[i] / base^(n-i-L): division by an odd unit is exact
    # in the 2^64 ring — multiply by cumprod of the modular inverse
    inv = _inv_u64(base)
    inv_steps = np.full(n - L + 1, inv, dtype=np.uint64)
    inv_steps[0] = np.uint64(1)
    inv_pows = np.cumprod(inv_steps, dtype=np.uint64)[::-1]
    return diffs * inv_pows


def _pair_keys(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(h1, h2) int64 pairs -> one sortable structured array (exact
    128-bit keys: searchsorted compares both fields, no re-hashing)."""
    out = np.empty(len(h1), dtype=[("a", "<i8"), ("b", "<i8")])
    out["a"] = h1
    out["b"] = h2
    return out


def _inv_u64(a: np.uint64) -> np.uint64:
    """Multiplicative inverse of odd ``a`` mod 2^64 (Newton iteration)."""
    x = int(a)
    inv = x  # 3 bits correct
    for _ in range(5):
        inv = (inv * (2 - x * inv)) % (1 << 64)
    return np.uint64(inv)


def _doc_window_hashes(texts: list, L: int):
    """Per-batch: (doc_index, pos, h1, h2) arrays for all windows.

    Vectorized across the WHOLE batch: the window hash depends only on
    the L window characters (the suffix-sum formula normalizes away
    everything outside it), so one rolling-hash pass over the batch's
    concatenated code points computes every document's windows at once
    — windows that straddle a document boundary are simply masked out.
    This removes the per-document Python/numpy fixed cost that
    dominated on short web documents (~5× on the sf0.1 bench)."""
    joined = "".join(t or "" for t in texts)
    cp = _codepoints(joined)
    n = len(cp)
    if n < L:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    lens = np.array([len(t or "") for t in texts], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    h1 = _window_hashes(cp, L, _B1)
    h2 = _window_hashes(cp, L, _B2)
    i = np.arange(n - L + 1, dtype=np.int64)
    # doc containing position i: first doc whose end exceeds i
    doc = np.searchsorted(ends, i, side="right")
    keep = i + L <= ends[doc]
    didx = doc[keep]
    pos = i[keep] - starts[didx]
    return didx, pos, h1[keep], h2[keep]


def duplicate_window_hashes(ds, *, min_len: int = 50,
                            text_col: str = "text",
                            n_buckets: int = 64):
    """Pass 1: Dataset of (h1, h2, n) for every length-``min_len``
    window hash occurring >= 2 times corpus-wide (multiplicity counts
    same-doc repeats, per Lee et al.). Per-batch partial aggregation
    keeps the shuffle to narrow (hash, count) rows.

    The global sum is a ``groupby(__bucket).map_groups`` over a small
    int bucket key (h1 mod B) + a local Arrow aggregate — NOT
    ``groupby([h1, h2]).sum()``: window hashes are almost all distinct,
    so a two-column groupby makes Ray range-sort millions of unique
    128-bit keys (measured 15.6s vs ~3s for the bucketed shuffle on
    1.2M windows). Same shape as dedup.dedup_by_url's crc32 buckets;
    ``n_buckets`` scales the reduce fan-out independently of key count."""

    out_schema = pa.schema(
        [("h1", pa.int64()), ("h2", pa.int64()), ("n", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        _, _, h1, h2 = _doc_window_hashes(texts, min_len)
        t = pa.table(
            {
                "h1": pa.array(h1.astype(np.int64), pa.int64()),
                "h2": pa.array(h2.astype(np.int64), pa.int64()),
            }
        )
        agg = pa.TableGroupBy(t, ["h1", "h2"]).aggregate([([], "count_all")])
        agg = agg.rename_columns(["h1", "h2", "n"])
        bucket = (
            agg.column("h1").to_numpy(zero_copy_only=False)
            % np.int64(n_buckets)
        ).astype(np.int32)
        return agg.append_column("__bucket", pa.array(bucket, pa.int32()))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "h1" not in g.schema.names:
            return out_schema.empty_table()
        agg = pa.TableGroupBy(g, ["h1", "h2"]).aggregate([("n", "sum")])
        agg = agg.rename_columns(["h1", "h2", "n"])
        return agg.filter(pc.greater_equal(agg.column("n"), 2)).cast(
            out_schema
        )

    return partials.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def repeated_substring_spans(ds, *, min_len: int = 50,
                             text_col: str = "text",
                             id_col: str = "doc_id"):
    """Maximal per-doc character spans covered by corpus-repeated
    length-``min_len`` windows: (id_col, span_start, span_end),
    end-exclusive, 0-based — exactly the byte ranges Lee et al.'s
    suffix-array dedup would cut.

    Overlapping or touching hit windows merge (coverage of windows at
    p1 and p2 is contiguous iff p2 - p1 <= min_len), so spans are the
    connected components of window coverage.
    """
    import ray

    dup = duplicate_window_hashes(ds, min_len=min_len, text_col=text_col)

    # broadcast the dup-hash table once (see module docstring for the
    # >=10^8-entry Bloom + co-partitioned alternative); np.isin on h1
    # prefilters, the (h1, h2) pair check confirms
    # NB: an empty input block (e.g. from repartition) flows through
    # map_batches WITHOUT the UDF running, arriving here schema-less —
    # drop those, they carry nothing
    blocks = [
        b
        for b in (ray.get(r) for r in dup.to_arrow_refs())
        if b.num_rows and "h1" in b.schema.names
    ]
    h1s = np.concatenate(
        [b.column("h1").to_numpy(zero_copy_only=False) for b in blocks]
    ) if blocks else np.zeros(0, np.int64)
    h2s = np.concatenate(
        [b.column("h2").to_numpy(zero_copy_only=False) for b in blocks]
    ) if blocks else np.zeros(0, np.int64)
    dup_keys = _pair_keys(h1s, h2s)
    dup_keys.sort()
    dup_ref = ray.put(dup_keys)

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("span_start", pa.int64()),
            pa.field("span_end", pa.int64()),
        ]
    )

    def mark(b: pa.Table) -> pa.Table:
        dup_keys = ray.get(dup_ref)
        texts = b.column(text_col).to_pylist()
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        didx, pos, h1, h2 = _doc_window_hashes(texts, min_len)
        if len(dup_keys) and len(h1):
            keys = _pair_keys(h1.astype(np.int64), h2.astype(np.int64))
            lo = np.searchsorted(dup_keys, keys)
            lo_c = np.minimum(lo, len(dup_keys) - 1)
            hit = (lo < len(dup_keys)) & (dup_keys[lo_c] == keys)
        else:
            hit = np.zeros(len(h1), dtype=bool)
        didx_h = didx[hit]
        pos_h = pos[hit]
        # (didx_h, pos_h) is generated in ascending global-window order,
        # so it is already lexsorted by (doc, pos); spans are runs not
        # broken by a doc change or a gap > min_len — fully vectorized
        if len(pos_h):
            brk = np.flatnonzero(
                (np.diff(didx_h) != 0) | (np.diff(pos_h) > min_len)
            ) + 1
            seg_s = np.r_[0, brk]
            seg_e = np.r_[brk, len(pos_h)]
            ids_out = ids[didx_h[seg_s]]
            s_out = pos_h[seg_s]
            e_out = pos_h[seg_e - 1] + min_len
        else:
            ids_out = s_out = e_out = np.zeros(0, np.int64)
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "span_start": pa.array(s_out, pa.int64()),
                "span_end": pa.array(e_out, pa.int64()),
            },
            schema=out_schema,
        )

    return ds.map_batches(mark, batch_format="pyarrow")


def repeated_substring_cut(ds, *, min_len: int = 50,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """Lee et al.'s actual dedup action: CUT every repeated span out of
    the text. Returns (id_col, text_clean) for EVERY input doc — docs
    with no repeated window pass through byte-identical.

    Same two passes as repeated_substring_spans; the cut happens inside
    the mark map itself (spans for a doc are complete within its batch),
    so there is no extra join. The per-doc string surgery is a Python
    splice, but it only runs for docs that actually contain a repeated
    window — the clean majority is passed through as unmodified Arrow.
    """
    import ray

    dup = duplicate_window_hashes(ds, min_len=min_len, text_col=text_col)

    blocks = [
        b
        for b in (ray.get(r) for r in dup.to_arrow_refs())
        if b.num_rows and "h1" in b.schema.names
    ]
    h1s = np.concatenate(
        [b.column("h1").to_numpy(zero_copy_only=False) for b in blocks]
    ) if blocks else np.zeros(0, np.int64)
    h2s = np.concatenate(
        [b.column("h2").to_numpy(zero_copy_only=False) for b in blocks]
    ) if blocks else np.zeros(0, np.int64)
    dup_keys = _pair_keys(h1s, h2s)
    dup_keys.sort()
    dup_ref = ray.put(dup_keys)

    out_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("text_clean", pa.string())]
    )

    def cut(b: pa.Table) -> pa.Table:
        dup_keys = ray.get(dup_ref)
        texts = b.column(text_col).to_pylist()
        ids = pc.cast(b.column(id_col), pa.int64())
        didx, pos, h1, h2 = _doc_window_hashes(texts, min_len)
        if len(dup_keys) and len(h1):
            keys = _pair_keys(h1.astype(np.int64), h2.astype(np.int64))
            lo = np.searchsorted(dup_keys, keys)
            lo_c = np.minimum(lo, len(dup_keys) - 1)
            hit = (lo < len(dup_keys)) & (dup_keys[lo_c] == keys)
        else:
            hit = np.zeros(len(h1), dtype=bool)
        didx_h = didx[hit]
        pos_h = pos[hit]
        cleaned = list(texts)
        if len(pos_h):
            # runs of overlapping/adjacent hit windows, as in
            # repeated_substring_spans; splice each doc once
            brk = np.flatnonzero(
                (np.diff(didx_h) != 0) | (np.diff(pos_h) > min_len)
            ) + 1
            seg_s = np.r_[0, brk]
            seg_e = np.r_[brk, len(pos_h)]
            by_doc: dict = {}
            for a, z in zip(seg_s, seg_e):
                d = int(didx_h[a])
                by_doc.setdefault(d, []).append(
                    (int(pos_h[a]), int(pos_h[z - 1]) + min_len)
                )
            for d, spans in by_doc.items():
                t = texts[d]
                parts, prev = [], 0
                for s, e in spans:  # already sorted, non-overlapping
                    parts.append(t[prev:s])
                    prev = e
                parts.append(t[prev:])
                cleaned[d] = "".join(parts)
        return pa.table(
            {id_col: ids, "text_clean": pa.array(cleaned, pa.string())},
            schema=out_schema,
        )

    return ds.map_batches(cut, batch_format="pyarrow")


def _pair_bloom_set(h1: np.ndarray, h2: np.ndarray, m: int, k: int,
                    bits: np.ndarray, shards: int = 1) -> None:
    """Set Bloom bits for (h1, h2) window-hash pairs. The rolling
    hashes are already uniform 64-bit values, so Kirsch–Mitzenmacher
    double hashing runs directly on them (idx_i = h1 + i·(h2|1) mod m)
    — no re-hash, all uint64 vector ops. Delegates to ``Bloom`` so the
    partitioned probe-index formula lives in exactly ONE place (a
    drifted copy here would mean silent false negatives in the
    bucketed substring path)."""
    from .bloom import Bloom

    Bloom(m, k, bits, shards=shards)._add_hashed(h1, h2 | np.uint64(1))


def _pair_bloom_probe(h1: np.ndarray, h2: np.ndarray, m: int, k: int,
                      bits: np.ndarray, shards: int = 1) -> np.ndarray:
    from .bloom import Bloom

    return Bloom(m, k, bits, shards=shards)._contains_hashed(
        h1, h2 | np.uint64(1)
    )


def repeated_substring_spans_bucketed(ds, *, min_len: int = 50,
                                      text_col: str = "text",
                                      id_col: str = "doc_id",
                                      n_buckets: int = 64,
                                      fpr: float = 0.01):
    """The >=10^8-dup-hash scale form of ``repeated_substring_spans``:
    the dup-window table stays a DATASET — only its Bloom BITS
    broadcast (~1.2 bytes/entry at fpr 1e-2, ≈13× smaller than the
    (h1, h2, n) rows; 10^8 entries → ~120 MB of bits vs ~2.4 GB of
    table). Exactness is preserved: the Bloom has no false negatives,
    and every maybe-window is verified exactly against the dup table
    in a co-partitioned bucket groupby before it can mark a span.

    Shape: (1) pass 1 as usual (narrow hash partials → bucketed sum);
    (2) the Bloom bits build SHARDED (one groupby(shard) over narrow
    hash rows; each task allocates only m/n_shards bits, the driver
    pastes exactly n_shards slices); (3) a second corpus scan emits
    (h1, h2, id, pos) ONLY
    for windows the Bloom flags — true repeats + fpr·windows, never
    the corpus; (4) maybe-rows and dup keys co-partition by h1 bucket
    and a vectorized 128-bit searchsorted semi-join keeps true hits;
    (5) ONE groupby(doc_id) merges hit positions into maximal spans.
    Result == the broadcast form row-for-row (pinned in tests)."""
    import ray

    from .bloom import build_from_hashed_dataset

    # materialize: the dup table is consumed three times below (count,
    # Bloom bits build, verify union) and a lazy dataset re-executes
    # pass 1 once per consumer; it lives in the object store (spills
    # beyond memory), never on one worker's heap
    dup = duplicate_window_hashes(
        ds, min_len=min_len, text_col=text_col, n_buckets=n_buckets
    ).materialize()

    # Bloom build over the dup-hash DATASET — adaptive: above the
    # small-side threshold it runs SHARDED and distributed (no task
    # allocates the full bit array, the driver pastes n_shards slices,
    # m/8 bytes total, instead of OR-merging one full-size partial per
    # dup block); small dup tables stream through a local add and skip
    # the groupby barrier
    n_expected = max(1, dup.count())
    _bl = build_from_hashed_dataset(dup, n_expected=n_expected, fpr=fpr)
    m, k, n_shards, bits = _bl.m, _bl.k, _bl.shards, _bl.bits
    bits_ref = ray.put(bits)

    union_schema = pa.schema(
        [
            ("h1", pa.int64()), ("h2", pa.int64()),
            (id_col, pa.int64()), ("pos", pa.int64()),
            ("__is_dup", pa.int8()), ("__bucket", pa.int32()),
        ]
    )

    def maybe_rows(b: pa.Table) -> pa.Table:
        bl = ray.get(bits_ref)
        texts = b.column(text_col).to_pylist()
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        didx, pos, h1, h2 = _doc_window_hashes(texts, min_len)
        hit = _pair_bloom_probe(h1, h2, m, k, bl, shards=n_shards)
        h1, h2, didx, pos = h1[hit], h2[hit], didx[hit], pos[hit]
        h1s = h1.astype(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1s, pa.int64()),
                "h2": pa.array(h2.astype(np.int64), pa.int64()),
                id_col: pa.array(ids[didx], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "__is_dup": pa.array(np.zeros(len(h1s), np.int8)),
                "__bucket": pa.array(
                    (h1s % np.int64(n_buckets)).astype(np.int32), pa.int32()
                ),
            },
            schema=union_schema,
        )

    def dup_rows(b: pa.Table) -> pa.Table:
        h1s = b.column("h1").to_numpy(zero_copy_only=False)
        n = len(h1s)
        return pa.table(
            {
                "h1": b.column("h1"),
                "h2": b.column("h2"),
                id_col: pa.array(np.zeros(n, np.int64)),
                "pos": pa.array(np.zeros(n, np.int64)),
                "__is_dup": pa.array(np.ones(n, np.int8)),
                "__bucket": pa.array(
                    (h1s % np.int64(n_buckets)).astype(np.int32), pa.int32()
                ),
            },
            schema=union_schema,
        )

    both = ds.map_batches(maybe_rows, batch_format="pyarrow").union(
        dup.map_batches(dup_rows, batch_format="pyarrow")
    )

    hits_schema = pa.schema([(id_col, pa.int64()), ("pos", pa.int64())])

    def verify(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "h1" not in g.schema.names:
            return hits_schema.empty_table()
        is_dup = pc.equal(g.column("__is_dup"), 1)
        dups = g.filter(is_dup)
        rows = g.filter(pc.invert(is_dup))
        if dups.num_rows == 0 or rows.num_rows == 0:
            return hits_schema.empty_table()
        dk = _pair_keys(
            dups.column("h1").to_numpy(zero_copy_only=False),
            dups.column("h2").to_numpy(zero_copy_only=False),
        )
        dk.sort()
        rk = _pair_keys(
            rows.column("h1").to_numpy(zero_copy_only=False),
            rows.column("h2").to_numpy(zero_copy_only=False),
        )
        lo = np.searchsorted(dk, rk)
        lo_c = np.minimum(lo, len(dk) - 1)
        hit = (lo < len(dk)) & (dk[lo_c] == rk)
        return rows.filter(pa.array(hit)).select([id_col, "pos"]).cast(
            hits_schema
        )

    hits = both.groupby("__bucket").map_groups(verify, batch_format="pyarrow")

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("span_start", pa.int64()),
            pa.field("span_end", pa.int64()),
        ]
    )

    def merge_spans(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or id_col not in g.schema.names:
            return out_schema.empty_table()
        did = g.column(id_col).to_numpy(zero_copy_only=False)[0]
        p = np.sort(g.column("pos").to_numpy(zero_copy_only=False))
        brk = np.flatnonzero(np.diff(p) > min_len) + 1
        seg_s = np.r_[0, brk]
        seg_e = np.r_[brk, len(p)]
        return pa.table(
            {
                id_col: pa.array(np.full(len(seg_s), did, np.int64)),
                "span_start": pa.array(p[seg_s], pa.int64()),
                "span_end": pa.array(p[seg_e - 1] + min_len, pa.int64()),
            },
            schema=out_schema,
        )

    return hits.groupby(id_col).map_groups(
        merge_spans, batch_format="pyarrow"
    )
