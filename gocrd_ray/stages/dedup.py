"""Deduplication operators for corpus-scale training-data pipelines:
exact (hash-partition), MinHash+LSH, SimHash, exact n-gram Jaccard, and
embedding-cosine near-dup (in stages/similarity.py).

Scale shapes:
* exact dedup shuffles a 32-hex digest, never the document text — the
  groupby key is tiny and uniformly distributed (no skew);
* MinHash/LSH is the classic shingle → signature → band-bucket groupby:
  only (band, key, id) triples move through the shuffle;
* exact all-pairs Jaccard is intentionally quadratic — at scale it runs
  ONLY on LSH candidate pairs; the standalone form here (broadcast
  shingle sets + per-batch pair scan) exists as the oracle-checkable
  ground truth at test scale.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- exact dedup -------------------------------------------------------------


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append an md5 hex digest of the text column (matches DuckDB md5())."""
    texts = batch.column(text_col).to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None for t in texts]
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One survivor per distinct text: min id per md5(text).

    groupby on the digest — a 32-byte uniform key — then min(id). The
    only shuffle moves (hash, id) pairs. Returns (text_hash, {id_col}).
    """
    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col).select(["text_hash", id_col]),
        batch_format="pyarrow",
    )
    agg = hashed.groupby("text_hash").min(id_col)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["text_hash", id_col])

    return agg.map_batches(rename, batch_format="pyarrow")


def add_hash_bucket(ds, col: str = "text", n_buckets: int = 256,
                    out_col: str = "bucket"):
    """Append a uniform hash-bucket column (crc32 of ``col`` mod N) —
    the partition key for bucketed corpus layouts (docs/SCALE.md §3):
    written into the resumable output so corpus-wide dedup factors into
    independent bucket-local groupbys."""
    import pyarrow as pa
    import zlib as _z

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_pylist()
        bk = [
            _z.crc32(v if isinstance(v, bytes) else (v or "").encode("utf-8"))
            % n_buckets
            for v in vals
        ]
        return b.append_column(out_col, pa.array(bk, pa.int32()))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def soft_dedup_weights(ds, id_col: str = "doc_id", text_col: str = "text",
                       n_groups: int = 256):
    """Soft (weighted) exact dedup — the SoftDeDup family (He et al.
    2024, arXiv:2401.00838): instead of REMOVING exact duplicates,
    every document gets sampling weight ``1 / n_copies`` where
    ``n_copies`` counts the docs sharing its md5(text) digest. The
    trainer then samples by weight: duplicated content keeps exactly
    one document's worth of expected mass without discarding any row
    (useful when near-boilerplate pages still carry unique tails).

    Scale shape — the ``exact_dedup`` contract plus the
    ``_bucket_pairs`` sharding discipline: only (digest, id) rows ever
    shuffle (never text), whole digest-groups co-locate by a 256-way
    crc32 shard of the digest so the groupby pays ONE Python callback
    per SHARD instead of one per digest (mostly-singleton digests
    would cost ~|corpus| callbacks), and inside a shard the count
    attach is a single lexsort + run-length ``np.repeat``. Null texts
    are dropped (md5(NULL) can match nothing — SQL NULL semantics).

    Returns ``(id_col, n_copies:int64, weight:float64 = 1/n_copies)``;
    weight is one IEEE-754 division, bit-identical to SQL's
    ``CAST(1 AS DOUBLE) / count(*)``.
    """

    def hash_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(text_col)))
        texts = b.column(text_col).to_pylist()
        # per-row md5 is the SQL-parity contract (DuckDB md5() mirror)
        digs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        shard = [zlib.crc32(d.encode("ascii")) % n_groups for d in digs]
        return pa.table(
            {
                "__dig": pa.array(digs, pa.string()),
                id_col: pc.cast(b.column(id_col), pa.int64()),
                "__shard": pa.array(shard, pa.int32()),
            }
        )

    sharded = ds.map_batches(hash_rows, batch_format="pyarrow")

    def count_in_shard(g: pa.Table) -> pa.Table:
        digs = np.asarray(g.column("__dig").to_pylist(), dtype=object)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, digs))
        d_sorted = digs[order]
        new = np.ones(len(order), dtype=bool)
        new[1:] = d_sorted[1:] != d_sorted[:-1]
        starts = np.flatnonzero(new)
        lengths = np.diff(np.append(starts, len(order)))
        n = np.repeat(lengths, lengths).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "n_copies": pa.array(n),
                "weight": pa.array(1.0 / n.astype(np.float64), pa.float64()),
            }
        )

    return sharded.groupby("__shard").map_groups(
        count_in_shard, batch_format="pyarrow"
    )


def _dedup_rows_by_url(b: pa.Table, policy: str, ts_col: str) -> pa.Table:
    """Vectorized one-winner-per-url selection within a table.

    Winner order — "latest": (-ts, digest asc); "first": (digest asc).
    Deterministic for both policies regardless of row arrival order, so
    task retries and repeated runs always keep the same survivor.

    Null urls are grouped under "" (one winner for all null-url rows)
    rather than crashing the lexsort — poison-row principle.
    """
    urls = np.asarray(
        pc.fill_null(pc.cast(b.column("url"), pa.string()), "").to_pylist(),
        dtype=object,
    )
    digs = b.column("__dig").to_numpy(zero_copy_only=False)
    if policy == "latest":
        ts = pc.fill_null(
            pc.cast(b.column(ts_col), pa.int64()), -(2**63) + 1
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((digs, -ts, urls))
    else:
        order = np.lexsort((digs, urls))
    u_sorted = urls[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = u_sorted[1:] != u_sorted[:-1]
    return b.take(pa.array(order[keep], pa.int64()))


def dedup_by_url(pages_ds, policy: str = "first", ts_col: str = "warc_ts",
                 n_buckets: int = 64):
    """Exact per-url dedup for the pages corpus (SURVEY.md §2.7): one
    row per url — the hash shuffle on `url` is the engine's ONE required
    shuffle for the per-url invariant.

    Shape (r01 verdict #5): a per-block vectorized pre-dedup COMBINER
    runs before the shuffle (one candidate per url per block — repeat
    crawls of a url inside a block never reach the wire), the shuffle
    key is ``crc32(url) % n_buckets`` rather than the raw url (so the
    reduce side runs one vectorized selection per BUCKET instead of a
    Python callback per ~1-row url group), and the winner order is a
    numpy lexsort, never row-at-a-time Python.

    policy: "first" (deterministic representative: smallest content
    digest) or "latest" (max ts_col — the CC re-crawl semantics: keep
    the newest capture of each url; ties on ts_col broken by smallest
    content digest).
    """

    def add_keys_and_precombine(b: pa.Table) -> pa.Table:
        import pandas as pd

        src = b.column("html") if "html" in b.column_names else b.column("url")
        # the digest is an INTERNAL deterministic tiebreak (the SQL
        # mirrors only pin url + lang/ts, and same-url rows carry the
        # same content), so it does not need md5 parity — vectorized
        # siphash (fixed pandas key, stable across processes/runs) is
        # ~5x faster than the old per-row hashlib.md5 loop, and this
        # runs on EVERY page ahead of the engine's one required shuffle
        digs = pd.util.hash_array(
            np.asarray(
                [v if v is not None else b"" for v in src.to_pylist()],
                dtype=object,
            )
        ).astype(np.uint64)
        b = b.append_column("__dig", pa.array(digs, pa.uint64()))
        b = _dedup_rows_by_url(b, policy, ts_col)
        urls = np.asarray(
            pc.fill_null(pc.cast(b.column("url"), pa.string()), "")
            .to_pylist(),
            dtype=object,
        )
        bucket = (pd.util.hash_array(urls) % n_buckets).astype(np.int32)
        return b.append_column("__bucket", pa.array(bucket, pa.int32()))

    pre = pages_ds.map_batches(add_keys_and_precombine, batch_format="pyarrow")

    def per_bucket(group: pa.Table) -> pa.Table:
        out = _dedup_rows_by_url(group, policy, ts_col)
        return out.drop_columns(["__dig", "__bucket"])

    return pre.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def paragraph_dedup(ds, *, text_col: str = "text", id_col: str = "url",
                    sep: str = "\n"):
    """Paragraph-level exact dedup across the corpus — the CC pipeline
    stage that finds boilerplate paragraphs repeated across pages (the
    line/paragraph-granular sibling of ``exact_dedup``).

    Shape: paragraphs explode vectorized per batch (split + flatten),
    then a per-batch PARTIAL aggregate (md5(paragraph) → count, min id)
    combines before the one global groupby — only narrow
    (hash, count, min-id) partials shuffle, never paragraph text.

    Returns (para_hash, n_occurrences, first_{id_col}).
    """
    from ray.data.aggregate import Min, Sum

    out_id = f"first_{id_col}"

    def partial(b: pa.Table) -> pa.Table:
        texts = pc.split_pattern(pc.fill_null(b.column(text_col), ""), sep)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat = pc.list_flatten(texts)
        parents = pc.list_parent_indices(texts)
        ids = pc.take(b.column(id_col), parents)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        ids = ids.filter(nonempty)
        h = pa.array(
            [hashlib.md5(t.encode("utf-8")).hexdigest() for t in flat.to_pylist()],
            pa.string(),
        )
        t = pa.table({"para_hash": h, "id": ids})
        part = pa.TableGroupBy(t, "para_hash").aggregate(
            [("id", "count"), ("id", "min")]
        )
        name_map = {"para_hash": "para_hash", "id_count": "n_occurrences",
                    "id_min": out_id}
        return part.rename_columns([name_map[c] for c in part.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("para_hash").aggregate(
        Sum("n_occurrences"), Min(out_id)
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["para_hash", "n_occurrences", out_id])

    return agg.map_batches(rename, batch_format="pyarrow")


def hash_sample(ds, *, col: str = "url", hex_threshold: str = "28f5c28f"):
    """Deterministic corpus sampling: keep rows whose md5(col) 8-hex
    prefix sorts below ``hex_threshold`` (rate ≈ int(threshold,16)/16^8).

    The standard reproducible-sample stage for QA / eval splits: pure
    per-row filter (no shuffle, no RNG state), stable across runs,
    machines, and partitionings, and exactly mirrorable in SQL
    (``substr(md5(col),1,8) < threshold``).
    """

    def keep(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_pylist()
        mask = pa.array(
            [
                v is not None
                and hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8]
                < hex_threshold
                for v in vals
            ]
        )
        return b.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, *, strata_col: str = "lang",
                      key_col: str = "url", k: int = 10):
    """Deterministic stratified sampling: the ``k`` rows with the
    smallest md5(key_col) digest per stratum — a fixed-size,
    reproducible per-language / per-domain eval draw (the stratified
    companion to hash_sample's rate-based global draw).

    Scale shape: every batch pre-truncates to its own per-stratum
    top-k (vectorized lexsort + run-rank), so the ONE groupby shuffle
    carries <= k x (strata seen in the block) rows per block — never
    the corpus; the per-stratum merge re-applies the identical rule to
    the union of partials (top-k is a mergeable aggregate). Null keys
    or strata are dropped up front (poison-row principle: a malformed
    row must never kill a batch). md5 + key tiebreak is the SQL
    contract: ``row_number() OVER (PARTITION BY stratum ORDER BY
    md5(key), key) <= k``.
    """

    def _topk(b: pa.Table, digs: np.ndarray) -> tuple:
        strata = np.asarray(b.column(strata_col).to_pylist(), dtype=object)
        keys = np.asarray(b.column(key_col).to_pylist(), dtype=object)
        order = np.lexsort((keys, digs, strata))
        ss = strata[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        runs = np.diff(np.r_[starts, len(ss)])
        rank = np.arange(len(ss)) - np.repeat(starts, runs)
        return order[rank < k]

    def partial(b: pa.Table) -> pa.Table:
        valid = pc.and_(
            pc.is_valid(b.column(strata_col)), pc.is_valid(b.column(key_col))
        )
        b = b.filter(valid)
        if b.num_rows == 0:
            return b.append_column("__dig", pa.array([], pa.string()))
        digs = np.array(
            [
                hashlib.md5(str(v).encode("utf-8")).hexdigest()
                for v in b.column(key_col).to_pylist()
            ],
            dtype=object,
        )
        sel = _topk(b, digs)
        return b.take(pa.array(sel)).append_column(
            "__dig", pa.array(digs[sel], pa.string())
        )

    def merge(g: pa.Table) -> pa.Table:
        digs = np.asarray(g.column("__dig").to_pylist(), dtype=object)
        sel = _topk(g, digs)
        return g.take(pa.array(sel)).drop_columns(["__dig"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(strata_col).map_groups(
        merge, batch_format="pyarrow"
    )


# -- shingles / MinHash ------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_grams(text: str, k: int) -> list[str]:
    toks = text.split(" ") if text else []
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _hash32(values: list[str] | np.ndarray) -> np.ndarray:
    """Deterministic vectorized 32-bit string hashes (SipHash via
    pandas.util.hash_array, masked to 32 bits — the universe the
    _permute_m61 universal hash permutes; the mod-M61 product itself
    is overflow-safe via 128-bit decomposition there)."""
    import pandas as pd

    h = pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)
    return h.astype(np.uint64) & np.uint64(0xFFFFFFFF)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    grams = _shingle_grams(text, k)
    if not grams:
        return np.array([], dtype=np.uint64)
    return np.unique(_hash32(grams))


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _permute_m61(a: np.ndarray, b: np.ndarray, h: np.ndarray) -> np.ndarray:
    """True (a*h + b) mod 2^61−1 universal hash, vectorized, with a in
    [1, M) and h < 2^32 — the uint64 product a*h reaches ~2^93, so the
    multiply is decomposed into 32-bit halves and folded with
    2^61 ≡ 1 (mod M) instead of silently wrapping (the r2 bug: naive
    numpy wrap is deterministic but NOT the claimed universal hash;
    restricting a < 2^32 instead is worse — without wraparound a tiny
    shingle hash stays tiny under EVERY permutation and dominates all
    minima, collapsing MinHash agreement on real pairs).

    Shapes broadcast: a, b are (num_perm, 1); h is (1, n_shingles).
    """
    M = np.uint64(_MERSENNE)
    a_hi = a >> np.uint64(32)          # < 2^29
    a_lo = a & np.uint64(0xFFFFFFFF)   # < 2^32
    t1 = a_hi * h                      # < 2^61
    t2 = a_lo * h                      # < 2^64
    # t1·2^32 mod M: t1·2^32 = (t1 >> 29)·2^61 + (t1 mod 2^29)·2^32
    hi_part = (t1 >> np.uint64(29)) + ((t1 & np.uint64((1 << 29) - 1)) << np.uint64(32))
    lo_part = (t2 >> np.uint64(61)) + (t2 & M)
    x = hi_part + lo_part + b          # < 2^62 + 2^62 + 2^61 < 2^64
    x = (x >> np.uint64(61)) + (x & M)
    x = (x >> np.uint64(61)) + (x & M)
    return np.where(x >= M, x - M, x)


class MinHasher:
    """Actor-pool stage: documents → MinHash signatures (Broder 1997,
    "On the resemblance and containment of documents"; banding analysis
    per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3).

    Permutation parameters are built once per actor (__init__); each
    batch computes signatures with one (num_perm × n_shingles) vectorized
    min-reduce per document.
    """

    def __init__(self, num_perm: int = 64, k: int = 3, id_col: str = "doc_id"):
        self.num_perm = num_perm
        self.k = k
        self.id_col = id_col
        self.a, self.b = _perm_params(num_perm)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) — modular hash, min per row
        vals = _permute_m61(self.a[:, None], self.b[:, None], sh[None, :])
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized: ONE hash_array call over every shingle of
        # every document, then a segmented min-reduce per (perm, doc) —
        # chunked so the (num_perm × grams) working matrix stays ~128MB
        texts = batch.column("text").to_pylist()
        gram_lists = [_shingle_grams(t or "", self.k) for t in texts]
        sigs = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
        max_grams = max(1, (16 << 20) // self.num_perm)
        i = 0
        while i < len(gram_lists):
            j = i
            total = 0
            while j < len(gram_lists) and (total == 0 or total + len(gram_lists[j]) <= max_grams):
                total += len(gram_lists[j])
                j += 1
            nonempty = [d for d in range(i, j) if gram_lists[d]]
            if nonempty:
                flat = np.concatenate(
                    [np.asarray(gram_lists[d], dtype=object) for d in nonempty]
                )
                h = _hash32(flat)
                vals = _permute_m61(self.a[:, None], self.b[:, None], h[None, :])
                starts = np.cumsum(
                    [0] + [len(gram_lists[d]) for d in nonempty[:-1]]
                )
                mins = np.minimum.reduceat(vals, starts, axis=1)
                sigs[nonempty, :] = mins.T
            i = j
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "sig": pa.array(
                    list(sigs.astype(np.int64)),
                    pa.list_(pa.int64(), self.num_perm),
                ),
            }
        )


#: Runs (equal-key bucket collisions) longer than this switch from full
#: pairwise emission to the bounded ``hot_mode`` behavior. 1024 keeps the
#: worst per-run pairwise cost at ~0.5M rows while being far above any
#: bucket a healthy LSH parameterization produces on non-degenerate data.
HOT_RUN_CAP = 1024


def _bucket_pairs(buckets_ds, *, band_col: str, key_col: str, id_col: str,
                  n_groups: int = 256, hot_run_cap: int = HOT_RUN_CAP,
                  hot_mode: str = "star"):
    """(band, key, id) bucket rows → (id_a, id_b, n) candidate pairs,
    n = number of buckets the pair shares.

    Whole buckets co-locate by a hash of (band, key) into ~n_groups
    shuffle groups (NOT one group per bucket: mostly-singleton buckets
    would cost a Python map_groups callback each — measured 160k
    callbacks at sf0.1). Inside a group everything is vectorized: one
    lexsort, run detection on the combined bucket key, and per-run
    ``np.triu_indices`` emission only for runs that actually collide
    (the near-dup candidates themselves).

    HOT BUCKETS (r4 verdict #1 — the last scale-killer): a real crawl
    has clusters of d near-identical boilerplate pages whose band keys
    all collide; full pairwise emission is C(d,2) rows PER BAND from
    one logical bucket (d=10⁶ → ~10¹² pair rows — one task OOMs).
    Runs longer than ``hot_run_cap`` therefore switch to ``hot_mode``:

    - ``"star"`` (default): emit (run_min, other) — O(d) rows. Every
      run member stays connected to the run minimum, so CONNECTED
      COMPONENTS over the candidates (the dedup contract:
      dedup_fuzzy_corpus / dedup_clusters) are unchanged whenever
      intra-run similarity is transitive at the verify threshold —
      which is exactly the hot-bucket regime (d near-identical docs).
      Consumers that need the full pairs LIST above the cap must not
      use star.
    - ``"error"``: raise loudly (the heavyhitters.py discipline) — for
      consumers whose contract is the exact pairs list
      (verified_jaccard_pairs' oracle form): a silent star subset
      would be a wrong answer, an OOM a mystery; a ValueError names
      the fix (raise the cap, or accept star semantics).
    - ``"pairwise"``: unbounded legacy emission — test/oracle use only.
    """
    if hot_mode not in ("star", "error", "pairwise"):
        raise ValueError(f"_bucket_pairs: unknown hot_mode {hot_mode!r}")

    def add_shard(b: pa.Table) -> pa.Table:
        band = b.column(band_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # unique per (band, key): callers keep keys ≤ 55 bits and
        # bands < 256, so the packing never wraps int64
        combo = key * np.int64(256) + band
        shard = (
            (combo.astype(np.uint64) * np.uint64(2654435761))
            >> np.uint64(13)
        ).astype(np.int64) % n_groups
        return pa.table(
            {
                "combo": pa.array(combo, pa.int64()),
                id_col: pc.cast(b.column(id_col), pa.int64()),
                "__shard": pa.array(shard, pa.int32()),
            }
        )

    sharded = buckets_ds.map_batches(add_shard, batch_format="pyarrow")

    def pairs_in_shard(group: pa.Table) -> pa.Table:
        combo = group.column("combo").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, combo))
        c = combo[order]
        i = ids[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        lengths = np.diff(np.append(starts, len(c)))
        a_parts: list = []
        b_parts: list = []
        for s, ln in zip(starts[lengths > 1], lengths[lengths > 1]):
            members = i[s : s + ln]  # ascending (lexsort secondary key)
            if ln > hot_run_cap and hot_mode != "pairwise":
                if hot_mode == "error":
                    raise ValueError(
                        f"_bucket_pairs: hot bucket of {ln} colliding ids "
                        f"exceeds hot_run_cap={hot_run_cap}; full pairwise "
                        f"emission would be {ln * (ln - 1) // 2} rows from "
                        "ONE bucket. Raise hot_run_cap if that volume is "
                        "intended, or use hot_mode='star' (cluster-"
                        "preserving bounded emission) for dedup consumers."
                    )
                # star: each member vs the run minimum — O(ln) rows
                a_parts.append(np.full(ln - 1, members[0], dtype=np.int64))
                b_parts.append(members[1:])
            else:
                xi, yi = np.triu_indices(int(ln), k=1)
                a_parts.append(members[xi])
                b_parts.append(members[yi])
        a_out = (
            np.concatenate(a_parts) if a_parts else np.zeros(0, np.int64)
        )
        b_out = (
            np.concatenate(b_parts) if b_parts else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "n": pa.array(np.ones(len(a_out), dtype=np.int64)),
            }
        )

    return sharded.groupby("__shard").map_groups(
        pairs_in_shard, batch_format="pyarrow"
    )


def lsh_raw_band_pairs(ds, num_perm: int = 64, bands: int = 16, k: int = 3,
                       id_col: str = "doc_id", shard: int | None = None,
                       n_shards: int = 1, hot_run_cap: int = HOT_RUN_CAP,
                       hot_mode: str = "star"):
    """Raw per-band LSH collisions: (id_a, id_b, n=1) with one row per
    band in which the pair collided — i.e. ``lsh_candidate_pairs``
    WITHOUT the distinct groupby. Consumers that tolerate duplicate
    pairs (``attach_pair_lookup`` dedups them in its regroup) feed on
    this directly and save a whole all-to-all.

    ``hot_run_cap`` / ``hot_mode``: bounded emission for hot buckets
    (see ``_bucket_pairs``) — runs above the cap emit star pairs
    (default, cluster-preserving) or raise (pairs-list consumers).
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def to_buckets(batch: pa.Table) -> pa.Table:
        # fully vectorized band keys: FNV-1a folded over the band's
        # minhash values (numpy uint64 wraparound), masked to 55 bits so
        # _bucket_pairs' (key << 8 | band) packing stays collision-free
        # in int64. The key only needs to distinguish band signatures —
        # any uniform hash gives identical candidate pairs (collisions
        # at 2^-55 per bucket pair are below the old crc32's 2^-32).
        n = len(batch)
        sig = batch.column("sig")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        vals = (
            sig.values.to_numpy(zero_copy_only=False)
            .astype(np.uint64)
            .reshape(n, num_perm)
        )
        keys = np.empty((bands, n), dtype=np.uint64)
        for bi in range(bands):
            band = vals[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.full(n, np.uint64(0xCBF29CE484222325))
            for c in range(rows_per_band):
                h = (h ^ band[:, c]) * np.uint64(0x100000001B3)
            keys[bi] = h
        out_key = (keys.reshape(-1) & np.uint64((1 << 55) - 1)).astype(np.int64)
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "band": pa.array(out_band),
                "bkey": pa.array(out_key),
                id_col: ids.take(pa.array(np.tile(np.arange(n), bands))),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    if shard is not None:
        # job-level decomposition (docs/SCALE.md §3): bucket keys are
        # uniform, so restricting to bkey % n_shards == shard yields an
        # INDEPENDENT sub-job that checkpoints separately. A pair's band
        # collisions split across shards — combine shard outputs by
        # summing n_buckets per (id_a, id_b) (verified in tests).
        def only_shard(b: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc
            import numpy as _np

            bk = b.column("bkey").to_numpy(zero_copy_only=False)
            mask = pa.array((_np.asarray(bk) % n_shards) == shard)
            return b.filter(mask)

        buckets = buckets.map_batches(only_shard, batch_format="pyarrow")

    return _bucket_pairs(buckets, band_col="band", key_col="bkey",
                         id_col=id_col, hot_run_cap=hot_run_cap,
                         hot_mode=hot_mode)


def lsh_candidate_pairs(ds, num_perm: int = 64, bands: int = 16, k: int = 3,
                        id_col: str = "doc_id", shard: int | None = None,
                        n_shards: int = 1, hot_run_cap: int = HOT_RUN_CAP,
                        hot_mode: str = "star"):
    """MinHash+LSH candidate pairs: shingle → signature → band-bucket
    groupby → within-bucket pairs (SURVEY-plus operator; no reference
    analog — [scale]).

    Returns a Dataset of (id_a, id_b, n_buckets) with id_a < id_b;
    n_buckets = number of bands in which the pair collided (≥1).
    Hot buckets above ``hot_run_cap`` follow ``hot_mode`` (star pairs
    by default — see ``_bucket_pairs``).
    """
    pairs = lsh_raw_band_pairs(ds, num_perm=num_perm, bands=bands, k=k,
                               id_col=id_col, shard=shard, n_shards=n_shards,
                               hot_run_cap=hot_run_cap, hot_mode=hot_mode)
    # collapse duplicate pairs across bands
    agg = pairs.groupby(["id_a", "id_b"]).sum("n")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["id_a", "id_b", "n_buckets"])

    return agg.map_batches(rename, batch_format="pyarrow")


def lsh_candidate_pairs_merged(ds, *, n_shards: int = 4, num_perm: int = 64,
                               bands: int = 16, k: int = 3,
                               id_col: str = "doc_id",
                               hot_run_cap: int = HOT_RUN_CAP,
                               hot_mode: str = "star"):
    """Hierarchical LSH (ROADMAP item 3 — the 10^12-doc job shape): run
    each bucket-key shard as an INDEPENDENT sub-job and merge by
    summing band multiplicities per pair.

    Bucket keys are uniform hashes, so ``bkey % n_shards == s`` slices
    the band table into disjoint sub-jobs that can run as separate
    driver submissions, checkpoint separately, and retry independently;
    a pair's band collisions partition across shards, so the merge —
    one narrow groupby(id_a, id_b).sum — reproduces the single-job
    result EXACTLY (pinned by test).

    Each shard runs to COMPLETION before the next starts
    (materialize() = the in-memory stand-in for the pair-table Parquet
    checkpoint each sub-job writes at deployment scale; pair tables are
    tiny next to the corpus). Sequential sub-jobs are also what makes
    this safe on a small cluster: unioning n live shard pipelines would
    put n MinHasher actor pools (min 1 CPU each) plus their read tasks
    into ONE streaming plan, and the pool minimums can reserve every
    CPU while the tasks that would feed them stay pending — a real
    deadlock observed at num_cpus=4 with n_shards=3.
    """
    parts = [
        lsh_candidate_pairs(
            ds, num_perm=num_perm, bands=bands, k=k, id_col=id_col,
            shard=s, n_shards=n_shards, hot_run_cap=hot_run_cap,
            hot_mode=hot_mode,
        ).materialize()
        for s in range(n_shards)
    ]
    merged = parts[0].union(*parts[1:])
    agg = merged.groupby(["id_a", "id_b"]).sum("n_buckets")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["id_a", "id_b", "n_buckets"])

    return agg.map_batches(rename, batch_format="pyarrow")


# -- SimHash -----------------------------------------------------------------


def simhash_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash (Charikar 2002 random-hyperplane sketch, as used
    for web dedup in Manku et al. 2007) over 64-bit SipHash token
    hashes (pandas.util.hash_array, fixed default key — deterministic)
    → (id, simhash, prefix16).

    Fully vectorized across the batch: ONE hash_array call over every
    token of every document, one (tokens × 64) bit expansion, and a
    scatter-add per document — no per-row Python loop (r01 verdict #9;
    the old per-doc crc32 loop was 10-50x slower).

    prefix16 (top 16 bits) is the bucketing key for hamming-neighbor
    search: near-dups collide in at least one of a few rotated prefixes.
    """
    import pandas as pd

    n_docs = len(batch)
    toks = pc.split_pattern(
        pc.fill_null(batch.column("text"), ""), " "
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    parents = parents.filter(nonempty).to_numpy(zero_copy_only=False)
    sim_np = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        h64 = pd.util.hash_array(
            flat.to_numpy(zero_copy_only=False), categorize=False
        ).astype(np.uint64)
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        )
        v = np.zeros((n_docs, 64), dtype=np.int64)
        np.add.at(v, parents, 2 * bits - 1)
        weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        sim_np = ((v > 0) * weights).sum(axis=1, dtype=np.uint64).view(np.int64)
    sim = pa.array(sim_np, pa.int64())
    prefix = pc.bit_wise_and(
        pc.shift_right(sim, 48), pa.scalar(0xFFFF, pa.int64())
    )
    return pa.table(
        {id_col: batch.column(id_col), "simhash": sim, "prefix16": prefix}
    )


# -- exact n-gram Jaccard ----------------------------------------------------


def _shingle_strings(text: str, k: int) -> list[str]:
    """Distinct k-token shingles as sorted strings (the SQL-oracle form:
    DuckDB counts distinct shingle STRINGS, and a hash collision would
    silently skew integer inter/uni counts)."""
    toks = text.split(" ") if text else []
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


def shingle_sets(ds, *, k: int = 3, id_col: str = "doc_id"):
    """Per-document distinct-shingle sets as a Dataset (id, sh:list<string>)."""

    def to_sets(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "sh": pa.array(
                    [_shingle_strings(t or "", k) for t in texts],
                    pa.list_(pa.string()),
                ),
            }
        )

    return ds.map_batches(to_sets, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, *, k: int = 3, min_jaccard: float = 0.5,
                        id_col: str = "doc_id"):
    """Exact k-token-shingle Jaccard over all pairs with J ≥ threshold.

    Test-scale ground truth: the distinct-shingle sets of the WHOLE
    corpus are broadcast once (ray.put) and each batch scans its docs
    against all higher ids — O(n²/2) comparisons total. At 10^12 docs
    this operator is only ever run on LSH candidate pairs
    (lsh_candidate_pairs); the threshold filter `2*inter >= uni` is
    integer-only so the DuckDB oracle matches bit-for-bit.
    """
    import ray

    # materialize once: the shingle-set table is both the broadcast side
    # and the iteration side (avoids lazy re-execution)
    sets_tbl = shingle_sets(ds, k=k, id_col=id_col).materialize()
    collected = pa.concat_tables([ray.get(r) for r in sets_tbl.to_arrow_refs()])
    by_id = {
        i: frozenset(s)
        for i, s in zip(collected.column(id_col).to_pylist(), collected.column("sh").to_pylist())
    }
    broadcast = ray.put(by_id)

    def pairs(batch: pa.Table) -> pa.Table:
        universe = ray.get(broadcast)
        a_out, b_out, inter_out, uni_out = [], [], [], []
        for i in batch.column(id_col).to_pylist():
            si = universe[i]
            for j, sj in universe.items():
                if j <= i:
                    continue
                inter = len(si & sj)
                uni = len(si) + len(sj) - inter
                # integer-only threshold test (2*inter >= uni ⟺ J >= 0.5)
                # so the SQL oracle matches without float comparisons
                if inter > 0 and uni > 0 and 2 * inter >= uni:
                    a_out.append(i)
                    b_out.append(j)
                    inter_out.append(inter)
                    uni_out.append(uni)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "inter": pa.array(inter_out, pa.int64()),
                "uni": pa.array(uni_out, pa.int64()),
            }
        )

    return sets_tbl.map_batches(pairs, batch_format="pyarrow")


def attach_column_lookup(pairs_ds, lookup_ds, *, key_col: str, out_col: str,
                         id_col: str, value_col: str, value_type: pa.DataType,
                         n_buckets: int = 32, pairs_schema=None):
    """Co-partitioned lookup join: append ``lookup_ds``'s ``value_col``
    (matched on ``pairs.key_col == lookup.id_col``) as ``out_col``.

    pyarrow's hash join rejects list-typed payload columns, so this is
    the partitioned-hash-join shape (stages/join.py) done by hand: both
    sides get ``bucket = hash(key) % B``, ONE groupby(bucket) shuffle
    co-locates pair rows with exactly the lookup rows they reference,
    and a vectorized ``index_in`` + ``take`` per bucket attaches the
    values (unmatched keys → null). Only pairs + referenced values
    move; nothing is broadcast. Used for shingle sets (list<string>)
    and embeddings (list<float>).

    Pass ``pairs_schema`` when ``pairs_ds`` is LAZY: ``.schema()`` on a
    lazy dataset executes its plan up to the first block, so chaining
    two attach passes without it runs the first pass's shuffle TWICE
    (measured — it roughly doubled the wall time of the composed
    verified-Jaccard / cosine-verify pipelines).
    """
    pschema = (
        pairs_schema if pairs_schema is not None
        else pairs_ds.schema().base_schema
    )
    pnames = list(pschema.names)
    sh_type = value_type
    union_schema = pa.schema(
        list(pschema)
        + [pa.field("__sh", sh_type), pa.field("__bucket", pa.int32()),
           pa.field("__side", pa.string())]
    )
    out_schema = pa.schema(list(pschema) + [pa.field(out_col, sh_type)])

    def _aligned(b: pa.Table, target: pa.Schema) -> pa.Table:
        cols = []
        for f in target:
            if f.name in b.column_names:
                cols.append(pc.cast(b.column(f.name), f.type))
            else:
                cols.append(pa.nulls(len(b), f.type))
        return pa.Table.from_arrays(cols, schema=target)

    def bucket_of(col) -> pa.Array:
        # keys are int64 ids on both sides (tag_sets casts) — one
        # numpy multiply-shift hash, no per-row Python
        k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
        return pa.array((h % np.uint64(n_buckets)).astype(np.int32))

    def tag_pairs(b: pa.Table) -> pa.Table:
        b = b.append_column("__bucket", bucket_of(b.column(key_col)))
        b = b.append_column("__side", pa.array(["p"] * len(b), pa.string()))
        return _aligned(b, union_schema)

    def tag_sets(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: pc.cast(b.column(id_col), pa.int64()),
                      "__sh": pc.cast(b.column(value_col), sh_type)})
        t = t.append_column("__bucket", bucket_of(t.column(key_col)))
        t = t.append_column("__side", pa.array(["s"] * len(t), pa.string()))
        return _aligned(t, union_schema)

    both = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        lookup_ds.map_batches(tag_sets, batch_format="pyarrow")
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        smask = pc.equal(group.column("__side"), "s")
        srows = group.filter(smask)
        prows = group.filter(pc.invert(smask))
        skeys = srows.column(key_col)
        if isinstance(skeys, pa.ChunkedArray):
            skeys = skeys.combine_chunks()
        svals = srows.column("__sh")
        if isinstance(svals, pa.ChunkedArray):
            svals = svals.combine_chunks()
        idx = pc.index_in(prows.column(key_col), value_set=skeys)
        sh = svals.take(idx) if len(srows) else pa.nulls(len(prows), sh_type)
        out = prows.select(pnames).append_column(out_col, sh)
        return _aligned(out, out_schema)

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def attach_pair_lookup(pairs_ds, lookup_ds, *, id_col: str, value_col: str,
                       value_type: pa.DataType, out_a: str, out_b: str,
                       n_buckets: int = 32, num_blocks: int | None = None):
    """ONE-shuffle pair attach (r2 verdict #3 / ROADMAP #8): bring
    ``lookup_ds``'s ``value_col`` onto BOTH sides of (id_a, id_b)
    candidate pairs while the lookup table crosses the wire once.

    Shape: each pair explodes into two NARROW keyed rows (id_a, id_b,
    side, key = that side's id); exploded rows and lookup rows
    co-locate by hash(key) — the only shuffle the lookup values ride —
    and each exploded row picks up its value via vectorized
    ``index_in`` + ``take``. A second exchange regroups by a
    pair-bucket key and a stride-2 lexsort reassembles
    (id_a, id_b, val_a, val_b); it moves exactly two value payloads
    per pair, never the lookup table.

    vs chaining ``attach_column_lookup`` once per side: the lookup
    table shuffles ONCE instead of twice and the all-to-all count is
    unchanged (two), so total exchange bytes drop by ~one lookup-table
    pass (the r2-measured improvable term in dedup_verified /
    neardup_cosine).

    Candidate ids absent from ``lookup_ds`` surface as null values
    (callers skip them — dangling candidates). Duplicate (id_a, id_b)
    rows in ``pairs_ds`` are welcome and collapse to ONE output row:
    every copy of a pair hashes to the same pair bucket, so the regroup
    lexsort dedups them in place — which is what lets callers feed RAW
    multi-band LSH collisions straight in and skip the distinct
    groupby (one whole all-to-all) they used to need. Returns a
    Dataset of (id_a, id_b, out_a, out_b), one row per distinct pair.

    ``num_blocks``: when the caller KNOWS both streams are small (e.g.
    a materialized candidate table + a prefiltered lookup), coalescing
    the union to ~rows/8k blocks before the groupbys removes the
    per-block scheduling overhead that otherwise dominates (measured
    4× at sf0.1: 64 mostly-empty blocks → 8). Leave None whenever the
    lookup side is corpus-sized — block count must scale with data.
    """
    union_schema = pa.schema(
        [
            pa.field("id_a", pa.int64()),
            pa.field("id_b", pa.int64()),
            pa.field("__side", pa.int8()),  # 0 = a-side, 1 = b-side, 2 = lookup
            pa.field("__key", pa.int64()),
            pa.field("__sh", value_type),
            pa.field("__bucket", pa.int32()),
            pa.field("__pb", pa.int32()),
        ]
    )
    mid_schema = pa.schema(
        [
            pa.field("id_a", pa.int64()),
            pa.field("id_b", pa.int64()),
            pa.field("__side", pa.int8()),
            pa.field("__sh", value_type),
            pa.field("__pb", pa.int32()),
        ]
    )
    out_schema = pa.schema(
        [
            pa.field("id_a", pa.int64()),
            pa.field("id_b", pa.int64()),
            pa.field(out_a, value_type),
            pa.field(out_b, value_type),
        ]
    )

    def _aligned(b: pa.Table, target: pa.Schema) -> pa.Table:
        cols = []
        for f in target:
            if f.name in b.column_names:
                cols.append(pc.cast(b.column(f.name), f.type))
            else:
                cols.append(pa.nulls(len(b), f.type))
        return pa.Table.from_arrays(cols, schema=target)

    def _key_bucket(k: np.ndarray) -> np.ndarray:
        h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((h >> np.uint64(17)) % np.uint64(n_buckets)).astype(np.int32)

    def _pair_bucket(ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
        h = (
            ia.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + ib.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        return ((h >> np.uint64(13)) % np.uint64(n_buckets)).astype(np.int32)

    def explode(b: pa.Table) -> pa.Table:
        ia = pc.cast(b.column("id_a"), pa.int64()).to_numpy(zero_copy_only=False)
        ib = pc.cast(b.column("id_b"), pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ia)
        pb = _pair_bucket(ia, ib)
        t = pa.table(
            {
                "id_a": pa.array(np.concatenate([ia, ia])),
                "id_b": pa.array(np.concatenate([ib, ib])),
                "__side": pa.array(
                    np.repeat(np.array([0, 1], np.int8), n)
                ),
                "__key": pa.array(np.concatenate([ia, ib])),
                "__bucket": pa.array(
                    np.concatenate([_key_bucket(ia), _key_bucket(ib)])
                ),
                "__pb": pa.array(np.concatenate([pb, pb])),
            }
        )
        return _aligned(t, union_schema)

    def tag_lookup(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "__key": pc.cast(b.column(id_col), pa.int64()),
                "__sh": pc.cast(b.column(value_col), value_type),
            }
        )
        key = t.column("__key").to_numpy(zero_copy_only=False)
        t = t.append_column("__bucket", pa.array(_key_bucket(key)))
        t = t.append_column("__side", pa.array(np.full(len(t), 2, np.int8)))
        return _aligned(t, union_schema)

    both = pairs_ds.map_batches(explode, batch_format="pyarrow").union(
        lookup_ds.map_batches(tag_lookup, batch_format="pyarrow")
    )
    if num_blocks is not None:
        both = both.repartition(num_blocks)

    def per_key_bucket(group: pa.Table) -> pa.Table:
        smask = pc.equal(group.column("__side"), 2)
        srows = group.filter(smask)
        prows = group.filter(pc.invert(smask))
        skeys = srows.column("__key")
        if isinstance(skeys, pa.ChunkedArray):
            skeys = skeys.combine_chunks()
        svals = srows.column("__sh")
        if isinstance(svals, pa.ChunkedArray):
            svals = svals.combine_chunks()
        if len(srows):
            idx = pc.index_in(prows.column("__key"), value_set=skeys)
            sh = svals.take(idx)
        else:
            sh = pa.nulls(len(prows), value_type)
        out = pa.table(
            {
                "id_a": prows.column("id_a"),
                "id_b": prows.column("id_b"),
                "__side": prows.column("__side"),
                "__sh": sh,
                "__pb": prows.column("__pb"),
            }
        )
        return _aligned(out, mid_schema)

    mid = both.groupby("__bucket").map_groups(
        per_key_bucket, batch_format="pyarrow"
    )

    def per_pair_bucket(group: pa.Table) -> pa.Table:
        ia = group.column("id_a").to_numpy(zero_copy_only=False)
        ib = group.column("id_b").to_numpy(zero_copy_only=False)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        sh = group.column("__sh")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        # run-based pairing: sort by (pair, side); duplicates of a pair
        # form one side-0 run then one side-1 run — take each run's
        # first row, so dup pairs collapse to a single output row
        order = np.lexsort((side, ib, ia))
        ia_s, ib_s, sd_s = ia[order], ib[order], side[order]
        new_run = np.ones(len(order), dtype=bool)
        new_run[1:] = (
            (ia_s[1:] != ia_s[:-1])
            | (ib_s[1:] != ib_s[:-1])
            | (sd_s[1:] != sd_s[:-1])
        )
        firsts = np.flatnonzero(new_run)
        if len(firsts) % 2:
            raise ValueError(
                "attach_pair_lookup: a pair is missing one side's "
                "exploded row — corrupted shuffle input"
            )
        ev, od = firsts[0::2], firsts[1::2]
        if not (
            np.array_equal(ia_s[ev], ia_s[od])
            and np.array_equal(ib_s[ev], ib_s[od])
            and (sd_s[ev] == 0).all()
            and (sd_s[od] == 1).all()
        ):
            raise ValueError(
                "attach_pair_lookup: pair sides failed to pair up — "
                "corrupted shuffle input"
            )
        out = pa.table(
            {
                "id_a": pa.array(ia_s[ev], pa.int64()),
                "id_b": pa.array(ib_s[ev], pa.int64()),
                out_a: sh.take(pa.array(order[ev], pa.int64())),
                out_b: sh.take(pa.array(order[od], pa.int64())),
            }
        )
        return _aligned(out, out_schema)

    return mid.groupby("__pb").map_groups(
        per_pair_bucket, batch_format="pyarrow"
    )


def bloom_id_prefilter(ds, cand, *, id_col: str, fpr: float = 1e-3,
                       n_expected: int | None = None,
                       stats_out: dict | None = None):
    """Keep only rows of ``ds`` whose ``id_col`` PROBABLY appears as
    id_a/id_b in the candidate-pair dataset ``cand`` — the bounded
    replacement for the round-3 driver-set prefilter (r3 verdict #2):
    no ``set()`` over candidate ids ever touches the driver.

    The Bloom bits are built DISTRIBUTED from the candidate ids (the
    sharded ``build_from_dataset``: narrow (shard, h1, h2) groupby,
    per-task allocation bounded by m/n_shards, driver pastes n_shards
    slices) and broadcast once — ~1.8 bytes/id at fpr 1e-3 vs ~30+ GB
    of driver heap for a Python set of 10^9 ids. No false negatives,
    so downstream output is EXACT: a false positive only lets one
    unreferenced lookup row ride the attach shuffle, where it matches
    no pair and is dropped — cost fpr x |ds| extra narrow rows, never
    a wrong answer.
    """
    import ray

    from .bloom import SMALL_BUILD_MAX_KEYS, Bloom, build_from_dataset

    def pair_ids(b: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy: a null-bearing int64 column
        # coerces to float64, whose hashes diverge from the int64 fast
        # path (build/probe mismatch = silent false negatives)
        a = np.concatenate([
            pc.drop_null(pc.cast(b.column("id_a"), pa.int64())).to_numpy(
                zero_copy_only=False),
            pc.drop_null(pc.cast(b.column("id_b"), pa.int64())).to_numpy(
                zero_copy_only=False),
        ])
        return pa.table({"key": pa.array(a, pa.int64())})

    keys = cand.map_batches(pair_ids, batch_format="pyarrow")
    # Sizing must use the DISTINCT id count, not raw rows — raw band
    # collisions repeat a pair up to `bands` times (oversizing the
    # broadcast bits ~bands x at 10^9 ids), while assuming every pair
    # repeats in EVERY band undersizes up to bands x, saturating the
    # filter (fpr -> 1: the prefilter silently stops pruning; measured
    # as a 2-4x wall regression on dedup_verified at sf0.1).
    if n_expected is None and 2 * cand.count() <= SMALL_BUILD_MAX_KEYS:
        # small side (raw rows bound the distinct count): ONE streaming
        # pass collects the pre-hashed pairs (<= 16 MB at the
        # threshold), sizes EXACTLY on unique h1, then bulk-adds
        from .bloom import _hash2, sharded_params

        hs = [
            _hash2(blk.column("key").to_numpy(zero_copy_only=False))
            for blk in keys.iter_batches(batch_format="pyarrow")
            if blk.num_rows
        ]
        h1 = (np.concatenate([a for a, _ in hs]) if hs
              else np.zeros(0, np.uint64))
        h2 = (np.concatenate([b for _, b in hs]) if hs
              else np.zeros(0, np.uint64))
        n_distinct = int(len(np.unique(h1)))
        if stats_out is not None:
            # exact (up to 64-bit hash collisions) distinct-id count —
            # callers reuse it (saturation guard) instead of paying a
            # second pass over the candidate table
            stats_out["distinct_ids"] = n_distinct
        m, k, shards = sharded_params(max(16, n_distinct), fpr)
        bl = Bloom(m, k, shards=shards)
        bl._add_hashed(h1, h2)
    else:
        if n_expected is None:
            # scale path: HLL distinct-id estimate (one streaming pass,
            # constant-size driver state), then the sharded distributed
            # build. ±2% HLL error is swallowed by the 1.3 margin;
            # sizing never affects correctness, only fpr.
            from .sketch import approx_distinct

            est = approx_distinct(
                keys,
                lambda b: pc.cast(b.column("key"), pa.string()).to_pylist(),
            )
            if stats_out is not None:
                stats_out["distinct_ids"] = int(est)
            n_expected = max(16, int(1.3 * est))
        bl = build_from_dataset(
            keys, key_col="key", n_expected=n_expected, fpr=fpr
        )
    m, k, shards = bl.m, bl.k, bl.shards
    bits_ref = ray.put(bl.bits)

    def probe(b: pa.Table) -> pa.Table:
        blm = Bloom(m, k, ray.get(bits_ref), shards=shards)  # zero-copy
        col = pc.cast(b.column(id_col), pa.int64())
        if col.null_count:
            # null ids can't be referenced by any (int64) pair — drop
            # them here rather than let the float64 coercion poison
            # the hashes of the whole batch
            b = b.filter(pc.is_valid(col))
            col = pc.drop_null(col)
        vals = col.to_numpy(zero_copy_only=False)
        return b.filter(pa.array(blm.contains(vals)))

    return ds.map_batches(probe, batch_format="pyarrow")


def _attach_sets(pairs_ds, sets_ds, *, key_col: str, out_col: str,
                 id_col: str, n_buckets: int, pairs_schema=None):
    """Shingle-set specialization of ``attach_column_lookup``."""
    return attach_column_lookup(
        pairs_ds, sets_ds, key_col=key_col, out_col=out_col, id_col=id_col,
        value_col="sh", value_type=pa.list_(pa.string()), n_buckets=n_buckets,
        pairs_schema=pairs_schema,
    )


def verified_jaccard_pairs(ds, *, k: int = 3, num_perm: int = 64,
                           bands: int = 32, id_col: str = "doc_id",
                           n_buckets: int = 32, candidates=None,
                           prefilter: bool = True,
                           hot_run_cap: int = HOT_RUN_CAP,
                           hot_mode: str = "error",
                           saturation_warn_factor: float = 256.0):
    """The scale path for near-dup dedup: LSH candidate pairs verified
    with EXACT shingle Jaccard — same output contract as
    ``ngram_jaccard_pairs`` (id_a, id_b, inter, uni with
    2·inter ≥ uni), but no O(n²) scan and no whole-corpus broadcast.

    Stages: (1) ``lsh_candidate_pairs`` (band-bucket groupby of narrow
    triples); (2) optional semi-join prefilter so only shingle sets of
    ids that appear in some candidate move any further (candidate ids
    are the near-dup subset — far smaller than the corpus — and are
    broadcast as one set via ray.put); (3) ONE exploded-pair lookup
    shuffle (``attach_pair_lookup``) brings both sides' shingle sets
    onto each pair — the set table crosses the wire once, not once per
    side; (4) vectorized exact inter/uni + integer threshold. Every
    shuffle key is a uniform hash; nothing corpus-sized touches the
    driver.

    Equality with the exact all-pairs oracle holds when LSH recall is 1
    at the threshold. With r = num_perm/bands hashes per band, a pair at
    Jaccard J is missed with probability (1−J^r)^bands — at the default
    r=2, bands=32 a J=0.9 pair is missed w.p. ~6e-23, so on corpora
    whose true dups are high-J (any realistic near-dup corpus) the
    output is bit-equal to ``ngram_jaccard_pairs`` / the SQL oracle;
    otherwise it is the documented recall-bounded subset.

    ``hot_mode`` defaults to ``"error"`` here — this operator's
    contract is the exact pairs LIST, which star emission would
    silently subset above the cap (see ``_bucket_pairs``); cluster
    consumers (fuzzy-corpus dedup, components) pass ``"star"``.
    ``saturation_warn_factor``: after the candidate table materializes,
    a RuntimeWarning fires when its row count exceeds this multiple of
    the (HLL-estimated) distinct candidate ids — saturated LSH (bands
    too easy for the corpus) balloons the object store quietly
    otherwise (r4 verdict #5).
    """
    if candidates is None:
        # raw per-band collisions — duplicate pairs are fine (the
        # attach regroup dedups them), so the distinct groupby that
        # lsh_candidate_pairs would run is skipped: one less all-to-all
        # (the prefilter sizes its Bloom on an HLL distinct-id estimate,
        # so the duplicate rows don't inflate the broadcast bits)
        candidates = lsh_raw_band_pairs(
            ds, num_perm=num_perm, bands=bands, k=k, id_col=id_col,
            hot_run_cap=hot_run_cap, hot_mode=hot_mode,
        )

    def drop_n(b: pa.Table) -> pa.Table:
        return b.select(["id_a", "id_b"])

    cand = candidates.map_batches(drop_n, batch_format="pyarrow").materialize()

    n_cand = cand.count()

    src = ds
    prefilter_stats: dict = {}
    if prefilter:
        # bounded Bloom prefilter over the candidate-id DATASET — no
        # driver-side set, no sorted-ndarray broadcast (r3 verdict #2);
        # false positives are unreferenced sets that match no pair in
        # the attach and drop out, so the output stays exact. The probe
        # runs BEFORE shingling (they fuse into one map stage), so the
        # shingle build — the chain's widest per-row compute — runs on
        # the candidate-id survivors only, not the whole corpus
        # (r4 verdict #6). The build's distinct-id count doubles as the
        # saturation guard's estimate below — one pass, two uses.
        src = bloom_id_prefilter(
            ds, cand, id_col=id_col, stats_out=prefilter_stats
        )

    if n_cand >= 4096:
        # saturation guard: with star capping the candidate table is
        # bounded, but a mis-parameterized LSH (bands matching random
        # docs) still multiplies rows per id. One ratio check against
        # the distinct-id count — reused from the prefilter build when
        # it ran (zero extra passes); otherwise adaptive like the Bloom
        # build: below 5M rows the driver streams the two int64 columns
        # through a vectorized HLL (no extra Ray job — a fixed ~0.7s
        # barrier a small pair table should never pay); above,
        # constant-size distributed partials.
        est_ids = prefilter_stats.get("distinct_ids")
        if est_ids is None:
            import pandas as pd

            from .sketch import HyperLogLog, approx_distinct

            if n_cand <= 5_000_000:
                hll = HyperLogLog(12)
                for blk in cand.iter_batches(batch_format="pyarrow"):
                    if blk.num_rows == 0:
                        continue
                    ids = np.concatenate([
                        pc.cast(blk.column("id_a"), pa.int64()).to_numpy(
                            zero_copy_only=False),
                        pc.cast(blk.column("id_b"), pa.int64()).to_numpy(
                            zero_copy_only=False),
                    ])
                    hll.add_hashed(
                        pd.util.hash_array(ids, categorize=False)
                    )
                est_ids = hll.estimate()
            else:
                est_ids = approx_distinct(
                    cand,
                    lambda b: pc.cast(
                        pa.concat_arrays([
                            pc.cast(b.column("id_a"), pa.int64())
                            .combine_chunks(),
                            pc.cast(b.column("id_b"), pa.int64())
                            .combine_chunks(),
                        ]),
                        pa.string(),
                    ).to_pylist(),
                )
        est_ids = max(1, est_ids)
        if n_cand > saturation_warn_factor * est_ids:
            import warnings

            warnings.warn(
                f"verified_jaccard_pairs: candidate table has {n_cand} "
                f"rows for ~{est_ids} distinct ids "
                f"(> {saturation_warn_factor:g}x) — LSH looks SATURATED "
                "(bands collide on non-duplicates). Expect quadratic "
                "verify cost; raise rows-per-band (num_perm/bands) or "
                "lower bands for this corpus.",
                RuntimeWarning,
                stacklevel=2,
            )

    sets = shingle_sets(src, k=k, id_col=id_col)

    # one exploded-pair shuffle attaches BOTH sides' shingle sets —
    # the set table rides a single exchange (r2 verdict #3). With the
    # prefilter on, total attach rows are bounded by 4×|cand| plus
    # fpr·|corpus| Bloom false positives, so the block count scales
    # with the candidate table, not the corpus.
    nb = (
        max(4, min(4096, 4 * cand.count() // 8192 + 1))
        if prefilter else None
    )
    with_both = attach_pair_lookup(
        cand, sets, id_col=id_col, value_col="sh",
        value_type=pa.list_(pa.string()), out_a="sh_a", out_b="sh_b",
        n_buckets=n_buckets, num_blocks=nb,
    )

    empty_verify = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
        }
    )

    def verify(b: pa.Table) -> pa.Table:
        # vectorized exact Jaccard: shingle lists are DISTINCT per doc
        # (shingle_sets contract), so |A∩B| = |A| + |B| − distinct(A⧺B).
        # One factorize over the batch's flattened shingle strings, one
        # np.unique over (pair, code) keys — no per-row Python sets.
        rows = b.filter(
            pc.and_(pc.is_valid(b.column("sh_a")),
                    pc.is_valid(b.column("sh_b")))
        )  # dangling candidate ids (not in corpus) → dropped
        if len(rows) == 0:
            return empty_verify
        import pandas as pd

        sa = rows.column("sh_a")
        sb = rows.column("sh_b")
        if isinstance(sa, pa.ChunkedArray):
            sa = sa.combine_chunks()
        if isinstance(sb, pa.ChunkedArray):
            sb = sb.combine_chunks()
        la = pc.list_value_length(sa).to_numpy(zero_copy_only=False).astype(np.int64)
        lb = pc.list_value_length(sb).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.concatenate(
            [
                pc.list_flatten(sa).to_numpy(zero_copy_only=False),
                pc.list_flatten(sb).to_numpy(zero_copy_only=False),
            ]
        )
        parents = np.concatenate(
            [
                pc.list_parent_indices(sa).to_numpy(zero_copy_only=False),
                pc.list_parent_indices(sb).to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        codes, uniques = pd.factorize(flat)
        width = np.int64(len(uniques) + 1)
        distinct_keys = np.unique(parents * width + codes)
        uni = np.bincount(
            (distinct_keys // width).astype(np.int64), minlength=len(rows)
        ).astype(np.int64)
        inter = la + lb - uni
        # integer-only threshold (2*inter >= uni ⟺ J >= 0.5), same as
        # ngram_jaccard_pairs / the SQL oracle
        keep = (inter > 0) & (uni > 0) & (2 * inter >= uni)
        return pa.table(
            {
                "id_a": pa.array(
                    rows.column("id_a").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "id_b": pa.array(
                    rows.column("id_b").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "inter": pa.array(inter[keep], pa.int64()),
                "uni": pa.array(uni[keep], pa.int64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


def simhash_candidate_pairs(ds, id_col: str = "doc_id", n_rotations: int = 4,
                            max_hamming: int = 3,
                            hot_run_cap: int = HOT_RUN_CAP,
                            hot_mode: str = "star"):
    """SimHash near-dup candidates: bucket by 16-bit prefixes of several
    bit-rotations of the 64-bit simhash (near-dups with <= ~3 differing
    bits collide in at least one rotated prefix with high probability),
    then verify hamming distance exactly within each bucket.

    Shuffle moves only (rotation, prefix, id, simhash) rows. Returns
    (id_a, id_b, hamming) distinct pairs with hamming <= max_hamming.

    Hot prefix buckets (d identical docs → identical simhash → same
    prefix in EVERY rotation → C(d,2)·rotations pair rows) follow the
    same bounded-emission rule as ``_bucket_pairs``: runs above
    ``hot_run_cap`` emit star pairs vs the run minimum (hamming still
    verified exactly per emitted pair) or raise under ``"error"``.
    """
    if hot_mode not in ("star", "error", "pairwise"):
        raise ValueError(
            f"simhash_candidate_pairs: unknown hot_mode {hot_mode!r}"
        )
    import pyarrow as pa

    sigs = ds.map_batches(simhash_batch, fn_kwargs={"id_col": id_col},
                          batch_format="pyarrow")

    def to_buckets(batch: pa.Table) -> pa.Table:
        # vectorized bit-rotations: one numpy pass per rotation over the
        # uint64 (two's-complement) view of the whole batch
        n = len(batch)
        sims_col = batch.column("simhash")
        if isinstance(sims_col, pa.ChunkedArray):
            sims_col = sims_col.combine_chunks()
        u = sims_col.to_numpy(zero_copy_only=False).astype(np.int64).view(
            np.uint64
        )
        step = 64 // n_rotations
        pref = np.empty((n_rotations, n), dtype=np.int64)
        for r in range(n_rotations):
            shift = np.uint64(r * step)
            rotated = (
                u if r == 0
                else (u << shift) | (u >> (np.uint64(64) - shift))
            )
            pref[r] = (rotated >> np.uint64(48)).astype(np.int64)
        ids = pc.cast(batch.column(id_col), pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        tile = pa.array(np.tile(np.arange(n), n_rotations))
        return pa.table(
            {
                "rot": pa.array(
                    np.repeat(np.arange(n_rotations, dtype=np.int32), n)
                ),
                "prefix": pa.array(pref.reshape(-1)),
                id_col: ids.take(tile),
                "simhash": sims_col.take(tile),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    # whole (rot, prefix) buckets co-locate by hashed shard — one
    # vectorized pass per shard group instead of a Python callback per
    # mostly-singleton bucket (see _bucket_pairs); hamming verification
    # runs only inside colliding runs
    n_groups = 256

    def add_shard(b: pa.Table) -> pa.Table:
        rot = b.column("rot").to_numpy(zero_copy_only=False).astype(np.int64)
        pref = b.column("prefix").to_numpy(zero_copy_only=False).astype(np.int64)
        combo = pref * np.int64(16) + rot
        shard = (
            (combo.astype(np.uint64) * np.uint64(2654435761)) >> np.uint64(13)
        ).astype(np.int64) % n_groups
        return pa.table(
            {
                "combo": pa.array(combo, pa.int64()),
                id_col: b.column(id_col),
                "simhash": b.column("simhash"),
                "__shard": pa.array(shard, pa.int32()),
            }
        )

    sharded = buckets.map_batches(add_shard, batch_format="pyarrow")

    def pairs_in_shard(group: pa.Table) -> pa.Table:
        combo = group.column("combo").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sims = group.column("simhash").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, combo))
        c, i, s = combo[order], ids[order], sims[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        lengths = np.diff(np.append(starts, len(c)))
        a_out, b_out, h_out = [], [], []

        def emit(xa: int, xb: int, sa: int, sb: int) -> None:
            h = int(bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1"))
            if h <= max_hamming:
                a_out.append(xa)
                b_out.append(xb)
                h_out.append(h)

        for st, ln in zip(starts[lengths > 1], lengths[lengths > 1]):
            mi, ms = i[st : st + ln], s[st : st + ln]
            if ln > hot_run_cap and hot_mode != "pairwise":
                if hot_mode == "error":
                    raise ValueError(
                        f"simhash_candidate_pairs: hot prefix bucket of "
                        f"{ln} ids exceeds hot_run_cap={hot_run_cap}; "
                        "raise the cap or use hot_mode='star'"
                    )
                m0, s0 = int(mi[0]), int(ms[0])
                for x in range(1, ln):
                    if mi[x] == m0:
                        continue
                    emit(m0, int(mi[x]), s0, int(ms[x]))
                continue
            for x in range(ln):
                for y in range(x + 1, ln):
                    if mi[x] == mi[y]:
                        continue
                    emit(int(mi[x]), int(mi[y]), int(ms[x]), int(ms[y]))
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(h_out, pa.int64()),
            }
        )

    pairs = sharded.groupby("__shard").map_groups(
        pairs_in_shard, batch_format="pyarrow"
    )
    # distinct across rotations
    agg = pairs.groupby(["id_a", "id_b"]).min("hamming")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["id_a", "id_b", "hamming"])

    return agg.map_batches(rename, batch_format="pyarrow")


def _sym_edges(pairs_ds, id_a: str, id_b: str):
    """Symmetric (node, nbr) edge list from directed pairs."""

    def sym(b: pa.Table) -> pa.Table:
        a, bb = b.column(id_a), b.column(id_b)
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [pc.cast(a, pa.int64()).combine_chunks(),
                     pc.cast(bb, pa.int64()).combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [pc.cast(bb, pa.int64()).combine_chunks(),
                     pc.cast(a, pa.int64()).combine_chunks()]
                ),
            }
        )

    return pairs_ds.map_batches(sym, batch_format="pyarrow")


def connected_components_distributed(pairs_ds, *, id_a: str = "id_a",
                                     id_b: str = "id_b",
                                     max_iters: int | None = None,
                                     num_partitions: int = 16):
    """Connected components with the label table kept DISTRIBUTED (the
    scale form of ``connected_components`` — r01 verdict #6): labels are
    a Dataset, propagation is a hash-partitioned join per round, and the
    driver only ever sees one scalar per round.

    Round: (1) join edges(nbr) ⋈ labels(node) to pull each neighbor's
    label onto the edge, union with the nodes' own labels,
    groupby(node).min; (2) POINTER DOUBLING — join the stepped labels
    with themselves (label ⋈ node) so every node jumps straight to its
    label's label. One-hop propagation alone needs diameter-many rounds
    (a 10^6-long template chain = 10^6 shuffles); with the doubling
    step convergence is O(log diameter). Convergence check without
    materializing differences: labels only ever DECREASE, so
    sum(label) is unchanged iff no label changed — one scalar
    aggregate per round. ``max_iters`` raises rather than returning
    partial labels.

    The propagation join is the explicit bucketed hash join
    (join.partitioned_hash_join), not Dataset.join: Ray 2.49's native
    hash-join aggregator raises ArrowInvalid when a right-side hash
    partition receives only schema-less empty blocks, which iterated
    small label tables hit routinely.

    Returns a Dataset (doc_id, cluster_id), cluster_id = component min.
    """
    from .join import partitioned_hash_join

    out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    edges = _sym_edges(pairs_ds, id_a, id_b).materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(out_schema.empty_table())

    def init(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lnode": b.column("node"),
                "label": pc.min_element_wise(
                    b.column("node"), b.column("min(nbr)")
                ),
            }
        )

    labels = edges.groupby("node").min("nbr").map_batches(
        init, batch_format="pyarrow"
    ).materialize()
    prev_sum = labels.sum("label")

    it = 0
    while True:
        it += 1
        if max_iters is not None and it > max_iters:
            raise RuntimeError(
                f"connected_components_distributed: no convergence after "
                f"{max_iters} rounds"
            )
        prop = partitioned_hash_join(
            edges, labels, left_key="nbr", right_key="lnode",
            n_buckets=num_partitions,
        )
        contrib = prop.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "label": b.column("label")}
            ),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda b: pa.table(
                {"node": b.column("lnode"), "label": b.column("label")}
            ),
            batch_format="pyarrow",
        )
        stepped = (
            contrib.union(own)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda b: pa.table(
                    {"lnode": b.column("node"), "label": b.column("min(label)")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # pointer doubling: label(x) ← label(label(x)). Every label IS a
        # node of the same component (inner join always matches), and
        # stepped labels satisfy label(y) <= y, so the jump only ever
        # lowers — no min needed.
        as_l2 = stepped.map_batches(
            lambda b: pa.table(
                {"l2node": b.column("lnode"), "l2label": b.column("label")}
            ),
            batch_format="pyarrow",
        )
        shortcut = partitioned_hash_join(
            stepped, as_l2, left_key="label", right_key="l2node",
            n_buckets=num_partitions,
        )
        labels = shortcut.map_batches(
            lambda b: pa.table(
                {"lnode": b.column("lnode"), "label": b.column("l2label")}
            ),
            batch_format="pyarrow",
        ).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("lnode"), "cluster_id": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def connected_components(pairs_ds, *, id_a: str = "id_a", id_b: str = "id_b",
                         max_iters: int | None = None):
    """Cluster candidate/duplicate pairs into connected components:
    (doc_id, cluster_id) with cluster_id = min doc id in the component.

    Runs to convergence (min-label propagation advances one hop per
    iteration, so a component of diameter D needs D rounds — long
    near-dup chains from templated pages are realistic). ``max_iters``
    is an optional safety valve that RAISES if hit before convergence;
    it never silently returns partial labels.

    Distributed min-label propagation: symmetric edge list → per-node
    min-neighbor-label via groupby, iterated to fixpoint. The label
    table (one row per node APPEARING IN PAIRS — tiny relative to the
    corpus even at 10^12 docs, because pair nodes are the near-dup
    subset) is broadcast per iteration; edges stay distributed. If the
    label table itself outgrew memory, the same loop runs with the
    broadcast replaced by the bucketed hash join (stages/join.py).
    """
    import ray
    import pyarrow as pa
    import pyarrow.compute as pc

    def sym(b: pa.Table) -> pa.Table:
        a, bb = b.column(id_a), b.column(id_b)
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks(), bb.combine_chunks()]),
                "nbr": pa.concat_arrays([bb.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()

    # initial labels: min(node, min neighbor)
    lab = edges.groupby("node").min("nbr")
    labels = {
        r["node"]: min(r["node"], r["min(nbr)"]) for r in lab.take_all()
    }

    it = 0
    while True:
        it += 1
        if max_iters is not None and it > max_iters:
            raise RuntimeError(
                f"connected_components: no convergence after {max_iters} "
                "iterations (component diameter exceeds the cap)"
            )
        ref = ray.put(labels)

        def relabel(b: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            nbr_lab = [lut[v] for v in b.column("nbr").to_pylist()]
            return pa.table(
                {"node": b.column("node"), "nbr_label": pa.array(nbr_lab, pa.int64())}
            )

        cand = (
            edges.map_batches(relabel, batch_format="pyarrow")
            .groupby("node")
            .min("nbr_label")
            .take_all()
        )
        changed = 0
        for r in cand:
            n, c = r["node"], r["min(nbr_label)"]
            if c < labels[n]:
                labels[n] = c
                changed += 1
        if changed == 0:
            break

    out = pa.table(
        {
            "doc_id": pa.array(sorted(labels), pa.int64()),
            "cluster_id": pa.array(
                [labels[k] for k in sorted(labels)], pa.int64()
            ),
        }
    )
    return out


def per_key_cap(ds, *, key: str = "host", k: int = 5, order_col: str = "url"):
    """Deterministic per-key row cap — the "at most N pages per domain"
    stage every CC pipeline runs against Zipf-skewed hosts. Keeps the k
    rows with the smallest md5(order_col) per key: a pure function of
    content, so reruns and repartitionings keep the same rows.

    Scale shape: each batch PRE-TRUNCATES to k rows per key (combiner —
    a 10⁹-page host sends k rows per block, not 10⁹, into the shuffle),
    then one groupby(key) truncates globally with a vectorized lexsort.
    """

    def add_dig(b: pa.Table) -> pa.Table:
        digs = pa.array(
            [hashlib.md5(str(v).encode("utf-8")).hexdigest()
             for v in b.column(order_col).to_pylist()],
            pa.string(),
        )
        return b.append_column("__dig", digs)

    def truncate(b: pa.Table) -> pa.Table:
        # null keys group under "" instead of crashing the lexsort
        # (poison-row principle); digs never hold None (md5 of "None")
        keys = np.asarray(
            [v if v is not None else "" for v in b.column(key).to_pylist()],
            dtype=object,
        )
        digs = np.asarray(b.column("__dig").to_pylist(), dtype=object)
        order = np.lexsort((digs, keys))
        k_sorted = keys[order]
        # rank within key = position since the key's first sorted row
        starts = np.zeros(len(order), dtype=np.int64)
        new_key = np.ones(len(order), dtype=bool)
        new_key[1:] = k_sorted[1:] != k_sorted[:-1]
        starts[new_key] = np.arange(len(order))[new_key]
        run_start = np.maximum.accumulate(starts)
        rank = np.arange(len(order)) - run_start
        return b.take(pa.array(order[rank < k], pa.int64()))

    pre = ds.map_batches(
        lambda b: truncate(add_dig(b)), batch_format="pyarrow"
    )

    def per_key(group: pa.Table) -> pa.Table:
        return truncate(group).drop_columns(["__dig"])

    return pre.groupby(key).map_groups(per_key, batch_format="pyarrow")


def hash_split(ds, *, col: str = "url",
               boundaries: tuple[str, str] = ("e6666666", "f3333333")):
    """Deterministic train/val/test assignment by content hash: rows
    split by where md5(col)'s 8-hex prefix falls relative to the two
    boundaries (defaults ≈ 90/5/5). The standard leakage-safe dataset
    split: assignment is a pure function of the key — stable across
    runs, machines, partitionings, and corpus growth (a key added
    later never moves an existing key's split).

    Appends a ``split`` column (train|val|test).
    """
    lo, hi = boundaries

    def assign(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_pylist()
        labels = []
        for v in vals:
            d = hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8]
            labels.append("train" if d < lo else ("val" if d < hi else "test"))
        return b.append_column("split", pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
