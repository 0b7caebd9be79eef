"""DSIR-style data selection — importance resampling weights over
hashed unigram features (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", arXiv:2302.03169).

Every document in the RAW pool is scored by how much its hashed token
distribution resembles a TARGET (seed / high-quality) slice versus the
raw pool itself:

    weight(doc) = sum_tokens [ ln p_target(bucket(tok))
                               - ln p_raw(bucket(tok)) ]

with add-one-smoothed bucket counts and the constant normalization
totals dropped (they shift every token's term by the same constant, a
per-document length effect absorbed by ``avg_weight``).  Each token
therefore contributes an INTEGER fixed-point term

    floor(1e7 * ln(tc_b + 1)) - floor(1e7 * ln(rc_b + 1))

so per-document weights are order-free int64 sums — bit-identical
between numpy and the DuckDB oracle regardless of summation order
(same exactness contract as :mod:`gocrd_ray.stages.lm`; ``ln`` over
integer-valued doubles is the same libm call on both sides).

Buckets: the leading 3 hex chars of ``md5(token)`` → 4096 buckets,
mirrored as ``substr(md5(tok), 1, 3)`` in SQL.  The md5 is the
SQL-parity contract; it is computed once per DISTINCT token per batch
and memoized across batches inside the scoring actor.

Scale shape (10^12 docs): the two distribution passes move only
``(bucket, partial_count)`` rows — at most ``N_BUCKETS`` per input
batch — through one tiny groupby each; the resulting (4096,) int64
term vector is broadcast ONCE via ``ray.put``; scoring is a pure
streaming actor-pool map (``np.bincount`` per batch, no shuffle).
Three corpus-column scans total (target histogram, raw histogram, raw
scoring) are inherent to the method: the distributions must exist
before any document can be scored.  Nothing corpus-sized ever reaches
the driver — the histograms arrive pre-reduced to ≤4096 rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _fp_ln, _tokens

# 3 hex chars of md5(token) — mirrored as substr(md5(tok),1,3) in SQL.
N_BUCKETS = 4096


def _bucket_ids(flat: pa.Array, memo: dict) -> np.ndarray:
    """md5-hex[:3] bucket id of every token, hashing each DISTINCT
    token once (``np.unique`` folds the Zipf head, ``memo`` carries the
    vocabulary across batches inside an actor)."""
    vals = np.asarray(flat.to_pylist(), dtype=object)
    if len(vals) == 0:
        return np.zeros(0, dtype=np.int64)
    uniq, inv = np.unique(vals, return_inverse=True)
    tab = np.empty(len(uniq), dtype=np.int64)
    for j, tok in enumerate(uniq):
        b = memo.get(tok)
        if b is None:
            b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:3], 16)
            memo[tok] = b
        tab[j] = b
    return tab[inv]


def hashed_bucket_counts(ds, *, text_col: str = "text") -> np.ndarray:
    """Corpus histogram over the 4096 hashed-unigram buckets as a
    driver-side (N_BUCKETS,) int64 vector.  Each input block reduces
    to ≤4096 narrow ``(bucket, n)`` rows inside its map task; the
    driver streams those pre-reduced partials and merges with one
    vectorized add per block — the HLL-partial merge shape, no
    all-to-all.  (Deliberately not a Ray groupby: Ray 2.49 skips UDFs
    on empty input blocks and the schema-less placeholder bundles
    surface as bench-tail "RefBundle with a different schema"
    warnings downstream of the aggregate.)"""

    def partial(b: pa.Table) -> pa.Table:
        _, flat, _ = _tokens(b.column(text_col))
        idx = _bucket_ids(flat, {})
        cnt = np.bincount(idx, minlength=N_BUCKETS)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64), pa.int64()),
            "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
        })

    vec = np.zeros(N_BUCKETS, dtype=np.int64)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        if "bucket" not in b.column_names or b.num_rows == 0:
            continue
        # np.add.at, not fancy +=: iter_batches may concatenate several
        # blocks' partials, so a bucket can repeat WITHIN one batch
        np.add.at(
            vec,
            b.column("bucket").to_numpy(zero_copy_only=False),
            b.column("n").to_numpy(zero_copy_only=False),
        )
    return vec


def dsir_term_vector(target_counts: np.ndarray,
                     raw_counts: np.ndarray) -> np.ndarray:
    """Per-bucket fixed-point log-ratio terms (int64, length
    N_BUCKETS).  Buckets absent from both sides get term 0."""
    return _fp_ln(target_counts + 1) - _fp_ln(raw_counts + 1)


class DsirScorer:
    """Actor-pool scorer: fetches the broadcast term vector ONCE in
    ``__init__`` and memoizes token→bucket md5 across batches."""

    def __init__(self, term_ref, text_col: str, id_col: str):
        import ray

        self.term = ray.get(term_ref).astype(np.float64)
        self.text_col = text_col
        self.id_col = id_col
        self.memo: dict = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(b.column(self.text_col))
        idx = _bucket_ids(flat, self.memo)
        n = len(b)
        # int64 terms summed through float64 bincount: every value and
        # every partial sum is an integer far below 2^53 (|term| <
        # 1e7*ln(2^63) ≈ 4.4e8, tokens/doc bounded by block bytes), so
        # the accumulation is exact and the int64 cast lossless.
        n_tok = np.bincount(parents, minlength=n).astype(np.int64)
        w_fp = np.bincount(
            parents, weights=self.term[idx], minlength=n
        ).astype(np.int64)
        # every row has >= 1 token ('' tokenizes to ['']), so no /0
        avg = w_fp / (1e7 * n_tok)
        return pa.table({
            self.id_col: pc.cast(b.column(self.id_col), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "weight_fp": pa.array(w_fp, pa.int64()),
            "avg_weight": pa.array(avg, pa.float64()),
        })


def dsir_weights(raw_ds, target_ds, *, text_col: str = "text",
                 id_col: str = "doc_id", concurrency=(1, 8)):
    """Score every raw-pool document: returns a Dataset of
    ``(id_col, n_tokens, weight_fp, avg_weight)`` where ``weight_fp``
    is the order-free fixed-point importance weight and ``avg_weight =
    weight_fp / (1e7 * n_tokens)`` its length-normalized float view.
    Selection (top-k / threshold) composes downstream — e.g.
    :func:`gocrd_ray.stages.rank.global_rank` for an exact global
    top-k, or a pure threshold filter for streaming selection."""
    import ray

    tvec = hashed_bucket_counts(target_ds, text_col=text_col)
    rvec = hashed_bucket_counts(raw_ds, text_col=text_col)
    term_ref = ray.put(dsir_term_vector(tvec, rvec))
    return raw_ds.map_batches(
        DsirScorer,
        fn_constructor_args=(term_ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
