"""Naive-Bayes curated-vs-crawl quality classifier with the
Pareto-randomized keep rule (the GPT-3 appendix-A quality filter,
Brown et al. 2020, arXiv:2005.14165 §A; same family as the
WebText/CommonCrawl classifier in CCNet and RedPajama-v2).

Train: two multinomial class histograms over hashed unigram buckets
(the :mod:`gocrd_ray.stages.dsir` 4096-bucket md5 feature space) — one
from a POSITIVE (curated / high-quality) slice, one from a NEGATIVE
(raw crawl) slice.  Score: per-document add-one-smoothed log-odds

    score(doc) = ln(n_pos_docs) - ln(n_neg_docs)
               + sum_tokens [ ln((pos_b+1)/(Npos+B)) - ln((neg_b+1)/(Nneg+B)) ]

with every ln over an integer-valued double, so each token contributes
an INTEGER fixed-point term (floor(1e7*ln(.)) differences — the lm.py
exactness contract) and per-document ``score_fp`` is an order-free
int64 sum, bit-identical between numpy and the DuckDB oracle.

Keep rule (GPT-3 §A): a document with quality score s ∈ [0, 1] is kept
iff

    s > 1 - x,   x ~ Pareto(alpha) i.e. x = u^(-1/alpha) - 1

with ``u`` a DETERMINISTIC per-document uniform — the first 8 hex
chars of md5(doc_id) mapped to (0, 1] — so reruns and repartitionings
agree, and the rule itself is SQL-mirrorable.  GPT-3 takes s from a
logistic model; the logistic squash needs libm ``exp``, which is NOT
part of the cross-engine exactness contract (only ``ln`` over
integer-valued doubles is), so s here is the softsign calibration of
the average per-token log-odds a = score_fp / (1e7 * n_tokens):

    s = 0.5 + a / (2 * (1 + |a|))        (same sigmoid family, pure
                                          +,/,abs — exactly mirrorable)

and to avoid libm ``pow`` the Pareto comparison is transformed to
multiplication only:

    keep  <=>  u * t^alpha < 1,          t = 2 - s ∈ (1, 2)

(s > 1 - (u^(-1/a) - 1) <=> u^(-1/a) > t <=> u < t^-a <=> u*t^a < 1).
``t^alpha`` is evaluated as an explicit squaring chain (t2=t*t,
t4=t2*t2, t8=t4*t4, t9=t*t8 for alpha=9) and ``u`` is an exact dyadic
rational, so every float op is a single IEEE-754 operation mirrored
verbatim in SQL — bit-identical keep decisions.

Scale shape (10^12 docs): two histogram passes move only
``(bucket, n)`` partials (≤4096 narrow rows per block, driver merges
two (4096,) int vectors); the term vector + prior broadcast ONCE via
``ray.put``; scoring + the keep decision are one streaming actor-pool
map over the corpus — ZERO shuffle.  Three corpus-column scans total
(pos histogram over the pos slice, neg histogram over the neg slice,
one scoring scan), inherent to training-then-scoring.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsir import N_BUCKETS, _bucket_ids, hashed_bucket_counts
from .lm import _fp_ln, _tokens

PARETO_ALPHA = 9  # GPT-3 appendix A: np.random.pareto(9)


def nb_model(pos_counts: np.ndarray, neg_counts: np.ndarray,
             n_pos_docs: int, n_neg_docs: int):
    """(term_vector int64[N_BUCKETS], prior_fp int) — the per-bucket
    smoothed log-odds terms and the class-prior term."""
    if n_pos_docs <= 0 or n_neg_docs <= 0:
        raise ValueError(
            "nb_model: both classes need at least one document "
            f"(got n_pos={n_pos_docs}, n_neg={n_neg_docs})"
        )
    pos_total = int(pos_counts.sum())
    neg_total = int(neg_counts.sum())
    norm = int(
        _fp_ln(np.array([pos_total + N_BUCKETS], dtype=np.int64))[0]
        - _fp_ln(np.array([neg_total + N_BUCKETS], dtype=np.int64))[0]
    )
    term = _fp_ln(pos_counts + 1) - _fp_ln(neg_counts + 1) - np.int64(norm)
    prior_fp = int(
        _fp_ln(np.array([n_pos_docs], dtype=np.int64))[0]
        - _fp_ln(np.array([n_neg_docs], dtype=np.int64))[0]
    )
    return term, prior_fp


def _pareto_keep(score_fp: np.ndarray, n_tok: np.ndarray,
                 u: np.ndarray, alpha: int) -> np.ndarray:
    """Vectorized keep decision; every float op is one IEEE operation
    in a fixed tree shape, mirrored verbatim by the SQL oracle."""
    a = score_fp / (1e7 * n_tok)
    s = 0.5 + a / (2.0 * (1.0 + np.abs(a)))
    t = 2.0 - s
    p = np.ones_like(t)
    # explicit square-and-multiply chain: same operation tree in SQL
    base = t.copy()
    e = alpha
    while e > 0:
        if e & 1:
            p = p * base
        e >>= 1
        if e:
            base = base * base
    return u * p < 1.0


class NbScorer:
    """Actor-pool scorer: fetches the broadcast (term, prior) ONCE in
    ``__init__``, memoizes token→bucket md5 across batches, and fuses
    the Pareto keep decision into the scoring pass."""

    def __init__(self, model_ref, text_col: str, id_col: str,
                 alpha: int = PARETO_ALPHA):
        import ray

        term, prior = ray.get(model_ref)
        self.term = term.astype(np.float64)
        self.prior = np.int64(prior)
        self.text_col = text_col
        self.id_col = id_col
        self.alpha = alpha
        self.memo: dict = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(b.column(self.text_col))
        idx = _bucket_ids(flat, self.memo)
        n = len(b)
        n_tok = np.bincount(parents, minlength=n).astype(np.int64)
        # int64 terms summed through float64 bincount: every partial
        # sum is an integer far below 2^53 (see dsir.DsirScorer), so
        # the accumulation is exact and the cast lossless.
        s_fp = np.bincount(
            parents, weights=self.term[idx], minlength=n
        ).astype(np.int64) + self.prior
        ids = b.column(self.id_col).to_pylist()
        u = np.array(
            [
                (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1)
                / 4294967296.0
                for i in ids
            ],
            dtype=np.float64,
        )
        keep = _pareto_keep(s_fp, n_tok, u, self.alpha)
        return pa.table(
            {
                self.id_col: pc.cast(b.column(self.id_col), pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "score_fp": pa.array(s_fp, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )


def nb_quality_filter(ds, pos_ds, neg_ds, *, text_col: str = "text",
                      id_col: str = "doc_id", alpha: int = PARETO_ALPHA,
                      concurrency=(1, 8)):
    """Score every document of ``ds`` against the curated-vs-crawl NB
    model trained on ``pos_ds`` / ``neg_ds`` (text datasets); returns
    (id_col, n_tokens, score_fp, keep).  Selection composes downstream
    (filter keep, or rank score_fp for a top-k cut)."""
    import ray

    pos_vec = hashed_bucket_counts(pos_ds, text_col=text_col)
    neg_vec = hashed_bucket_counts(neg_ds, text_col=text_col)
    n_pos = pos_ds.count()
    n_neg = neg_ds.count()
    model_ref = ray.put(nb_model(pos_vec, neg_vec, n_pos, n_neg))
    return ds.map_batches(
        NbScorer,
        fn_constructor_kwargs={
            "model_ref": model_ref, "text_col": text_col,
            "id_col": id_col, "alpha": alpha,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
