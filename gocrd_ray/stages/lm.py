"""N-gram language-model quality scoring (CCNet / Gopher-style
perplexity filtering) over the documents table.

A bigram LM with add-one smoothing is trained on a deterministic
hash-sampled slice of the corpus itself — the stand-in for CCNet's
Wikipedia-trained KenLM (no trained models ship in this environment;
the *engine shape* — distributed count aggregation, model broadcast
once via ``ray.put``, vectorized scoring in an actor pool — is the
point). Every document is then scored by average bigram log-probability
under the model; low-probability (high-perplexity) text is the classic
web-corpus quality-filter signal.

Scale shape (10^12 docs): training moves only narrow ``(token, count)``
partial-aggregate rows through one groupby; the model itself is the
Zipf HEAD (``min_count`` prunes the rare tail, bounding model size
independently of corpus size) and is broadcast once; scoring is a pure
streaming per-batch map with no shuffle. For vocabularies too large to
broadcast even pruned, the same score decomposes into two
co-partitioned count joins (the :func:`gocrd_ray.stages.bloom` verify
pattern); the broadcast form is the deployment default because a
pruned bigram head at web scale is ~10^7 rows.

Exactness contract (what makes this SQL-checkable at all): each bigram
contributes an INTEGER fixed-point term

    floor(1e7 * ln(c12 + 1)) - floor(1e7 * ln(c1 + V))

so per-document scores are order-free integer sums — bit-identical
between numpy and the DuckDB oracle regardless of summation order.
``ln`` over integer-valued doubles is the same libm call on both sides
(pinned by a test sweeping the full argument range).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Separator for bigram join keys: unit separator, cannot occur in
# whitespace-tokenized text. Mirrored as chr(31) in the SQL oracle.
SEP = "\x1f"

# Default train-slice threshold: md5 8-hex prefix < this ≈ 16% sample.
# Same mechanism (and same SQL mirror) as stages.dedup.hash_sample.
TRAIN_HEX = "28f5c28f"


def _tokens(col):
    """Whitespace tokens of a string column with per-row parent ids."""
    toks = pc.split_pattern(pc.fill_null(col, ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return toks, flat, parents


def _bigram_keys(flat: pa.Array, parents: np.ndarray):
    """(bigram_key, w1, bigram_parent) for every in-document adjacent
    token pair — vectorized: the pair (i, i+1) is a bigram iff both
    positions belong to the same document."""
    n = len(flat)
    if n < 2:
        empty = pa.array([], pa.string())
        return empty, empty, np.empty(0, dtype=np.int64)
    mask = pa.array(parents[:-1] == parents[1:])
    w1 = pc.filter(flat.slice(0, n - 1), mask)
    w2 = pc.filter(flat.slice(1, n - 1), mask)
    bg = pc.binary_join_element_wise(w1, w2, SEP)
    bparents = parents[:-1][np.asarray(mask)]
    return bg, w1, bparents


def _fp_ln(vals: np.ndarray) -> np.ndarray:
    """floor(1e7 * ln(v)) as int64, computed with libm ``math.log`` on
    the few distinct values (NOT np.log, whose SIMD path may differ by
    1 ulp from the libm DuckDB calls)."""
    uniq, inv = np.unique(vals, return_inverse=True)
    tab = np.array(
        [math.floor(1e7 * math.log(int(u))) for u in uniq], dtype=np.int64
    )
    return tab[inv]


def _count_partial(tbl: pa.Table, key: str) -> pa.Table:
    part = pa.TableGroupBy(tbl, key).aggregate([(key, "count")])
    name_map = {key: key, f"{key}_count": "n"}
    return part.rename_columns([name_map[c] for c in part.column_names])


def train_bigram_lm(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    sample_hex: str = TRAIN_HEX, min_count: int = 1):
    """Train the smoothed bigram LM on the hash-sampled slice.

    Returns ``(model_ref, model)`` where ``model_ref`` is the
    ``ray.put`` handle scorers read and ``model`` is the driver-side
    dict (for tests). Only aggregated ``(token, count)`` /
    ``(bigram, count)`` rows ever reach the driver — vocabulary-sized,
    not corpus-sized, and ``min_count`` prunes the rare tail for
    bounded model memory at scale (``V`` is counted before pruning so
    the smoothing denominator is the true vocabulary size).
    """
    import ray

    from .dedup import hash_sample

    train = hash_sample(ds, col=id_col, hex_threshold=sample_hex)

    def partials(b: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(b.column(text_col))
        bg, _, _ = _bigram_keys(flat, parents)
        uni = _count_partial(pa.table({"k": flat}), "k")
        big = _count_partial(pa.table({"k": bg}), "k")
        uni = uni.append_column("kind", pa.array(["u"] * len(uni), pa.string()))
        big = big.append_column("kind", pa.array(["b"] * len(big), pa.string()))
        out = pa.concat_tables([uni, big])
        if len(out) == 0:  # pin schema for empty blocks
            return pa.table(
                {"k": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.string())}
            )
        return out

    agg = (
        train.map_batches(partials, batch_format="pyarrow")
        .groupby(["kind", "k"])
        .sum("n")
    )
    rows = agg.take_all()
    uni_tok, uni_n, big_tok, big_n = [], [], [], []
    for r in rows:
        if r["kind"] == "u":
            uni_tok.append(r["k"])
            uni_n.append(r["sum(n)"])
        else:
            big_tok.append(r["k"])
            big_n.append(r["sum(n)"])
    v = len(uni_tok)
    if v == 0:
        raise ValueError(
            "train_bigram_lm: the hash-sampled training slice produced an "
            "empty vocabulary (no tokens matched sample_hex="
            f"{sample_hex!r}). Widen sample_hex or feed a non-empty corpus; "
            "scoring with V=0 would be a log(0) domain error."
        )
    if min_count > 1:
        uk = [(t, c) for t, c in zip(uni_tok, uni_n) if c >= min_count]
        bk = [(t, c) for t, c in zip(big_tok, big_n) if c >= min_count]
        uni_tok, uni_n = map(list, zip(*uk)) if uk else ([], [])
        big_tok, big_n = map(list, zip(*bk)) if bk else ([], [])
    import pandas as pd

    model = {
        "uni_idx": pd.Index(uni_tok, dtype=object),
        "uni_n": np.asarray(uni_n, dtype=np.int64),
        "big_idx": pd.Index(big_tok, dtype=object),
        "big_n": np.asarray(big_n, dtype=np.int64),
        "V": v,
    }
    return ray.put(model), model


class PerplexityScorer:
    """Actor-pool scoring stage: the broadcast model is fetched ONCE per
    actor in ``__init__`` (zero-copy from the local object store), each
    batch is scored with two vectorized hash-index lookups.

    Output: ``(doc_id, n_bigrams, score_fp, avg_logprob)`` where
    ``score_fp`` is the order-free integer fixed-point sum (see module
    docstring) and ``avg_logprob = score_fp / (1e7 * n_bigrams)``.
    """

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        m = ray.get(model_ref)
        self.uni_idx = m["uni_idx"]
        self.uni_n = m["uni_n"]
        self.big_idx = m["big_idx"]
        self.big_n = m["big_n"]
        self.V = m["V"]
        self.id_col = id_col
        self.text_col = text_col

    def _lookup(self, idx, counts, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
        pos = idx.get_indexer(keys)
        out = np.zeros(len(keys), dtype=np.int64)
        hit = pos >= 0
        out[hit] = counts[pos[hit]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = len(batch)
        _, flat, parents = _tokens(batch.column(self.text_col))
        bg, w1, bparents = _bigram_keys(flat, parents)
        c12 = self._lookup(
            self.big_idx, self.big_n, bg.to_numpy(zero_copy_only=False)
        )
        c1 = self._lookup(
            self.uni_idx, self.uni_n, w1.to_numpy(zero_copy_only=False)
        )
        terms = _fp_ln(c12 + 1) - _fp_ln(c1 + self.V)
        score = np.zeros(n_docs, dtype=np.int64)
        np.add.at(score, bparents, terms)
        n_big = np.bincount(bparents, minlength=n_docs).astype(np.int64)
        avg = np.zeros(n_docs, dtype=np.float64)
        nz = n_big > 0
        avg[nz] = score[nz] / (1e7 * n_big[nz])
        return pa.table(
            {
                self.id_col: pc.cast(batch.column(self.id_col), pa.int64()),
                "n_bigrams": pa.array(n_big, pa.int64()),
                "score_fp": pa.array(score, pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
            }
        )


def perplexity_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      sample_hex: str = TRAIN_HEX, min_count: int = 1,
                      concurrency=(1, 4)):
    """Full pipeline: train on the hash-sampled slice, score every
    document. The documents Dataset streams twice (once narrow for
    counts, once for scoring) — never materialized."""
    model_ref, _ = train_bigram_lm(
        ds, text_col=text_col, id_col=id_col,
        sample_hex=sample_hex, min_count=min_count,
    )
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={
            "model_ref": model_ref, "id_col": id_col, "text_col": text_col
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
