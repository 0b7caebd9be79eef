"""Benchmark decontamination: flag corpus documents that share any
token n-gram with a (small) held-out evaluation set.

This is the standard training-data hygiene pass (n-gram-overlap
decontamination as described for GPT-3, Brown et al. 2020 §4, and
The Pile, Gao et al. 2021): the eval set is tiny next to the corpus,
so its n-gram set is the classic broadcast small side — collected
once, `ray.put` once, membership-tested inside every `map_batches`
task. Nothing corpus-sized ever shuffles or touches the driver.

Scale shapes (10^12 docs): the corpus side is a single streaming
actor-pool map — no shuffle at all. The eval side is one tiny
pipeline. `hashed=True` broadcasts 64-bit SipHash gram hashes
(8 bytes/gram, np.isin against a sorted array) instead of the gram
strings; string mode is the byte-exact form the SQL oracle checks.

Hashed-mode caveat (NOT a pure optimization): a 64-bit collision
between a corpus gram and an eval gram flags a clean document. At
~10^6 eval grams × 10^12 corpus grams expect ~50 collisions overall —
each drops one clean doc from the training set (never the reverse:
real contamination is always caught). Acceptable for a dedup-style
hygiene pass; use string mode when the false-positive rate must be
exactly zero.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _token_ngrams(col, n: int):
    """Token n-grams of a string column (whitespace split, ' '-joined —
    byte-equal to SQL ``string_split(text, ' ')`` + ``||`` chains,
    empty tokens from runs of spaces included).

    Returns (grams: pa.StringArray, parents: np.ndarray[int64]) where
    parents[i] is the row index the i-th gram came from. Fully
    vectorized: one split, n zero-copy slices, one C++ element-wise
    join, one boolean filter.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    m = len(flat) - n + 1
    if m <= 0:
        return pa.array([], pa.string()), np.array([], dtype=np.int64)
    parts = [flat.slice(j, m) for j in range(n)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    # a window is a real n-gram only if it stays inside one document
    valid = parents[:m] == parents[n - 1 :]
    grams = grams_all.filter(pa.array(valid))
    return grams, parents[:m][valid]


def _hash_grams(grams: pa.Array) -> np.ndarray:
    import pandas as pd

    if len(grams) == 0:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(
        grams.to_numpy(zero_copy_only=False), categorize=False
    ).astype(np.uint64)


def collect_eval_grams(eval_ds, *, n: int = 4, text_col: str = "text",
                       hashed: bool = False):
    """Distinct token n-grams of the eval set, as one driver-side Arrow
    array (or sorted uint64 hash array when ``hashed``).

    The eval set is small BY DEFINITION (a benchmark), so pulling its
    text to the driver and building grams locally is the broadcast
    pattern, not a scale leak. (Deliberately NOT a distributed
    map_batches gram stage: the eval side is usually a filter of a
    bigger table, its empty blocks skip UDFs entirely in Ray 2.49 and
    surface downstream as schema-less bundles — the r2 bench-tail
    "RefBundle with a different schema" warning.)
    """
    parts = []
    for b in eval_ds.iter_batches(batch_format="pyarrow"):
        if text_col not in b.column_names or b.num_rows == 0:
            continue
        grams, _ = _token_ngrams(b.column(text_col), n)
        col = pc.unique(grams)
        parts.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if parts:
        grams = pc.unique(pa.concat_arrays(parts))
    else:
        grams = pa.array([], pa.string())
    if hashed:
        return np.sort(np.unique(_hash_grams(grams)))
    return grams


class Decontaminator:
    """Actor-pool stage: corpus batches → + (n_hits, contaminated).

    The eval gram set is fetched from the object store ONCE per actor
    (``__init__``); every ``__call__`` is one vectorized n-gram
    construction + one C++ ``is_in`` (or np.isin on hashes) + one
    scatter-add of hits per row.
    """

    def __init__(self, gram_ref=None, grams=None, *, n: int = 4,
                 text_col: str = "text", hashed: bool = False):
        if gram_ref is not None:
            import ray

            grams = ray.get(gram_ref)
        self.n = n
        self.text_col = text_col
        self.hashed = hashed
        if hashed:
            self.gram_hashes = np.asarray(grams, dtype=np.uint64)
        else:
            self.value_set = grams

    def __call__(self, b: pa.Table) -> pa.Table:
        grams, parents = _token_ngrams(b.column(self.text_col), self.n)
        counts = np.zeros(len(b), dtype=np.int64)
        if len(grams):
            if self.hashed:
                hit = np.isin(_hash_grams(grams), self.gram_hashes)
            else:
                hit = pc.is_in(grams, value_set=self.value_set).to_numpy(
                    zero_copy_only=False
                )
            np.add.at(counts, parents[hit], 1)
        return b.append_column("n_hits", pa.array(counts)).append_column(
            "contaminated", pa.array(counts > 0)
        )


def decontaminate(corpus_ds, eval_ds, *, n: int = 4, text_col: str = "text",
                  hashed: bool = False, concurrency=(1, 4)):
    """Flag every corpus row that shares a token n-gram with the eval
    set. Appends ``n_hits`` (number of gram occurrences in the row that
    appear anywhere in the eval set) and ``contaminated`` columns;
    filter on ``contaminated == false`` to take the clean corpus.
    """
    import ray

    gram_ref = ray.put(
        collect_eval_grams(eval_ds, n=n, text_col=text_col, hashed=hashed)
    )
    return corpus_ds.map_batches(
        Decontaminator,
        fn_constructor_kwargs={
            "gram_ref": gram_ref,
            "n": n,
            "text_col": text_col,
            "hashed": hashed,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
