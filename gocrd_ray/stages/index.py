"""Corpus indexing: inverted index construction and TF-IDF keyword
extraction over the documents table — the retrieval-side operators of
a training-data pipeline (nearest-neighbor text search, targeted
decontamination, corpus exploration).

Scale shapes (10^12 docs):

* ``inverted_index`` explodes to DISTINCT ``(token, doc_id)`` pairs
  per batch (per-batch dedup before anything moves), routes them
  through ONE hash-bucket shuffle, and assembles posting lists
  vectorized per bucket. ``max_df`` drops tokens whose document
  frequency exceeds the cap — the standard IR stopword guard that also
  bounds the largest posting list a single task must hold (a web-scale
  deployment shards hot postings further; the cap is the honest
  contract here — tokens over the cap are simply excluded from the
  index, exactly as the SQL mirror's ``HAVING count(*) <= max_df``
  excludes them; count them separately with ``tfidf_topterms``'s df
  aggregate if an audit is needed).
* ``tfidf_topterms`` computes document frequencies with a narrow
  ``(token, n)`` aggregate, broadcasts the vocabulary-sized df map
  once via ``ray.put``, and scores each batch in a streaming actor
  map — no document-shaped shuffle at all.

Exactness contract for TF-IDF: scores are the integer fixed point
``floor(1e7 * (tf * ln(N / df)))`` with ``ln`` over bit-identical
double arguments (same libm in numpy-free ``math.log`` and DuckDB),
so ranking — ``(score_fp DESC, token ASC)`` — is deterministic and
identical in both engines.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _distinct_pairs(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """DISTINCT (token, doc_id) pairs of one batch, vectorized."""
    toks = pc.split_pattern(pc.fill_null(batch.column(text_col), ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False
    )[parents]
    t = pa.table(
        {"token": flat, "doc_id": pa.array(ids, pa.int64())}
    )
    grp = pa.TableGroupBy(t, ["token", "doc_id"]).aggregate([])
    return grp


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   max_df: int | None = None, n_buckets: int = 64):
    """token → sorted posting list. Returns ``(token, df, postings)``
    where ``postings`` is the comma-joined ascending doc_id list —
    SQL-mirrorable as ``string_agg(doc_id ORDER BY doc_id)``."""

    def pairs(b: pa.Table) -> pa.Table:
        p = _distinct_pairs(b, text_col, id_col)
        if len(p) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64())}
            )
        import pandas as pd

        h = pd.util.hash_array(
            np.asarray(p.column("token").to_pylist(), dtype=object)
        )
        return p.append_column(
            "bucket", pa.array((h % n_buckets).astype(np.int64), pa.int64())
        )

    def assemble(group: pa.Table) -> pa.Table:
        toks = np.asarray(group.column("token").to_pylist(), dtype=object)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, toks))
        toks, ids = toks[order], ids[order]
        # distinct-pair input may still repeat across source batches
        keep = np.ones(len(toks), dtype=bool)
        if len(toks) > 1:
            keep[1:] = (toks[1:] != toks[:-1]) | (ids[1:] != ids[:-1])
        toks, ids = toks[keep], ids[keep]
        bounds = np.flatnonzero(
            np.r_[True, toks[1:] != toks[:-1], True]
        )
        out_tok, out_df, out_post = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            df = e - s
            if max_df is not None and df > max_df:
                continue
            out_tok.append(toks[s])
            out_df.append(df)
            out_post.append(",".join(map(str, ids[s:e])))
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "df": pa.array(out_df, pa.int64()),
                "postings": pa.array(out_post, pa.string()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(assemble, batch_format="pyarrow")
    )


class TfIdfScorer:
    """Actor-pool stage: broadcast df map fetched once per actor; each
    batch is scored with one hash-index lookup + per-doc top-k via
    lexsort on the integer fixed-point score."""

    def __init__(self, df_ref, n_docs: int, k: int,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray

        tokens, dfs = ray.get(df_ref)
        import pandas as pd

        self.idx = pd.Index(tokens, dtype=object)
        self.dfs = dfs
        # ln(N/df) per distinct df value, libm for DuckDB bit-parity
        self.n_docs = float(n_docs)
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(batch.column(self.text_col), ""), " "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids_per_row = pc.cast(batch.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "token": flat,
                "doc_id": pa.array(ids_per_row[parents], pa.int64()),
            }
        )
        tf_tbl = pa.TableGroupBy(t, ["doc_id", "token"]).aggregate(
            [("token", "count")]
        )
        doc = tf_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tok = np.asarray(tf_tbl.column("token").to_pylist(), dtype=object)
        tf = tf_tbl.column("token_count").to_numpy(zero_copy_only=False)
        pos = self.idx.get_indexer(tok)
        # every batch token was counted in the global df pass, so pos >= 0
        # always holds when scoring the corpus the df map was built on;
        # the df=1 fallback keeps a foreign batch finite instead of inf
        df = np.where(pos >= 0, self.dfs[np.clip(pos, 0, None)], 1)
        ratios = self.n_docs / df.astype(np.float64)
        uniq, inv = np.unique(ratios, return_inverse=True)
        lnv = np.array([math.log(u) for u in uniq], dtype=np.float64)[inv]
        score = np.floor(1e7 * (tf.astype(np.float64) * lnv)).astype(np.int64)
        # top-k per doc: (doc asc, score desc, token asc)
        order = np.lexsort((tok, -score, doc))
        doc, tok, tf, df, score = (
            doc[order], tok[order], tf[order], df[order], score[order]
        )
        bounds = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1], True])
        rank = np.arange(len(doc)) - np.repeat(
            bounds[:-1], np.diff(bounds)
        ) + 1
        keep = rank <= self.k
        return pa.table(
            {
                self.id_col: pa.array(doc[keep], pa.int64()),
                "token": pa.array(tok[keep], pa.string()),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(df[keep], pa.int64()),
                "score_fp": pa.array(score[keep], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
            }
        )


def tfidf_topterms(ds, *, k: int = 5, text_col: str = "text",
                   id_col: str = "doc_id", concurrency=(1, 4)):
    """Per-document top-k TF-IDF terms. See module docstring for the
    exactness contract and scale shape."""
    import ray

    def df_partial(b: pa.Table) -> pa.Table:
        p = _distinct_pairs(b, text_col, id_col)
        if len(p) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        grp = pa.TableGroupBy(p, "token").aggregate([("token", "count")])
        name_map = {"token": "token", "token_count": "n"}
        return grp.rename_columns([name_map[c] for c in grp.column_names])

    agg = ds.map_batches(df_partial, batch_format="pyarrow").groupby(
        "token"
    ).sum("n")
    rows = agg.take_all()
    tokens = np.asarray([r["token"] for r in rows], dtype=object)
    dfs = np.asarray([r["sum(n)"] for r in rows], dtype=np.int64)
    n_docs = int(ds.count())
    df_ref = ray.put((tokens, dfs))
    return ds.map_batches(
        TfIdfScorer,
        fn_constructor_kwargs={
            "df_ref": df_ref, "n_docs": n_docs, "k": k,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
