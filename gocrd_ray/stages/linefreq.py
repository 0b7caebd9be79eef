"""Corpus-frequency line-level boilerplate removal (the RefinedWeb /
CCNet "line dedup" correction, Penedo et al. 2023 §3.3): delete every
line that occurs in at least ``min_docs`` DISTINCT documents anywhere
in the corpus — cookie banners, navigation stubs, share-bar text —
and return each document's reassembled clean text.

This is the corrective sibling of
:func:`gocrd_ray.stages.dedup.paragraph_dedup` (which only *reports*
repeated paragraphs) and of
:func:`gocrd_ray.stages.substring.repeated_substring_cut` (which cuts
character-window repeats): the unit here is the layout line, the
criterion is cross-document frequency, and the output is the cleaned
corpus itself.

Line synthesis matches the pagegen layout contract the SQL oracle uses
(8-word lines): the SAME RE2 rewrite (Arrow and DuckDB both run RE2,
so the transformation is byte-identical by construction), then a
``chr(10)`` split.

Scale shape (10^12 docs):

1. Frequency counting moves only narrow ``(line_hash, n_docs)``
   partials — a document's lines never straddle input batches (each
   input row IS a whole document), so per-batch distinct-doc counts
   combine exactly under Sum.
2. The frequent-line set stays a DATASET; its Bloom bits (sharded
   build, :mod:`gocrd_ray.stages.bloom`) are broadcast once.
3. Documents whose lines ALL miss the Bloom — the overwhelming
   majority in a real crawl — are emitted clean in place: ZERO
   shuffle, no exploded rows, original text passed through as Arrow.
4. Only Bloom-hit documents explode into line rows; their lines ride
   ONE one-pass exact blocklist filter (tag + co-partitioned
   anti-join, no false positives survive) and ONE bucketed regroup to
   reassemble per-document text.  A per-document sentinel row (line
   index -1, a key that can never be frequent) keeps fully-boilerplate
   documents present in the output with empty clean text.

The doc stream is scanned twice (clean branch + hit branch), the
documented ``one_pass=False`` blocklist trade: the filter sits on a
cheap column-pruned scan and the clean majority rides zero shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 8-word layout lines — identical RE2 rewrite in the SQL oracle
# (queries.LINEBREAK_SQL).
_LINE_RE = r"((?:\S+ ){7}\S+) "


def _doc_lines(texts):
    """(linebroken, flat_lines, parents, pos, n_lines): every row's
    text split into layout lines, fully vectorized in Arrow C++."""
    lb = pc.replace_substring_regex(
        pc.fill_null(texts, ""), pattern=_LINE_RE, replacement="\\1\n"
    )
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    ls = pc.split_pattern(lb, "\n")
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    flat = pc.list_flatten(ls)
    parents = pc.list_parent_indices(ls).to_numpy(zero_copy_only=False)
    n_lines = pc.list_value_length(ls).to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.cumsum(n_lines)])
    pos = np.arange(len(flat), dtype=np.int64) - starts[parents]
    return lb, flat, parents, pos, n_lines.astype(np.int64)


def _line_hashes(flat: pa.Array) -> pa.Array:
    """md5 hex of every line (the frequency key; md5 is the repo's
    SQL-parity digest — the oracle groups on the literal line text)."""
    return pa.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in flat.to_pylist()],
        pa.string(),
    )


def frequent_line_hashes(ds, *, text_col: str = "text",
                         min_docs: int = 2):
    """Dataset of md5 hashes of lines occurring in >= ``min_docs``
    distinct documents.  Per-batch partials pre-count distinct docs
    (exact: one input row is one whole document), so only narrow
    ``(line_hash, n_docs)`` rows reach the one global groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        _, flat, parents, _, _ = _doc_lines(b.column(text_col))
        t = pa.table({
            "line_hash": _line_hashes(flat),
            "doc": pa.array(parents, pa.int64()),
        })
        part = pa.TableGroupBy(t, "line_hash").aggregate(
            [("doc", "count_distinct")]
        )
        name_map = {"line_hash": "line_hash", "doc_count_distinct": "n_docs"}
        return part.rename_columns(
            [name_map[c] for c in part.column_names]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("line_hash")
        .aggregate(Sum("n_docs"))
    )

    def freq_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("sum(n_docs)"), min_docs))
        return b.select(["line_hash"])

    return agg.map_batches(freq_only, batch_format="pyarrow")


def frequent_line_clean(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", min_docs: int = 2,
                        fpr: float = 0.01, n_buckets: int = 64):
    """Remove corpus-frequent lines from every document.  Returns
    ``(id_col, clean_text, n_lines, n_removed)`` for EVERY input row —
    untouched documents pass through with their linebroken text
    byte-identical and ``n_removed = 0``."""
    import ray

    from . import bloom

    freq = frequent_line_hashes(
        ds, text_col=text_col, min_docs=min_docs
    ).materialize()  # consumed by count + Bloom build + exact verify
    n_freq = freq.count()
    bl = bloom.build_from_dataset(
        freq, key_col="line_hash", n_expected=max(n_freq, 1), fpr=fpr
    )
    m, k, shards = bl.m, bl.k, bl.shards
    bits_ref = ray.put(bl.bits)

    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field("clean_text", pa.string()),
        pa.field("n_lines", pa.int64()),
        pa.field("n_removed", pa.int64()),
    ])

    def _doc_hit_mask(b: pa.Table):
        blm = bloom.Bloom(m, k, ray.get(bits_ref), shards=shards)
        lb, flat, parents, pos, n_lines = _doc_lines(b.column(text_col))
        hashes = _line_hashes(flat)
        maybe = blm.contains(
            np.asarray(hashes.to_pylist(), dtype=object)
        ) if len(hashes) else np.zeros(0, dtype=bool)
        doc_hit = np.zeros(len(b), dtype=bool)
        doc_hit[parents[maybe]] = True
        return doc_hit, lb, flat, parents, pos, n_lines, hashes

    def clean_docs(b: pa.Table) -> pa.Table:
        # zero-Bloom-hit docs: clean in place, no shuffle ever
        doc_hit, lb, _, _, _, n_lines, _ = _doc_hit_mask(b)
        keep = ~doc_hit
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()).filter(
                pa.array(keep)
            ),
            "clean_text": lb.filter(pa.array(keep)),
            "n_lines": pa.array(n_lines[keep], pa.int64()),
            "n_removed": pa.array(
                np.zeros(int(keep.sum()), np.int64), pa.int64()
            ),
        }, schema=out_schema)

    def hit_doc_lines(b: pa.Table) -> pa.Table:
        # Bloom-hit docs explode into (id, i, line, line_hash,
        # n_lines) rows plus one sentinel row per doc (i = -1, key
        # "!<id>" — not hex, can never be frequent) so docs whose
        # every line is boilerplate still reach the output
        doc_hit, _, flat, parents, pos, n_lines, hashes = \
            _doc_hit_mask(b)
        ids = pc.cast(b.column(id_col), pa.int64())
        line_mask = pa.array(doc_hit[parents])
        hit_ids = ids.filter(pa.array(doc_hit))
        hit_nl = n_lines[doc_hit]
        sent_keys = pa.array(
            ["!" + str(v) for v in hit_ids.to_pylist()], pa.string()
        )
        n_sent = len(hit_ids)
        rows = pa.table({
            id_col: pc.take(ids, pa.array(parents)).filter(line_mask),
            "i": pa.array(pos, pa.int64()).filter(line_mask),
            "line": flat.filter(line_mask),
            "line_hash": hashes.filter(line_mask),
            "n_lines": pa.array(n_lines[parents], pa.int64()).filter(
                line_mask
            ),
        })
        sent = pa.table({
            id_col: hit_ids,
            "i": pa.array(np.full(n_sent, -1, np.int64), pa.int64()),
            "line": pa.array([""] * n_sent, pa.string()),
            "line_hash": sent_keys,
            "n_lines": pa.array(hit_nl, pa.int64()),
        })
        return pa.concat_tables([rows, sent])

    lines = ds.map_batches(hit_doc_lines, batch_format="pyarrow")
    kept = bloom.bloom_blocklist_filter_ds(
        lines, freq, key_col="line_hash", blocked_col="line_hash",
        n_expected=max(n_freq, 1), fpr=fpr, one_pass=True,
    )

    def bucket_tag(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.append_column(
            "__bucket", pa.array((ids % n_buckets).astype(np.int32))
        )

    def reassemble(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas().sort_values([id_col, "i"])
        real = df[df["i"] >= 0]
        joined = real.groupby(id_col)["line"].agg("\n".join)
        counts = real.groupby(id_col).size()
        meta = df.groupby(id_col)["n_lines"].first()
        out = pd.DataFrame({id_col: meta.index.to_numpy(np.int64)})
        out["clean_text"] = (
            out[id_col].map(joined).fillna("").to_numpy(dtype=object)
        )
        out["n_lines"] = meta.to_numpy(np.int64)
        n_kept = out[id_col].map(counts).fillna(0).to_numpy(np.int64)
        n_lines_v = out["n_lines"].to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
            "clean_text": pa.array(
                out["clean_text"].tolist(), pa.string()
            ),
            "n_lines": pa.array(n_lines_v, pa.int64()),
            "n_removed": pa.array(n_lines_v - n_kept, pa.int64()),
        }, schema=out_schema)

    rebuilt = (
        kept.map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reassemble, batch_format="pyarrow")
    )
    clean = ds.map_batches(clean_docs, batch_format="pyarrow")
    return clean.union(rebuilt)
