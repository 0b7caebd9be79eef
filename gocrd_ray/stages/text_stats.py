"""Text-analysis stages over the documents / extracted-pages tables:
token counting, quality scoring, language-ID, fingerprinting.

All hot paths are vectorized (pyarrow.compute / numpy); the only
per-row Python is in the language-ID profile scoring, which runs on
token-count vectors, not raw strings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Fixed stopword list — must stay in sync with the SQL mirror in
# __ray_entry__.oracle_sql (quality_score query).
STOPWORDS = ("the", "a", "und", "der", "die", "das", "ein", "over", "zur", "nur")
PUNCT = ".,!?;:()"


def _split_tokens(col: pa.Array):
    toks = pc.split_pattern(col, " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return toks, flat, parents


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_tokens) — whitespace tokenization."""
    text = batch.column("text")
    n_tokens = pc.add(pc.count_substring(text, " "), 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_stopwords, n_punct, stopword_ratio).

    Length / punctuation / stopword-ratio quality signals for filtering
    low-quality documents at corpus scale.
    """
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks, flat, parents = _split_tokens(text)
    n = len(batch)
    stop_mask = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.zeros(n, dtype=np.int64)
    np.add.at(n_stop, parents, np.nan_to_num(stop_mask, nan=0.0).astype(np.int64))
    n_punct = None
    for ch in PUNCT:
        c = pc.count_substring(text, ch)
        n_punct = c if n_punct is None else pc.add(n_punct, c)
    n_tokens = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    ratio = np.asarray(n_stop, dtype=np.float64) / n_tokens.to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": n_tokens,
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "n_punct": pc.cast(n_punct, pa.int64()),
            "stopword_ratio": pa.array(ratio, pa.float64()),
        }
    )


# BPE-ish tokenization: letter runs, digit runs, single non-alnum marks —
# the shape of a byte-pair pretokenizer's coarse split. Pattern must stay
# RE2-compatible and byte-identical between Python re and DuckDB
# regexp_extract_all (SQL mirror in __ray_entry__).
BPE_ISH_PATTERN = r"[a-zà-þß-ÿ]+|[0-9]+|[^a-zà-þß-ÿ0-9 ]"


class RegexTokenizer:
    """Actor-pool token-count stage: pattern compiles once per actor."""

    def __init__(self, pattern: str = BPE_ISH_PATTERN, id_col: str = "doc_id",
                 text_col: str = "text"):
        import re

        self.rx = re.compile(pattern)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch.column(self.text_col)).to_pylist()
        counts = [len(self.rx.findall(t or "")) for t in texts]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_regex_tokens": pa.array(counts, pa.int64()),
            }
        )


# -- language ID -------------------------------------------------------------

# tiny deterministic unigram profiles; a real system would ship n-gram
# models — the *engine shape* (broadcast profile, vectorized scoring in an
# actor pool) is the point.
LANG_PROFILES = {
    "en": ("the", "a", "over", "quick", "lazy", "dog", "fast", "small", "big", "slow"),
    "de": ("und", "der", "die", "das", "ein", "über", "nur", "zur", "kann", "daher"),
    "fr": ("le", "la", "et", "un", "une", "des", "est", "dans", "pour", "que"),
    "es": ("el", "la", "y", "un", "una", "los", "es", "en", "por", "que"),
    "la": ("et", "in", "est", "non", "ad", "cum", "sed", "quod", "ut", "per"),
}


class LangId:
    """Actor-pool language-ID stage: profiles compiled once per actor
    (__init__), vectorized token-hit scoring per batch (__call__)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.langs = sorted(LANG_PROFILES)
        vocab, vlang = [], []
        for li, lang in enumerate(self.langs):
            for w in LANG_PROFILES[lang]:
                vocab.append(w)
                vlang.append(li)
        self.vocab = pa.array(vocab)
        self.vlang = np.array(vlang, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks, flat, parents = _split_tokens(pc.utf8_lower(text))
        n = len(batch)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        idx = pc.index_in(flat, value_set=self.vocab).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(idx)
        np.add.at(
            scores,
            (parents[valid].astype(np.int64), self.vlang[idx[valid].astype(np.int64)]),
            1,
        )
        best = scores.argmax(axis=1)  # ties → lexicographically first lang
        pred = [self.langs[b] if scores[i, b] > 0 else "und" for i, b in enumerate(best)]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "pred_lang": pa.array(pred, pa.string()),
                "score": pa.array(scores.max(axis=1), pa.int64()),
            }
        )


# -- fingerprinting ----------------------------------------------------------


def fingerprint_batch(
    batch: pa.Table, k: int = 3, window: int = 4, id_col: str = "doc_id"
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 "Winnowing: Local Algorithms for Document
    Fingerprinting"): rolling k-token shingle hashes, min per sliding
    window of ``window`` consecutive shingles, distinct selected minima
    → (id, n_shingles, n_fp, fp_set).  ``fp_set`` is the sorted
    selected-minima set comma-joined into one string — injective for
    fixed-width hex digests, so equality on it pins the full set.

    The shingle hash is md5-hex — the repo-wide SQL-parity contract
    (DuckDB ``md5()``), which makes the FULL selected fingerprint set
    exactly checkable against an ANSI-SQL oracle; lexicographic order
    on the hex strings equals numeric order on the 128-bit values, so
    winnowing's min-selection is unchanged.  A deployment chasing the
    last 2–3× on this stage would swap in crc32/xxhash (any
    deterministic hash preserves winnowing's guarantees); the selection
    logic below is hash-agnostic.
    """
    texts = batch.column("text").to_pylist()
    ids = batch.column(id_col)
    n_sh, n_fp, fps = [], [], []
    for t in texts:
        toks = t.split(" ") if t else []
        hs = [
            hashlib.md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()
            for i in range(max(0, len(toks) - k + 1))
        ]
        if not hs:
            n_sh.append(0)
            n_fp.append(0)
            fps.append("")
            continue
        # hex order == numeric order, so rank each shingle hash by its
        # position in the doc's sorted-unique hash list and window-min
        # over the integer ranks (numpy can't reduce string dtypes).
        uniq, inv = np.unique(np.asarray(hs), return_inverse=True)
        if len(hs) >= window:
            min_ranks = np.lib.stride_tricks.sliding_window_view(
                inv, window
            ).min(axis=1)
            sel = uniq[np.unique(min_ranks)]
        else:
            sel = uniq[:1]
        n_sh.append(len(hs))
        n_fp.append(len(sel))
        fps.append(",".join(sel.tolist()))
    return pa.table(
        {
            id_col: ids,
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_fp": pa.array(n_fp, pa.int64()),
            "fp_set": pa.array(fps, pa.string()),
        }
    )


def common_token_stats(ds, *, min_freq: int = 50, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Corpus-statistics quality signal: per document, how many of its
    tokens belong to the corpus's FREQUENT vocabulary (corpus frequency
    >= min_freq) — the data-driven analog of a fixed stopword ratio.

    Two phases, both scale-shaped: (1) token corpus frequencies via
    per-batch partial counts combined by one narrow groupby; (2) the
    frequent set — the Zipf HEAD, small by construction, unlike the
    rare tail — is broadcast once via ray.put and each batch counts
    membership with one vectorized is_in. Nothing document-shaped
    shuffles.

    Returns (id_col, n_tokens, n_common).
    """
    import ray
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(pc.fill_null(b.column(text_col), ""), " "))
        t = pa.table({"token": toks})
        part = pa.TableGroupBy(t, "token").aggregate([("token", "count")])
        name_map = {"token": "token", "token_count": "n"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    counts = ds.map_batches(partial, batch_format="pyarrow").groupby("token").sum("n")

    def keep_frequent(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["token", "n"])
        return b.filter(pc.greater_equal(b.column("n"), min_freq)).select(["token"])

    frequent = counts.map_batches(keep_frequent, batch_format="pyarrow").take_all()
    common_ref = ray.put(pa.array(sorted(r["token"] for r in frequent), pa.string()))

    def score(b: pa.Table) -> pa.Table:
        common = ray.get(common_ref)
        toks = pc.split_pattern(pc.fill_null(b.column(text_col), ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        hits = pc.is_in(flat, value_set=common).to_numpy(zero_copy_only=False)
        import numpy as np

        n_common = np.zeros(len(b), dtype=np.int64)
        np.add.at(n_common, parents, hits.astype(np.int64))
        return pa.table(
            {
                id_col: pc.cast(b.column(id_col), pa.int64()),
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
                "n_common": pa.array(n_common, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def pack_chunks(ds, *, chunk_tokens: int = 512, text_col: str = "text",
                id_col: str = "doc_id", range_bucket: int = 64,
                tokens_col: str | None = None):
    """LM sequence packing (GPT-style concatenation): the corpus's
    token stream, ordered by ``id_col``, is cut into fixed-size chunks
    of ``chunk_tokens``; each document maps to the [start_chunk,
    end_chunk] range its tokens land in (documents may straddle chunk
    boundaries).

    The global ordered prefix sum is computed scalably: documents hash
    into ORDERED ranges (``id // range_bucket``), per-range token sums
    (one tiny row per range) come back to the driver for the running
    offsets, the offsets broadcast, and each range computes its local
    cumulative sum independently — one narrow groupby + one small
    broadcast, never a global ordered scan.

    ``tokens_col`` short-circuits the tokenize step with a precomputed
    per-document token count (e.g. the extract stage's n_words).

    Returns (id_col, n_tokens, token_start, start_chunk, end_chunk).
    """
    import ray

    def counts(b: pa.Table) -> pa.Table:
        if tokens_col is not None:
            n = pc.cast(b.column(tokens_col), pa.int64())
        else:
            toks = pc.split_pattern(pc.fill_null(b.column(text_col), ""), " ")
            n = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table(
            {
                id_col: pc.cast(b.column(id_col), pa.int64()),
                "n_tokens": n,
            }
        )

    cts = ds.map_batches(counts, batch_format="pyarrow")

    def add_range(b: pa.Table) -> pa.Table:
        rng = pc.divide(b.column(id_col), range_bucket)
        return b.append_column("rng", pc.cast(rng, pa.int64()))

    ranged = cts.map_batches(add_range, batch_format="pyarrow").materialize()

    # tiny driver table: one (range, token_sum) row per range
    range_sums = {
        r["rng"]: r[f"sum(n_tokens)"]
        for r in ranged.groupby("rng").sum("n_tokens").take_all()
    }
    offsets = {}
    acc = 0
    for rng in sorted(range_sums):
        offsets[rng] = acc
        acc += range_sums[rng]
    offs_ref = ray.put(offsets)

    def per_range(group: pa.Table) -> pa.Table:
        offs = ray.get(offs_ref)
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        g = group.take(idx)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        base = offs[g.column("rng")[0].as_py()]
        ends = base + np.cumsum(n)
        starts = ends - n
        # a document's first token is in chunk start//C; its last in
        # (end-1)//C; empty docs pin both to the current position
        start_chunk = starts // chunk_tokens
        end_chunk = np.where(n > 0, (ends - 1) // chunk_tokens, start_chunk)
        return pa.table(
            {
                id_col: g.column(id_col),
                "n_tokens": g.column("n_tokens"),
                "token_start": pa.array(starts, pa.int64()),
                "start_chunk": pa.array(start_chunk, pa.int64()),
                "end_chunk": pa.array(end_chunk, pa.int64()),
            }
        )

    return ranged.groupby("rng").map_groups(per_range, batch_format="pyarrow")


# control chars (C0 minus nothing — \s already covers \t\n\f\r) stripped
# BEFORE whitespace collapse so "a\x00 b" and "a  b" normalize alike.
# Shared with the SQL mirror (both engines run RE2).
NORM_CTRL_RE = r"[\x00-\x08\x0b\x0e-\x1f\x7f]"
NORM_WS_RE = r"\s+"


def normalize_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Canonical text cleanup: NFC unicode normalization, control-char
    strip, whitespace-run collapse to single spaces, space trim —
    all in Arrow C++ kernels, bit-matchable by the DuckDB mirror
    (nfc_normalize + the same RE2 patterns). Emits before/after
    codepoint counts so shrinkage is auditable."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    before = pc.cast(pc.utf8_length(col), pa.int64())
    # NFC: pyarrow's utf8_normalize(form="NFC") does NOT compose
    # (16.1 returns e+U+0301 for "é" where Python/DuckDB return U+00E9
    # — caught by the hypothesis parity test), so non-ASCII rows go
    # through unicodedata; the common all-ASCII case skips it entirely.
    ascii_mask = pc.string_is_ascii(col)
    if pc.all(ascii_mask).as_py():
        t = col
    else:
        import unicodedata

        np_mask = ascii_mask.to_numpy(zero_copy_only=False)
        vals = col.to_pylist()
        t = pa.array(
            [
                v if is_a else unicodedata.normalize("NFC", v)
                for v, is_a in zip(vals, np_mask)
            ],
            pa.string(),
        )
    t = pc.replace_substring_regex(t, NORM_CTRL_RE, "")
    t = pc.replace_substring_regex(t, NORM_WS_RE, " ")
    t = pc.utf8_trim(t, " ")
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_norm": t,
            "n_chars_before": before,
            "n_chars_after": pc.cast(pc.utf8_length(t), pa.int64()),
        }
    )


def normalize_text(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Streaming text normalization — pure per-row map, no shuffle."""
    return ds.map_batches(
        lambda b: normalize_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def chunk_stride(ds, *, size: int = 200, stride: int = 150,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Overlapping context-window chunking: emit the character windows
    [0, size), [stride, stride+size), ... for every start < length —
    the LM-pretraining chunker for documents longer than one context
    window (overlap = size - stride preserves cross-boundary n-grams).

    Pure per-batch map, no shuffle. The loop is over CHUNK ORDINALS
    present in the batch (<= ceil(max_len / stride)), never over rows:
    each ordinal is one whole-column utf8 slice + filter. Null texts
    are dropped (poison-row principle); empty texts produce no chunks,
    matching the SQL mirror's range(ceil(len/stride)).
    """

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("chunk_id", pa.int64()),
            pa.field("chunk_text", pa.string()),
        ]
    )

    def chunks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(text_col)))
        if b.num_rows == 0:
            return out_schema.empty_table()
        lens = pc.utf8_length(b.column(text_col)).to_numpy(
            zero_copy_only=False
        )
        max_n = int(-(-int(lens.max()) // stride)) if len(lens) else 0
        parts = []
        for ci in range(max_n):
            start = ci * stride
            mask = pa.array(lens > start)
            sub = b.filter(mask)
            if sub.num_rows == 0:
                break
            txt = pc.utf8_slice_codeunits(
                sub.column(text_col), start=start, stop=start + size
            )
            parts.append(
                pa.table(
                    {
                        id_col: pc.cast(sub.column(id_col), pa.int64()),
                        "chunk_id": pa.array(
                            np.full(sub.num_rows, ci, np.int64)
                        ),
                        "chunk_text": txt,
                    },
                    schema=out_schema,
                )
            )
        return (
            pa.concat_tables(parts) if parts else out_schema.empty_table()
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def entropy_batch(batch: pa.Table, *, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Per-document unigram Shannon entropy as an order-free int64
    fixed-point value (token-diversity / repetition quality signal —
    the "unigram entropy filter" family of pretraining hygiene
    stacks).

    With per-doc token count n and within-doc type counts c_t,

        H = ln(n) - (1/n) * sum_t c_t * ln(c_t)

    is computed as the integer

        entropy_fp = n * floor(1e7*ln(n)) - sum_t c_t * floor(1e7*ln(c_t))

    so per-document values are exact int64 regardless of summation
    order (the lm.py integer-ln contract; ``ln`` over integer-valued
    doubles is the same libm call in numpy-land and DuckDB).  The
    float view ``entropy = entropy_fp / (1e7 * n)`` is one division on
    both sides.  A doc of n identical tokens gets entropy_fp 0; NULL
    text tokenizes to [''] (n=1, entropy 0) like every other text
    stage.

    Pure per-row math — zero shuffle at any scale.
    """
    from .lm import _fp_ln, _tokens

    _, flat, parents = _tokens(batch.column(text_col))
    n = len(batch)
    n_tok = np.bincount(parents, minlength=n).astype(np.int64)
    vals = np.asarray(flat.to_pylist(), dtype=object)
    if len(vals):
        uniq, tok_ids = np.unique(vals, return_inverse=True)
        key = parents.astype(np.int64) * np.int64(len(uniq)) + tok_ids
        pair, c = np.unique(key, return_counts=True)
        pair_parent = (pair // np.int64(len(uniq))).astype(np.int64)
        n_types = np.bincount(pair_parent, minlength=n).astype(np.int64)
        sum_clnc = np.zeros(n, dtype=np.int64)
        np.add.at(sum_clnc, pair_parent, c * _fp_ln(c))
    else:
        n_types = np.zeros(n, dtype=np.int64)
        sum_clnc = np.zeros(n, dtype=np.int64)
    # n_tok >= 1 always ('' tokenizes to ['']), so _fp_ln is defined
    # and the float division below never sees 0
    ent_fp = n_tok * _fp_ln(np.maximum(n_tok, 1)) - sum_clnc
    return pa.table(
        {
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "entropy_fp": pa.array(ent_fp, pa.int64()),
            "entropy": pa.array(ent_fp / (1e7 * n_tok), pa.float64()),
        }
    )


def token_entropy(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (id, n_tokens, n_types, entropy_fp, entropy) — see
    :func:`entropy_batch`.  Streaming map, no shuffle."""
    return ds.map_batches(
        lambda b: entropy_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def bigram_counts_partial(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-block partial bigram counts: (gram, n) — one row per DISTINCT
    bigram in the block, however often it repeats.

    Tokenization is the engine-wide single-space contract (the same one
    ``top_tokens`` / ``string_split(text, ' ')`` pin). Adjacent-pair
    construction is fully vectorized: the flattened token child array is
    indexed with numpy left/right position vectors derived from the list
    lengths — no per-row Python.

    Scale shape (the KenLM / CCNet count-table build): the corpus-sized
    bigram stream collapses to per-block distinct rows HERE, so the one
    global ``groupby(gram).sum`` shuffle moves only the block-distinct
    vocabulary, never one row per occurrence — the Zipf head costs one
    row per block.
    """
    txt = pc.fill_null(batch.column(text_col), "")
    lists = pc.split_pattern(txt, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    m = np.maximum(lens - 1, 0)
    total = int(m.sum())
    empty = pa.table(
        {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if total == 0:
        return empty
    starts = np.cumsum(lens) - lens
    # left[i] enumerates, for every row, positions start .. start+len-2
    left = np.repeat(starts, m) + (
        np.arange(total) - np.repeat(np.cumsum(m) - m, m)
    )
    li = pa.array(left)
    ri = pa.array(left + 1)
    grams = pc.binary_join_element_wise(flat.take(li), flat.take(ri), " ")
    part = pa.TableGroupBy(pa.table({"gram": grams}), "gram").aggregate(
        [("gram", "count")]
    )
    name_map = {"gram": "gram", "gram_count": "n"}
    part = part.rename_columns([name_map[c] for c in part.column_names])
    return part.set_column(
        part.schema.get_field_index("n"),
        "n",
        pc.cast(part.column("n"), pa.int64()),
    )


def bigram_counts(ds, *, min_count: int = 2, text_col: str = "text"):
    """Distributed bigram count table with a min-count prune — the
    n-gram-LM / CCNet count-table build (Heafield, KenLM, ACL 2011
    family) over the corpus.

    partial counts per block (see :func:`bigram_counts_partial`) → ONE
    narrow (gram, n) groupby sum → streaming ``n >= min_count`` filter.
    The prune runs AFTER the global sum (a bigram rare in every block
    can still clear the global threshold), exactly like the SQL
    ``HAVING``.
    """
    parts = ds.map_batches(
        lambda b: bigram_counts_partial(b, text_col=text_col),
        batch_format="pyarrow",
    )
    agg = parts.groupby("gram").sum("n")

    def finish(b: pa.Table) -> pa.Table:
        t = b.rename_columns(["gram", "n"])
        t = t.set_column(
            t.schema.get_field_index("n"),
            "n",
            pc.cast(t.column("n"), pa.int64()),
        )
        return t.filter(pc.greater_equal(t.column("n"), min_count))

    return agg.map_batches(finish, batch_format="pyarrow")


def _repair_mojibake(s: str) -> str:
    """ftfy-style single-step repair of UTF-8-read-as-Latin-1 mojibake:
    re-encode as Latin-1 and re-decode as UTF-8; keep the original
    unless BOTH steps succeed over the whole string (the conservative
    fully-consistent rule -- real Latin-1 text is invalid UTF-8 and
    passes through untouched)."""
    try:
        b = s.encode("latin-1")
    except UnicodeEncodeError:
        return s
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return s


def fix_mojibake_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Repair mojibake text columns (the web-crawl encoding-hygiene
    step). Vectorized prefilter: only rows containing U+0080-U+00FF
    codepoints (the mojibake signature -- impossible in clean ASCII,
    and the only codepoints Latin-1 mis-decoding can produce) take the
    per-row repair path; clean blocks pass through zero-copy."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cand = pc.fill_null(
        pc.match_substring_regex(text, "[\u0080-\u00ff]"), False
    )
    n_cand = pc.sum(pc.cast(cand, pa.int64())).as_py() or 0
    if n_cand == 0:
        return batch
    # ONLY candidate rows cross into Python; the repaired values
    # scatter back with one replace_with_mask kernel — a block with one
    # dirty row pays per-row cost for one row, not the whole block
    repaired = pa.array(
        [_repair_mojibake(v) for v in text.filter(cand).to_pylist()],
        pa.string(),
    )
    return batch.set_column(
        batch.schema.get_field_index(text_col),
        text_col,
        pc.replace_with_mask(text, cand, repaired),
    )


def fix_mojibake(ds, *, text_col: str = "text"):
    """Streaming encoding repair over the corpus -- pure per-batch map,
    zero shuffle; see :func:`fix_mojibake_batch`."""
    return ds.map_batches(
        lambda b: fix_mojibake_batch(b, text_col=text_col),
        batch_format="pyarrow",
    )
