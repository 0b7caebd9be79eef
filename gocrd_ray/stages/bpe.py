"""Distributed BPE tokenizer-merge training (Sennrich et al. 2016,
arXiv:1508.07909) — the "BPE-ish" token machinery a training-data
pipeline needs as a first-class corpus operator.

Scale shape (the production-trainer shape, cf. HuggingFace
``tokenizers``): merges are never learned from the raw token stream —
they are learned from the **word-frequency table**.

1. corpus → per-batch partial ``(word, n)`` counts (vectorized Arrow
   split, one partial row per distinct word per block) → ONE narrow
   ``groupby("word").sum`` — the only corpus-scale exchange; only
   per-block-distinct words shuffle, never occurrences.
2. exact global top-``max_types`` word types (count DESC, word ASC —
   deterministic tie-break) via sort+limit on the already-collapsed
   counts table.  At 10^12 docs the distinct-word table is still
   ~10^7-10^9 rows of a few bytes each; the cap bounds driver state.
3. the K merge iterations run driver-local over the bounded type
   table (O(K * total_chars_in_types)) — per-iteration corpus passes
   would be K full scans for no extra information.

Merge-application contract (must match the SQL mirror bit-for-bit):
symbols are joined by the separator ``SEP``; a merge ``(l, r)``
rewrites the padded string ``SEP+sym+SEP`` by TWO passes of
leftmost-nonoverlapping ``str.replace(SEP+l+SEP+r+SEP, SEP+l+r+SEP)``.
One pass alone drops every second occurrence of an adjacent chain
(the shared separator is consumed); after pass one the leftovers are
flanked by merged tokens, so pass two is always sufficient.  On
odd-length runs this yields e.g. ``aaaaa -> aa, a, aa`` (classic
strict-greedy gives ``aa, aa, a``) — a deterministic, documented
variant with identical training dynamics; DuckDB's ``replace`` has
the same leftmost-nonoverlapping semantics, which is what makes an
exact unrolled-CTE SQL oracle possible (see ``bpe_sql`` in
pipelines/queries.py).

Reference analog: gocrd has no tokenizer (the reference stops at text
accessors, page/page.go:197-204); this operator is part of the
[scale] LLM-data surface layered on the extracted text column.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

# ASCII Unit Separator: cannot appear inside a whitespace-split token
# of the synthetic corpus; train_bpe raises loudly if it ever does
# (a symbol containing SEP would corrupt the padded-replace framing).
SEP = "\x1f"

DEFAULT_MERGES = 8
DEFAULT_MAX_TYPES = 50_000

MERGES_SCHEMA = pa.schema(
    [
        ("step", pa.int64()),
        ("left", pa.string()),
        ("right", pa.string()),
        ("pair_n", pa.int64()),
    ]
)


def word_type_counts(ds, max_types: int = DEFAULT_MAX_TYPES):
    """Exact top-``max_types`` word types by corpus frequency.

    Words = non-empty single-space-split tokens (the repo-wide token
    contract, same as top_tokens / distinct_tokens_exact).  Per-batch
    partials collapse occurrences before the shuffle; the groupby
    output is the distinct-word table, then an exact global top-k
    (count DESC, word ASC).  Returns a Dataset of (word, n).
    """

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b.column("text"), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"word": toks})
        part = pa.TableGroupBy(t, "word").aggregate([("word", "count")])
        name_map = {"word": "word", "word_count": "n"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("word").sum("n")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["word", "n"])

    counts = agg.map_batches(rename, batch_format="pyarrow")
    return counts.sort(["n", "word"], descending=[True, False]).limit(max_types)


def apply_merge(sym: str, left: str, right: str, sep: str = SEP) -> str:
    """Two-pass padded replace — the merge-application contract."""
    pad = sep + sym + sep
    pat = sep + left + sep + right + sep
    rep = sep + left + right + sep
    return pad.replace(pat, rep).replace(pat, rep)[1:-1]


def train_bpe(
    word_counts: pa.Table,
    n_merges: int = DEFAULT_MERGES,
    sep: str = SEP,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a bounded (word, n) table.

    Driver-local by design (see module docstring): the input is the
    capped word-type table, not the corpus.  Pair counting includes
    overlapping occurrences (classic BPE); argmax tie-break is
    (count DESC, left ASC, right ASC) — identical to the SQL mirror.
    Raises if a word contains ``sep`` (framing corruption) or the
    pair table runs dry before ``n_merges`` steps (contract: callers
    pick ``n_merges`` << corpus symbol diversity).
    """
    words = word_counts.column("word").to_pylist()
    ns = word_counts.column("n").to_pylist()
    for w in words:
        if sep in w:
            raise ValueError(
                f"word type contains the BPE separator U+{ord(sep):04X}: {w!r}; "
                "pick a separator absent from the token alphabet"
            )
    types = [(sep.join(w), int(n)) for w, n in zip(words, ns)]

    steps: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for sym, n in types:
            arr = sym.split(sep)
            for a, b in zip(arr, arr[1:]):
                counts[(a, b)] += n
        if not counts:
            raise ValueError(
                f"BPE pair table ran dry at step {step}/{n_merges}: "
                "every word type is a single symbol; lower n_merges"
            )
        (left, right), pair_n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        steps.append((step, left, right, pair_n))
        types = [(apply_merge(s, left, right, sep), n) for s, n in types]

    return pa.table(
        {
            "step": pa.array([s[0] for s in steps], pa.int64()),
            "left": pa.array([s[1] for s in steps], pa.string()),
            "right": pa.array([s[2] for s in steps], pa.string()),
            "pair_n": pa.array([s[3] for s in steps], pa.int64()),
        },
        schema=MERGES_SCHEMA,
    )


def frame_texts(texts, sep: str = SEP):
    """Vectorized doc → framed symbol string (all Arrow RE2 kernels).

    Contract (shared with the SQL mirror): collapse space runs, trim
    spaces, put ``sep`` after every codepoint, rewrite the word joins
    ``sep+' '+sep`` to a DOUBLE separator, prepend one ``sep``.  Words
    are single-space-split non-empty tokens, exactly the train-side
    contract.  A merge pattern ``sep+l+sep+r+sep`` can never straddle
    a word boundary: the boundary carries two adjacent separators and
    symbols never contain ``sep``.  Null text frames like ''.
    """
    y = pc.utf8_trim(
        pc.replace_substring_regex(pc.fill_null(texts, ""), " +", " "), " "
    )
    z = pc.replace_substring_regex(y, "(?s)(.)", "\\1" + sep)
    w = pc.replace_substring(z, sep + " " + sep, sep + sep)
    return pc.binary_join_element_wise(pa.array([sep] * len(w)), w, "")


def token_counts_from_framed(framed, sep: str = SEP):
    """#tokens = count(sep) - count(sep+sep) - 1 on a framed string.

    Within-word separators S = symbols - words; each of the J = words-1
    joins holds two seps; plus the leading and final trailing sep:
    count(sep) = S + 2J + 2 and count(sep+sep) = J (a triple sep cannot
    occur — words are non-empty), so symbols = count - J - 1.  Every
    applied merge removes exactly one within-word sep and never forms
    a double sep, so the identity survives encoding.  Empty doc →
    framed == sep → 0.
    """
    c1 = pc.count_substring(framed, sep)
    c2 = pc.count_substring(framed, sep + sep)
    return pc.cast(
        pc.subtract(pc.subtract(c1, c2), 1), pa.int64()
    )


def encode_token_counts(ds, merges: pa.Table, id_col: str = "doc_id"):
    """Per-doc token count under the learned merge table — the
    token-counting pass you budget a training mix with.  Pure
    streaming map (no shuffle): 2 vectorized literal-replace passes
    per merge on the framed string, then the separator-count identity.
    The merge table is tiny (K rows) and rides the task closure."""
    pairs = list(
        zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
    )

    def batch(b: pa.Table) -> pa.Table:
        x = frame_texts(b.column("text"))
        for left, right in pairs:
            pat = SEP + left + SEP + right + SEP
            rep = SEP + left + right + SEP
            x = pc.replace_substring(x, pat, rep)
            x = pc.replace_substring(x, pat, rep)
        return pa.table(
            {id_col: b.column(id_col), "n_tokens": token_counts_from_framed(x)}
        )

    return ds.map_batches(batch, batch_format="pyarrow")


def bpe_merges(
    ds,
    n_merges: int = DEFAULT_MERGES,
    max_types: int = DEFAULT_MAX_TYPES,
) -> pa.Table:
    """End-to-end: corpus Dataset (text column) → learned merge table."""
    wc_blocks = word_type_counts(ds, max_types=max_types).to_arrow_refs()
    import ray

    parts = [p for p in ray.get(wc_blocks) if p.num_rows]
    wc = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    )
    # sort+limit already ordered the table; concat preserves block order
    return train_bpe(wc, n_merges=n_merges)
