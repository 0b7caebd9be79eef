"""Document-quality rule bundles from the published web-corpus
pipelines: the Gopher rules (Rae et al. 2021, Table A1) and C4-style
line filtering (Raffel et al. 2020, §2.2) — the standard pre-training
hygiene gates beyond the basic length/stopword signals in
``text_stats.quality_batch``.

Both stages are pure streaming per-batch maps (no shuffle, no state).
Every threshold comparison is INTEGER (cross-multiplied ratios, e.g.
mean word length ≥ 3 ⇔ ``sum_len ≥ 3·n_words``), so the SQL mirrors
are exact with no float tolerance anywhere.

Deviations from the papers, stated honestly: the stop-word set
defaults to the corpus-appropriate ``text_stats.STOPWORDS`` (the
papers' English-only sets would vacuously fail every non-English
document of this multilingual corpus); symbol counts cover ``#`` and
``...``/``…`` as in Gopher; C4's "three-sentence span" dedup lives in
``stages/dedup.paragraph`` + ``stages/substring``, not here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import STOPWORDS

BULLET_PREFIXES = ("- ", "* ", "•")
# must stay RE2-compatible and byte-identical between engines
TERMINAL_PUNCT_RE = r'[.!?"]$'
WORD_SPLIT_RE = r"[ \n]"


def _scatter_sum(n: int, parents: np.ndarray, vals: np.ndarray) -> np.ndarray:
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, parents, vals.astype(np.int64))
    return out


def gopher_rules_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    stopwords: tuple = STOPWORDS,
    min_stopwords: int = 2,
) -> pa.Table:
    """Per-document Gopher rule evaluation. Returns the raw counts,
    one boolean per rule, and the conjunction ``keep``."""
    n = len(batch)
    text = pc.fill_null(batch.column(text_col), "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    words = pc.split_pattern_regex(text, WORD_SPLIT_RE)
    flat = pc.list_flatten(words)
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    n_words = pc.cast(pc.list_value_length(words), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_len = _scatter_sum(n, parents, lens)
    alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha = _scatter_sum(n, parents, alpha)

    n_stop = np.zeros(n, dtype=np.int64)
    for sw in stopwords:
        hit = pc.equal(flat, sw).to_numpy(zero_copy_only=False)
        present = np.zeros(n, dtype=bool)
        present[parents[hit]] = True
        n_stop += present

    n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
    n_ell = pc.add(
        pc.count_substring(text, "..."), pc.count_substring(text, "…")
    ).to_numpy(zero_copy_only=False)

    lines = pc.split_pattern(text, "\n")
    lflat = pc.list_flatten(lines)
    lparents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_lines = pc.cast(pc.list_value_length(lines), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    bullet = None
    for p in BULLET_PREFIXES:
        b = pc.starts_with(lflat, p)
        bullet = b if bullet is None else pc.or_(bullet, b)
    n_bullet = _scatter_sum(
        n, lparents, bullet.to_numpy(zero_copy_only=False)
    )
    ell_end = pc.or_(
        pc.ends_with(lflat, "..."), pc.ends_with(lflat, "…")
    ).to_numpy(zero_copy_only=False)
    n_ell_lines = _scatter_sum(n, lparents, ell_end)

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mean = (sum_len >= min_mean_len * n_words) & (
        sum_len <= max_mean_len * n_words
    )
    r_sym = 10 * (n_hash + n_ell) <= n_words
    r_bullet = 10 * n_bullet <= 9 * n_lines
    r_ellip = 10 * n_ell_lines <= 3 * n_lines
    r_alpha = 5 * n_alpha >= 4 * n_words
    r_stop = n_stop >= min_stopwords
    keep = (
        r_words & r_mean & r_sym & r_bullet & r_ellip & r_alpha & r_stop
    )
    return pa.table(
        {
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "sum_word_len": pa.array(sum_len, pa.int64()),
            "n_alpha_words": pa.array(n_alpha, pa.int64()),
            "n_stopwords_distinct": pa.array(n_stop, pa.int64()),
            "n_symbols": pa.array(
                (n_hash + n_ell).astype(np.int64), pa.int64()
            ),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_bullet_lines": pa.array(n_bullet, pa.int64()),
            "n_ellipsis_lines": pa.array(n_ell_lines, pa.int64()),
            "r_words": pa.array(r_words, pa.bool_()),
            "r_mean_len": pa.array(r_mean, pa.bool_()),
            "r_symbol": pa.array(r_sym, pa.bool_()),
            "r_bullet": pa.array(r_bullet, pa.bool_()),
            "r_ellipsis": pa.array(r_ellip, pa.bool_()),
            "r_alpha": pa.array(r_alpha, pa.bool_()),
            "r_stopwords": pa.array(r_stop, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def gopher_rules(ds, **kw):
    return ds.map_batches(
        lambda b: gopher_rules_batch(b, **kw), batch_format="pyarrow"
    )


def c4_line_filter_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
) -> pa.Table:
    """C4-style line filter: keep lines that end in terminal
    punctuation AND have at least ``min_line_words`` words; rebuild the
    document from the kept lines. Returns
    ``(doc_id, text_clean, n_lines, n_kept)``."""
    n = len(batch)
    text = pc.fill_null(batch.column(text_col), "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(text, "\n")
    lflat = lines.values if not isinstance(lines, pa.ChunkedArray) else (
        lines.combine_chunks().values
    )
    lparents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_lines = pc.cast(pc.list_value_length(lines), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    terminal = pc.match_substring_regex(lflat, TERMINAL_PUNCT_RE)
    wc = pc.add(pc.count_substring(lflat, " "), 1)
    keep = pc.and_(
        terminal, pc.greater_equal(wc, min_line_words)
    ).to_numpy(zero_copy_only=False)
    n_kept = _scatter_sum(n, lparents, keep)
    kept_lines = np.asarray(lflat.to_pylist(), dtype=object)[keep]
    kept_parents = lparents[keep]
    bounds = np.searchsorted(kept_parents, np.arange(n + 1))
    texts = [
        "\n".join(kept_lines[bounds[i]:bounds[i + 1]]) for i in range(n)
    ]
    return pa.table(
        {
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "text_clean": pa.array(texts, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
        }
    )


def c4_line_filter(ds, **kw):
    return ds.map_batches(
        lambda b: c4_line_filter_batch(b, **kw), batch_format="pyarrow"
    )


# Deterministic stand-in for C4's "List of Dirty, Naughty, Obscene or
# Otherwise Bad Words" (the operator is list-agnostic; the real list is
# a drop-in replacement). "dup" exists in the synthetic vocabulary so
# the drop path exercises at every sf; the others pin the zero-hit path.
C4_BADWORDS = ("dup", "darknet", "lorem")


def badwords_filter_batch(
    b: pa.Table,
    badwords=C4_BADWORDS,
    text_col: str = "text",
) -> pa.Table:
    """C4 §2.2 bad-word DOCUMENT filter (Raffel et al. 2020): drop any
    page containing a blocklisted word. Matching is C4's: lowercase,
    then exact whitespace-token membership (never substring — "dupe"
    does not match "dup"). Null text is dropped (a NULL page can't be
    certified clean; mirrors SQL's NULL-predicate row drop).

    Fully vectorized: one utf8_lower + split per batch, one ``is_in``
    over the flattened token values, and a bincount scatter back to
    rows. Pure streaming map, zero shuffle; the word set rides the
    closure (fine to ~10^5 words — beyond that broadcast via ray.put
    into an actor pool __init__).
    """
    b = b.filter(pc.is_valid(b.column(text_col)))
    if len(b) == 0:
        return b
    value_set = pa.array(sorted(set(badwords)), pa.string())
    toks = pc.split_pattern(pc.utf8_lower(b.column(text_col)), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    hit = pc.is_in(toks.values, value_set=value_set).to_numpy(
        zero_copy_only=False
    )
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    bad = np.bincount(parents[hit], minlength=len(b)).astype(bool)
    return b.filter(pa.array(~bad))


def badwords_filter(ds, **kw):
    return ds.map_batches(
        lambda b: badwords_filter_batch(b, **kw), batch_format="pyarrow"
    )
