"""Deterministic training-mixture resampling over the documents table.

Given target mixture weights per language (the Pile / Llama-style
"data mixture" spec), downsample each language so the OUTPUT corpus
follows the target proportions while keeping as much data as possible:
the language with the scarcest supply relative to its weight keeps
100%, every other language keeps

    rate_l = (p_l * s) / n_l,   s = min_l (n_l / p_l)

Membership is a pure per-row hash decision — keep iff the 8-hex md5
prefix of ``lang|doc_id`` sorts below ``floor(rate_l * 2^32)`` in hex —
so the sample is reproducible across runs, machines, and partitionings,
and exactly mirrorable in SQL. Languages outside the spec are dropped
(the spec is a whitelist).

Scale shape (10^12 docs): phase 1 is a narrow ``(lang, count)``
groupby (tiny output, one combiner-backed shuffle); the thresholds —
one 8-hex string per language — ship inside the filter closure; phase
2 is a pure streaming per-batch filter with no shuffle. Nothing
document-shaped moves.

Float-parity note: the rate arithmetic runs on IEEE doubles in BOTH
engines with the same operand order (``min(n/p)`` then ``(p*s)/n``),
so thresholds are bit-identical; ``rate >= 1.0`` short-circuits the
keep-all case rather than relying on a 9-hex-digit threshold.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def mixture_thresholds(counts: dict[str, int],
                       targets: dict[str, float]) -> dict[str, str | None]:
    """Per-language 8-hex keep thresholds (None = keep all rows).

    ``counts`` may omit languages with zero rows; those trivially keep
    everything (vacuous). Raises on non-positive weights.
    """
    for lang, p in targets.items():
        if not p > 0:
            raise ValueError(f"mixture weight for {lang!r} must be > 0")
    s = None
    for lang, p in targets.items():
        n = counts.get(lang, 0)
        if n == 0:
            continue
        q = n / p
        s = q if s is None or q < s else s
    out: dict[str, str | None] = {}
    for lang, p in targets.items():
        n = counts.get(lang, 0)
        if n == 0 or s is None:
            out[lang] = None
            continue
        rate = (p * s) / n
        if rate >= 1.0:
            out[lang] = None
        else:
            out[lang] = format(math.floor(rate * 4294967296.0), "08x")
    return out


def mixture_sample(ds, targets: dict[str, float], *,
                   lang_col: str = "lang", id_col: str = "doc_id"):
    """Resample ``ds`` to the target language mixture (see module
    docstring). Returns the kept ``(id_col, lang_col)`` rows."""

    def lang_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": pc.fill_null(b.column(lang_col), "")})
        part = pa.TableGroupBy(t, "lang").aggregate([("lang", "count")])
        name_map = {"lang": "lang", "lang_count": "n"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    agg = ds.map_batches(lang_partial, batch_format="pyarrow").groupby(
        "lang"
    ).sum("n")
    counts = {r["lang"]: r["sum(n)"] for r in agg.take_all()}
    thresholds = mixture_thresholds(counts, targets)

    def keep(b: pa.Table) -> pa.Table:
        langs = b.column(lang_col).to_pylist()
        ids = b.column(id_col).to_pylist()
        mask = []
        for lang, i in zip(langs, ids):
            if lang not in thresholds or i is None:
                mask.append(False)
                continue
            t = thresholds[lang]
            if t is None:
                mask.append(True)
            else:
                h = hashlib.md5(f"{lang}|{i}".encode("utf-8")).hexdigest()[:8]
                mask.append(h < t)
        out = b.filter(pa.array(mask))
        return pa.table(
            {
                id_col: pc.cast(out.column(id_col), pa.int64()),
                lang_col: out.column(lang_col),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_sample(ds, *, lang_col: str = "lang",
                       id_col: str = "doc_id"):
    """mT5/mC4-style temperature rebalancing (arXiv:2010.11934 §3.1,
    alpha = 0.5) with EXACT per-language keep counts.

    Each language keeps its first

        k_l = floor(sqrt(n_l * n_min))

    documents in deterministic-shuffle order (md5(doc_id) asc, doc_id
    asc) — the geometric mean of the language's size and the smallest
    language's size, i.e. the alpha=0.5 temperature curve anchored so
    the scarcest language keeps everything and head languages are
    sqrt-compressed toward it. Unlike the per-row hash-threshold filter
    in :func:`mixture_sample`, the cut is an exact row COUNT, matching
    the paper's "sample k_l examples" semantics.

    Scale shape: the per-language counts are a narrow combiner-backed
    groupby; the within-language order statistic rides ONE
    ``rank.global_rank`` range-partition shuffle over a composite
    ``(lang_idx << 56) | md5_56(doc_id)`` int64 key — range bucketing
    splits hot languages across tasks (a ``groupby(lang).map_groups``
    would put an 80%-English corpus in one task), and the per-language
    rank is recovered by subtracting the broadcast language offsets.
    Nothing document-shaped shuffles twice; text never moves at all.

    Float-parity note: ``sqrt`` is IEEE-correctly-rounded in both
    engines, so ``floor(sqrt(double))`` is bit-identical to the SQL
    mirror for ``n_l * n_min < 2^53``.
    """
    from . import rank

    def lang_partial(b: pa.Table) -> pa.Table:
        # null langs are DROPPED, matching the SQL mirror's
        # JOIN ... USING (lang) (NULL never equi-joins) — they neither
        # sample nor shift n_min
        col = b.column(lang_col)
        t = pa.table({"lang": col.drop_null()})
        part = pa.TableGroupBy(t, "lang").aggregate([("lang", "count")])
        name_map = {"lang": "lang", "lang_count": "n"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    agg = ds.map_batches(lang_partial, batch_format="pyarrow").groupby(
        "lang"
    ).sum("n")
    counts = {r["lang"]: int(r["sum(n)"]) for r in agg.take_all()}
    if not counts:
        return ds.map_batches(
            lambda b: pa.table({
                id_col: pa.array([], pa.int64()),
                lang_col: pa.array([], pa.string()),
            }),
            batch_format="pyarrow",
        )
    if len(counts) > 128:
        # idx occupies bits 56..62; 128 langs exactly exhausts int64
        raise ValueError(
            f"temperature_sample: {len(counts)} languages > 128 — widen "
            "the composite-key layout (fewer md5 bits per key) first"
        )
    langs = sorted(counts)
    n_min = min(counts.values())
    lang_to_idx = {lang: i for i, lang in enumerate(langs)}
    k = np.array(
        [int(np.floor(np.sqrt(float(counts[lang] * n_min)))) for lang in langs],
        dtype=np.int64,
    )
    ns = np.array([counts[lang] for lang in langs], dtype=np.int64)
    offsets = np.cumsum(ns) - ns  # global-rank offset of each language

    def keyed(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(lang_col)))  # see lang_partial
        ids = pc.cast(b.column(id_col), pa.int64())
        langs_py = b.column(lang_col).to_pylist()
        idx = np.array(
            [lang_to_idx[l] for l in langs_py], dtype=np.int64,
        )
        # per-row md5 is the SQL-parity contract (DuckDB md5() mirror);
        # 14 hex digits = 56 bits so idx<<56 | key stays in int64
        keys = np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:14], 16)
                for i in ids.to_pylist()
            ],
            dtype=np.int64,
        )
        return pa.table({
            id_col: ids,
            "composite": pa.array((idx << np.int64(56)) | keys),
        })

    narrow = ds.map_batches(keyed, batch_format="pyarrow")
    ranked = rank.global_rank(
        narrow, key_col="composite", id_col=id_col, descending=False
    )
    idx_to_lang = pa.array(langs, pa.string())
    off_arr = offsets
    k_arr = k

    def keep(b: pa.Table) -> pa.Table:
        comp = b.column("composite").to_numpy(zero_copy_only=False)
        rk = b.column("rank").to_numpy(zero_copy_only=False)
        idx = comp >> np.int64(56)
        within = rk - off_arr[idx]
        mask = within < k_arr[idx]
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()).filter(
                pa.array(mask)
            ),
            lang_col: idx_to_lang.take(pa.array(idx[mask])),
        })

    return ranked.map_batches(keep, batch_format="pyarrow")
