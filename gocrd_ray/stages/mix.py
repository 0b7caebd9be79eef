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
