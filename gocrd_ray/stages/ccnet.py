"""CCNet-style per-language perplexity bucketing (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", arXiv:1911.00359 §4.4): split each language's corpus into
HEAD / MIDDLE / TAIL terciles by LM perplexity — head = the lowest-
perplexity (highest average log-probability) third, the slice CCNet
ships as its highest-quality cut.

Exactness contract: the per-document ordering key is the integer

    ppl_key = floor(-score_fp * SCALE / n_bigrams)      (n_bigrams > 0)
            = 0                                          (n_bigrams = 0)

over the bigram-LM ``score_fp`` of :mod:`gocrd_ray.stages.lm` (higher
key = higher perplexity = worse).  Tercile boundaries follow the
``quantile_disc`` convention: v_q = the key at 1-based position
ceil(q*n) in (key asc) order per language, with q*n evaluated in
float64 on both sides; bucket = head if key <= v(1/3), middle if
key <= v(2/3), else tail.  Equal keys always land in the same bucket
(a cutoff rule, not NTILE's tie-splitting), which is what makes the
result partitioning-independent.

Scale shape (10^12 docs): scoring is the lm.py streaming actor pool;
the narrow (id, lang, key) table is materialized ONCE and the
boundaries come from a histogram-refine scheme instead of any sort or
shuffle —

  pass A: per-block (lang, min, max, n) partials → driver merges
          O(langs) rows → per-language bin width W;
  pass B: per-block (lang, bin, n) partials with bin=(key-min)//W →
          driver merges ≤ langs × n_bins ints → the bin holding each
          boundary + the exact count below it (W == 1 resolves the
          boundary exactly here);
  pass C: stream ONLY rows inside boundary bins (expected n/n_bins per
          language) to the driver, sort those, read off the exact
          order statistic.  A loud cap guards adversarial skew.

Bucket assignment is then one streaming map with the O(langs) cutoff
table in the closure.  ZERO all-to-all shuffles end to end.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import TRAIN_HEX, PerplexityScorer, train_bigram_lm

SCALE = 1000  # ppl_key fixed-point digits below the per-bigram average
_BOUNDARY_CAP = 2_000_000  # max boundary-bin rows pulled to the driver


class _LangScorer(PerplexityScorer):
    """PerplexityScorer that carries the language column through, so
    the narrow score table needs no join back to the corpus."""

    def __init__(self, model_ref, lang_col: str, **kw):
        super().__init__(model_ref, **kw)
        self.lang_col = lang_col

    def __call__(self, b: pa.Table) -> pa.Table:
        out = super().__call__(b)
        return out.append_column(self.lang_col, b.column(self.lang_col))


def _keyed_scores(docs, *, text_col, id_col, lang_col, sample_hex):
    """Materialized narrow (id, lang, ppl_key) Dataset."""
    model_ref, _ = train_bigram_lm(
        docs, text_col=text_col, id_col=id_col, sample_hex=sample_hex
    )
    scored = docs.map_batches(
        _LangScorer,
        fn_constructor_kwargs={
            "model_ref": model_ref, "lang_col": lang_col,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def keyed(b: pa.Table) -> pa.Table:
        s = b.column("score_fp").to_numpy(zero_copy_only=False)
        n = b.column("n_bigrams").to_numpy(zero_copy_only=False)
        key = np.zeros(len(b), dtype=np.int64)
        nz = n > 0
        # numpy // floors (SQL mirror uses the explicit mod formula
        # because DuckDB's // truncates toward zero)
        key[nz] = (-s[nz] * SCALE) // n[nz]
        return pa.table(
            {
                id_col: b.column(id_col),
                lang_col: b.column(lang_col),
                "ppl_key": pa.array(key, pa.int64()),
            }
        )

    # materialized once: consumed by passes A, B, C and the final
    # assignment scan — a lazy dataset would re-run scoring per pass
    return scored.map_batches(keyed, batch_format="pyarrow").materialize()


def _tercile_cuts(narrow, *, lang_col, n_bins):
    """{lang: (v1, v2)} exact per-language tercile boundary keys."""

    def pass_a(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(b, lang_col).aggregate(
            [("ppl_key", "min"), ("ppl_key", "max"), ("ppl_key", "count")]
        )
        return t.rename_columns([lang_col, "mn", "mx", "n"])

    stats: dict[str, list] = {}
    for blk in narrow.map_batches(
        pass_a, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for r in blk.to_pylist():
            s = stats.setdefault(r[lang_col], [r["mn"], r["mx"], 0])
            s[0] = min(s[0], r["mn"])
            s[1] = max(s[1], r["mx"])
            s[2] += r["n"]

    width = {
        lang: max(1, (mx - mn + n_bins) // n_bins)
        for lang, (mn, mx, _) in stats.items()
    }

    def pass_b(b: pa.Table) -> pa.Table:
        outs = {"lang": [], "bin": [], "n": []}
        langs = np.asarray(b.column(lang_col).to_pylist(), dtype=object)
        keys = b.column("ppl_key").to_numpy(zero_copy_only=False)
        for lg in np.unique(langs) if len(langs) else ():
            mask = langs == lg
            mn, w = stats[lg][0], width[lg]
            bins = (keys[mask] - mn) // w
            agg = np.bincount(bins)
            nzb = np.flatnonzero(agg)
            outs["lang"].extend([lg] * len(nzb))
            outs["bin"].extend(nzb.tolist())
            outs["n"].extend(agg[nzb].tolist())
        return pa.table({
            "lang": pa.array(outs["lang"], pa.string()),
            "bin": pa.array(outs["bin"], pa.int64()),
            "n": pa.array(outs["n"], pa.int64()),
        })

    hist: dict[str, np.ndarray] = {
        lang: np.zeros(n_bins + 1, dtype=np.int64) for lang in stats
    }
    for blk in narrow.map_batches(
        pass_b, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for r in blk.to_pylist():
            hist[r["lang"]][r["bin"]] += r["n"]

    # locate the bin holding each boundary position (quantile_disc:
    # 1-based position ceil(q*n), q*n evaluated in float64)
    need: dict[str, dict] = {}
    for lang, h in hist.items():
        n = stats[lang][2]
        cum = np.cumsum(h)
        for q, tag in ((1.0 / 3.0, "v1"), (2.0 / 3.0, "v2")):
            k = max(1, math.ceil(q * n))
            b_idx = int(np.searchsorted(cum, k))
            before = int(cum[b_idx - 1]) if b_idx else 0
            need.setdefault(lang, {})[tag] = (b_idx, k - before)

    cuts: dict[str, list] = {lang: [None, None] for lang in stats}
    pull: dict[tuple, tuple] = {}
    for lang, d in need.items():
        mn, w = stats[lang][0], width[lang]
        for ti, tag in enumerate(("v1", "v2")):
            b_idx, rank_in_bin = d[tag]
            if w == 1:
                # bin == key: the histogram already resolved it
                cuts[lang][ti] = stats[lang][0] + b_idx
            else:
                pull[(lang, b_idx)] = pull.get((lang, b_idx), ()) + (
                    (ti, rank_in_bin),
                )

    if pull:
        pull_n = 0

        def pass_c(b: pa.Table) -> pa.Table:
            langs = np.asarray(b.column(lang_col).to_pylist(), dtype=object)
            keys = b.column("ppl_key").to_numpy(zero_copy_only=False)
            sel = np.zeros(len(keys), dtype=bool)
            for lg in np.unique(langs) if len(langs) else ():
                wanted = {b_ for (l_, b_) in pull if l_ == lg}
                if not wanted:
                    continue
                mask = langs == lg
                bins = (keys[mask] - stats[lg][0]) // width[lg]
                sel[mask] = np.isin(bins, sorted(wanted))
            return pa.table({
                "lang": pa.array(langs[sel].tolist(), pa.string()),
                "ppl_key": pa.array(keys[sel], pa.int64()),
            })

        bucket_vals: dict[tuple, list] = {k: [] for k in pull}
        for blk in narrow.map_batches(
            pass_c, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            pull_n += blk.num_rows
            if pull_n > _BOUNDARY_CAP:
                raise RuntimeError(
                    "ccnet_buckets: boundary bins exceed "
                    f"{_BOUNDARY_CAP} rows (extreme key skew) — raise "
                    "n_bins so the histogram isolates the boundary "
                    "more tightly"
                )
            for r in blk.to_pylist():
                lg, k = r["lang"], r["ppl_key"]
                bucket_vals[(lg, int((k - stats[lg][0]) // width[lg]))
                            ].append(k)
        for (lg, b_idx), targets in pull.items():
            vs = sorted(bucket_vals[(lg, b_idx)])
            for ti, rank_in_bin in targets:
                cuts[lg][ti] = vs[rank_in_bin - 1]

    return {lang: (v[0], v[1]) for lang, v in cuts.items()}


def ccnet_buckets(docs, *, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang", sample_hex: str = TRAIN_HEX,
                  n_bins: int = 4096):
    """Dataset of (id, lang, ppl_key, bucket∈{head,middle,tail}) —
    CCNet's per-language perplexity tercile split.  See module
    docstring for the exactness contract and scale shape."""
    narrow = _keyed_scores(
        docs, text_col=text_col, id_col=id_col,
        lang_col=lang_col, sample_hex=sample_hex,
    )
    cuts = _tercile_cuts(narrow, lang_col=lang_col, n_bins=n_bins)

    def assign(b: pa.Table) -> pa.Table:
        langs = np.asarray(b.column(lang_col).to_pylist(), dtype=object)
        keys = b.column("ppl_key").to_numpy(zero_copy_only=False)
        if len(langs):
            u, inv = np.unique(langs, return_inverse=True)
            v1 = np.array([cuts[lg][0] for lg in u], np.int64)[inv]
            v2 = np.array([cuts[lg][1] for lg in u], np.int64)[inv]
            names = np.array(["head", "middle", "tail"], dtype=object)
            out = names[
                np.where(keys <= v1, 0, np.where(keys <= v2, 1, 2))
            ]
        else:
            out = np.zeros(0, dtype=object)
        return b.append_column(
            "bucket", pa.array(out.tolist(), pa.string())
        )

    return narrow.map_batches(assign, batch_format="pyarrow")
