"""PipelineStep registry — the engine's user-extension surface
(SURVEY.md §2.11).

The reference's extension surface is its public interface set
(TextRegion interface + Match predicate objects, page/page.go:55-61,
83-88); the engine's is this registry: a step is a named
``(Dataset, **config) -> Dataset`` builder, and pipelines compose as
ordered step lists. Users plug in their own stages with ``@step`` and
compose them with the built-ins.

    from gocrd_ray.pipelines.steps import step, compose

    @step("my_filter")
    def my_filter(ds, *, min_words=10):
        return ds.map_batches(..., batch_format="pyarrow")

    out = compose(pages_ds, ["extract_full", "words_flat",
                             ("my_filter", {"min_words": 5})])
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable] = {}


def step(name: str) -> Callable:
    """Register a step builder under ``name`` (decorator)."""

    def deco(fn: Callable) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"step {name!r} already registered")
        _REGISTRY[name] = fn
        return fn

    return deco


def get_step(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown step {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def registered_steps() -> list[str]:
    return sorted(_REGISTRY)


def compose(ds, steps: list) -> Any:
    """Apply steps in order. Each element is a name or (name, config)."""
    for s in steps:
        name, cfg = s if isinstance(s, tuple) else (s, {})
        ds = get_step(name)(ds, **cfg)
    return ds


# -- built-ins ---------------------------------------------------------------


@step("extract_text")
def _extract_text(ds, **cfg):
    from .extract_pipeline import extract_pages

    return extract_pages(ds, mode="text", **cfg)


@step("extract_full")
def _extract_full(ds, **cfg):
    from .extract_pipeline import extract_pages

    return extract_pages(ds, mode="full", **cfg)


@step("regions_flat")
def _regions_flat(ds, **cfg):
    from ..stages import explode

    return explode.regions_flat(ds, **cfg)


@step("lines_flat")
def _lines_flat(ds, **cfg):
    from ..stages import explode

    return explode.lines_flat(ds, **cfg)


@step("words_flat")
def _words_flat(ds, **cfg):
    from ..stages import explode

    return explode.words_flat(ds, **cfg)


@step("dedup_url")
def _dedup_url(ds, **cfg):
    from ..stages import dedup

    return dedup.dedup_by_url(ds, **cfg)


@step("per_host_stats")
def _per_host_stats(ds, **cfg):
    from . import metrics

    return metrics.per_host_stats(ds, **cfg)


@step("langid")
def _langid(ds, **cfg):
    from ..stages.text_stats import LangId

    return ds.map_batches(
        LangId,
        fn_constructor_kwargs=cfg,
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


@step("strip_boilerplate")
def _strip_boilerplate(ds, **cfg):
    from ..stages import boilerplate

    return boilerplate.strip_boilerplate(ds, **cfg)


@step("tumbling_window")
def _tumbling_window(ds, **cfg):
    from ..stages import window

    return window.tumbling_window(ds, **cfg)


@step("quality_filter")
def _quality_filter(ds, *, min_tokens=5, max_stopword_ratio=0.9):
    """Keep documents passing basic quality gates (tokens + stopword
    ratio) — the standard pre-training corpus filter shape."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.text_stats import quality_batch

    def f(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        keep = pc.and_(
            pc.greater_equal(q.column("n_tokens"), min_tokens),
            pc.less_equal(q.column("stopword_ratio"), max_stopword_ratio),
        )
        return b.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


@step("sample")
def _sample(ds, *, fraction=0.01, seed=42):
    """Seeded QA sampling (SURVEY §2.5 O3)."""
    return ds.random_sample(fraction, seed=seed)


@step("sessionize")
def _sessionize(ds, **cfg):
    from ..stages import window

    return window.sessionize(ds, **cfg)


@step("hash_sample")
def _hash_sample(ds, **cfg):
    from ..stages import dedup

    return dedup.hash_sample(ds, **cfg)


@step("hash_split")
def _hash_split(ds, **cfg):
    from ..stages import dedup

    return dedup.hash_split(ds, **cfg)


@step("paragraph_dedup")
def _paragraph_dedup(ds, **cfg):
    from ..stages import dedup

    return dedup.paragraph_dedup(ds, **cfg)


@step("verified_neardup_pairs")
def _verified_neardup_pairs(ds, **cfg):
    from ..stages import dedup

    return dedup.verified_jaccard_pairs(ds, **cfg)


@step("pack_chunks")
def _pack_chunks(ds, **cfg):
    from ..stages.text_stats import pack_chunks

    return pack_chunks(ds, **cfg)


@step("canonicalize_url")
def _canonicalize_url(ds, *, col="url"):
    import pyarrow as pa

    from ..functions.scalars import canonicalize_urls

    def f(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index(col), col,
            canonicalize_urls(b.column(col)),
        )

    return ds.map_batches(f, batch_format="pyarrow")


@step("decode_images")
def _decode_images(ds, **cfg):
    from ..stages.multimodal import decode_images_real

    return decode_images_real(ds, **cfg)


@step("parse_pdfs")
def _parse_pdfs(ds, **cfg):
    from ..stages.pdf_layout import parse_pdfs

    return parse_pdfs(ds, **cfg)


@step("decontaminate")
def _decontaminate(ds, *, eval_ds, **cfg):
    """Flag rows sharing token n-grams with ``eval_ds`` (a Dataset of
    the held-out benchmark); filter ``contaminated == false`` next."""
    from ..stages.decontam import decontaminate

    return decontaminate(ds, eval_ds, **cfg)


@step("repetition_stats")
def _repetition_stats(ds, **cfg):
    from ..stages.repetition import repetition_stats

    return repetition_stats(ds, **cfg)


@step("redact_pii")
def _redact_pii(ds, **cfg):
    from ..stages.pii import redact_pii

    return redact_pii(ds, **cfg)


@step("normalize_text")
def _normalize_text(ds, **cfg):
    from ..stages.text_stats import normalize_text

    return normalize_text(ds, **cfg)


@step("global_rank")
def _global_rank(ds, **cfg):
    from ..stages.rank import global_rank

    return global_rank(ds, **cfg)


@step("bloom_blocklist")
def _bloom_blocklist(ds, *, blocked, key_col, **cfg):
    from ..stages.bloom import bloom_blocklist_filter

    return bloom_blocklist_filter(ds, blocked, key_col=key_col, **cfg)


@step("top_tokens_bounded")
def _top_tokens_bounded(ds, **cfg):
    from ..stages.heavyhitters import top_k_bounded

    return top_k_bounded(ds, **cfg)


@step("lm_perplexity")
def _lm_perplexity(ds, **cfg):
    from ..stages.lm import perplexity_scores

    return perplexity_scores(ds, **cfg)


@step("mixture_sample")
def _mixture_sample(ds, *, targets, **cfg):
    from ..stages.mix import mixture_sample

    return mixture_sample(ds, targets, **cfg)


@step("semantic_dedup")
def _semantic_dedup(ds, **cfg):
    from ..stages.similarity import semantic_dedup

    return semantic_dedup(ds, **cfg)


@step("inverted_index")
def _inverted_index(ds, **cfg):
    from ..stages.index import inverted_index

    return inverted_index(ds, **cfg)


@step("tfidf_topterms")
def _tfidf_topterms(ds, **cfg):
    from ..stages.index import tfidf_topterms

    return tfidf_topterms(ds, **cfg)


@step("gopher_rules")
def _gopher_rules(ds, **cfg):
    from ..stages.quality import gopher_rules

    return gopher_rules(ds, **cfg)


@step("c4_line_filter")
def _c4_line_filter(ds, **cfg):
    from ..stages.quality import c4_line_filter

    return c4_line_filter(ds, **cfg)
