"""Flagship extraction pipeline: pages Dataset → extracted text/spans.

Ray-Data-first shape (SURVEY.md §3.1): the whole reference traversal
(page.Open → Regions → Lines → Words → TextEquiv, page/page.go:69-290)
collapses into ONE ``map_batches`` stage over zero-copy Arrow batches.
The streaming executor pipelines read → extract → write with
backpressure; no stage materializes the corpus.

Scale notes (north_rule):
* ``html`` is dropped right after extraction — the widest column never
  travels further than one stage.
* the extractor is offered both as a plain function (stateless tasks,
  default — XML extraction needs no per-worker state) and as the
  ``PageExtractor`` callable class (actor pool) for when stateful
  machinery (boilerplate classifier, layout models) is attached:
  compile-once in ``__init__``, pure per-batch ``__call__``.
* poison rows are captured per-row in the ``error`` column
  (extract.extract_doc), so a task never dies on one bad document and
  retries stay idempotent.
* giant-HTML skew is handled by Ray Data's dynamic block splitting on
  output plus a bytes-capped ``batch_size``; ``salt_repartition`` is
  available when input shards themselves are pathologically skewed.
"""

from __future__ import annotations

import ray.data

from ..extract import extract_batch


class PageExtractor:
    """Actor-pool extraction stage (SURVEY.md §2.9).

    ``__init__`` runs once per actor — the place for compiled state
    (precompiled heuristic tables, classifier weights). ``__call__`` is
    pure per batch. Use with
    ``ds.map_batches(PageExtractor, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B, batch_format="pyarrow")``.
    """

    def __init__(self, mode: str = "text"):
        self.mode = mode
        # Stateful extraction machinery loads here, once per actor —
        # e.g. a boilerplate classifier's tag-heuristic tables. The
        # core XML kernel is stateless, so today this is only `mode`.

    def __call__(self, batch):
        return extract_batch(batch, mode=self.mode)


def extract_pages(
    pages: ray.data.Dataset,
    *,
    mode: str = "text",
    batch_size: int | None = None,
    concurrency=None,
    drop_html: bool = True,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """pages Dataset → extraction Dataset (EXTRACT_*_SCHEMA).

    ``batch_size=None`` (default) maps whole blocks — block size is
    already byte-bounded by DataContext.target_max_block_size (128 MB),
    which is the right memory cap for variable-size HTML payloads.
    Forcing a small row-count batch_size measurably HURTS: rebatching
    500-row blocks into 64-row slices cost ~2x wall time at 32 CPUs
    (measured sf0.1: 7.5s → 3.6s). Giant rows are handled by dynamic
    block splitting on output, not by shrinking every batch.
    """
    # `html` never leaves this stage: extract_batch's output schema
    # excludes it, which is what keeps downstream blocks narrow.
    _ = drop_html
    if use_actors:
        return pages.map_batches(
            PageExtractor,
            fn_constructor_kwargs={"mode": mode},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 4),
            zero_copy_batch=True,
        )
    return pages.map_batches(
        extract_batch,
        fn_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,  # extract never mutates its input batch
    )


def salt_repartition(pages: ray.data.Dataset, num_blocks: int) -> ray.data.Dataset:
    """Explicit skew-busting repartition (north_rule).

    Only needed when input shards are pathologically skewed (e.g. one
    shard holding all the giant documents): an all-to-all move, so off
    by default — the streaming executor's per-task scheduling already
    absorbs ordinary skew.
    """
    return pages.repartition(num_blocks, shuffle=True)


def run_extract(
    pages: ray.data.Dataset,
    out_dir: str,
    *,
    mode: str = "text",
    **kwargs,
) -> None:
    """Streaming end-to-end run: extract and write Parquet.

    Output consumption via write_parquet keeps the pipeline streaming —
    nothing is collected on the driver.
    """
    extract_pages(pages, mode=mode, **kwargs).write_parquet(out_dir)
