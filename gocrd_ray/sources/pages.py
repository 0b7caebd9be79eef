"""Pages-table sources.

Three ways to obtain the ``(url, warc_ts, html, text, lang)`` pages
Dataset (model.PAGES_SCHEMA):

* ``read_pages`` — read an existing Parquet pages table (the production
  path: at CC scale this is thousands of shards; ``read_parquet``
  splits them into blocks and the streaming executor pipelines
  read → extract → write).
* ``pages_from_documents`` — derive pages deterministically from the
  driver's ``documents`` table (regular structure; the DuckDB oracle
  mirror, pagegen.pages_batch_from_documents).
* ``synthetic_pages`` — seeded adversarial corpus of any size, built
  distributively from ``ray.data.range`` (pure function of (seed, id),
  so blocks generate independently on every node — no driver-side
  materialization at any scale).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .. import pagegen


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy). Parquet files written via
    pandas carry a pandas metadata dict that makes pa.Schema UNHASHABLE,
    so every Ray groupby reduce over such blocks logs "Failed to hash
    the schemas (for deduplication)" and pays the slow unify path —
    strip it right after the read."""
    return batch.replace_schema_metadata(None)


def read_parquet_clean(paths, **kwargs) -> ray.data.Dataset:
    """read_parquet + schema-metadata strip (see strip_schema_metadata)."""
    return ray.data.read_parquet(paths, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )


def read_pages(paths, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a Parquet pages table, pruning to ``columns`` at the read."""
    return read_parquet_clean(paths, columns=columns, **kwargs)


def pages_from_documents(
    sf_dir: str, *, override_num_blocks: int | None = None, concurrency=None
) -> ray.data.Dataset:
    """documents.parquet → pages Dataset (column-pruned read)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(
        pagegen.pages_batch_from_documents,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _corpus_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch.column("id").to_pylist()
    rows = [pagegen.gen_doc(i, seed) for i in ids]
    return pa.table(
        {
            name: pa.array([r[name] for r in rows], t)
            for name, t in zip(
                ("url", "warc_ts", "html", "text", "lang"),
                (pa.string(), pa.timestamp("us"), pa.binary(), pa.string(), pa.string()),
            )
        }
    )


def synthetic_pages(
    n_docs: int, seed: int = 42, *, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Adversarial synthetic corpus as a distributed Dataset."""
    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        _corpus_batch, fn_kwargs={"seed": seed}, batch_format="pyarrow"
    )
