"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the gocrd_ray library ever calls ``ray.init()`` /
``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-derived
    pages → streaming extraction (text + spans + counts)."""
    from gocrd_ray.pipelines.extract_pipeline import extract_pages
    from gocrd_ray.sources.pages import pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    return extract_pages(pages, mode="text")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ the [scale] training-data operators)."""
    from gocrd_ray.pipelines.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for sketch/heuristic ops
    that have no faithful ANSI-SQL form → rows-only check)."""
    from gocrd_ray.pipelines.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
