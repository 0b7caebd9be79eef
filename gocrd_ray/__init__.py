"""gocrd_ray — a Ray-Data-native web-text / document extraction engine.

Re-creates the semantics of the reference gocrd library (finkf/gocrd:
PAGE-XML region/line/word hierarchies with reading-order resolution,
TextEquiv unification, coordinate/bbox handling, METS manifest-driven
file selection) as streaming ``ray.data.Dataset`` pipelines over Parquet
tables of Common-Crawl-style pages, designed for 10^12-document scale.

Two API surfaces:

* **Single-document** (drop-in for reference users, no Ray):
  ``gocrd_ray.Page`` / ``Mets`` / ``Match`` / ``MetsMatch`` — the same
  Open/Regions/Lines/Words/TextEquivUnicodeAt/Find/Polygon surface as
  the Go reference, byte-identical semantics (gocrd_ray/oracle.py).
* **Corpus-scale** (Ray Data): ``extract_pages`` and the stage/pipeline
  modules — the same semantics batched over Arrow blocks.

Layout:
    oracle       — pure-Python single-document reference semantics
                   (also the correctness oracle; no Ray).
    extract      — the single-pass batch extraction kernel (hot path).
    pagegen      — deterministic synthetic corpus generators.
    model        — Arrow schemas and constants.
    functions/   — scalar kits (coords, bbox, spans, url, text stats).
    stages/      — map_batches stage functions / actor classes
                   (explode, match, dedup, similarity, text analysis,
                   windows, multimodal stubs).
    sources/     — readers (pages table, manifest table).
    pipelines/   — composed pipelines (flagship extract, resumable
                   checkpointed runs, metrics, driver query registry).
    state/       — broadcast helpers (ray.put once, read per actor).

No module in this package calls ``ray.init()`` — sessions are owned by
the driver / bench / test fixtures.
"""

from .oracle import Match, Mets, MetsMatch, Page  # single-document API

__all__ = ["Page", "Mets", "Match", "MetsMatch", "extract_pages"]
__version__ = "0.2.0"


def extract_pages(*args, **kwargs):
    """Corpus-scale extraction — see pipelines.extract_pipeline."""
    from .pipelines.extract_pipeline import extract_pages as _ep

    return _ep(*args, **kwargs)
