"""gocrd_ray — a Ray-Data-native web-text / document extraction engine.

Re-creates the semantics of the reference gocrd library (finkf/gocrd:
PAGE-XML region/line/word hierarchies with reading-order resolution,
TextEquiv unification, coordinate/bbox handling, METS manifest-driven
file selection) as streaming ``ray.data.Dataset`` pipelines over Parquet
tables of Common-Crawl-style pages, designed for 10^12-document scale.

Layout:
    oracle       — pure-Python single-document reference semantics
                   (the correctness oracle; no Ray).
    pagegen      — deterministic synthetic corpus generators.
    model        — Arrow schemas and constants.
    functions/   — scalar kits (coords, bbox, spans, url, text stats).
    stages/      — map_batches stage functions / actor classes
                   (extract, explode, match, dedup, text analysis,
                   similarity, multimodal stubs).
    sources/     — readers (pages table, manifest table).
    pipelines/   — composed pipelines (flagship extract, checkpointed
                   resumable run, metrics).
    state/       — broadcast helpers (ray.put once, read per actor).

No module in this package calls ``ray.init()`` — sessions are owned by
the driver / bench / test fixtures.
"""

__version__ = "0.1.0"
