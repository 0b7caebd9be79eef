"""Driver-facing query registry: every operator family from SURVEY.md §2
(plus the [scale] training-data operators) as a named callable
``(sf_dir) -> Dataset | pyarrow.Table``, each with a DuckDB-equivalent
SQL string where the semantics are ANSI-SQL-expressible.

The pages table is derived deterministically from the driver's
``documents`` table (pagegen.pages_batch_from_documents), whose regular
structure (words → lines of 8 → regions of 5 lines, fixed coordinate
arithmetic) makes every extraction property SQL-mirrorable. Column names
and integer widths (int64) are chosen to match DuckDB's output exactly.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .. import pagegen
from ..oracle import Match, MetsMatch
from ..sources import manifest as mf
from ..sources.pages import pages_from_documents, read_parquet_clean
from ..stages import boilerplate, dedup, explode, join, match, pii, similarity, text_stats, window
from . import metrics
from .extract_pipeline import extract_pages

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

URL_SQL = (
    "'https://h' || lpad((doc_id % 50)::VARCHAR, 2, '0') "
    "|| '.example.com/doc/' || doc_id::VARCHAR"
)
# replace every 8th space with \n → lines of 8 words (pagegen layout)
LINEBREAK_SQL = (
    r"regexp_replace({col}, '((?:\S+ ){{7}}\S+) ', '\1' || chr(10), 'g')"
)
STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in text_stats.STOPWORDS) + ")"


def _i64(t: pa.Table, cols: list[str]) -> pa.Table:
    arrays = []
    for name in t.column_names:
        c = t.column(name)
        arrays.append(pc.cast(c, pa.int64()) if name in cols else c)
    return pa.table(dict(zip(t.column_names, arrays)))


_FULL_CACHE: dict[str, tuple[str, object]] = {}


def _session_token() -> str:
    import ray

    try:
        # node id is fresh per ray.init cycle (job id is not)
        return ray.get_runtime_context().get_node_id()
    except Exception:
        return "no-session"


def _full(sf_dir: str):
    """Materialized full-extraction Dataset, memoized per sf_dir — several
    queries project different views of the same extraction; extracting
    once and fanning out the materialized blocks is the intended usage
    pattern (and what a real deployment would do). Keyed by the Ray job
    id so a shutdown+reinit in the same process never serves stale
    object refs."""
    token = _session_token()
    hit = _FULL_CACHE.get(sf_dir)
    if hit is not None and hit[0] == token:
        return hit[1]
    ds = extract_pages(pages_from_documents(sf_dir), mode="full").materialize()
    _FULL_CACHE[sf_dir] = (token, ds)
    return ds


# Loaders prune at the READ (columns= reaches the Parquet scan, so only
# the named columns' row-group bytes leave storage — r3 verdict #5).
# Defaults cover the overwhelmingly common consumers; queries needing
# more (lang / source / props / label) ask for it explicitly.

def _docs(sf_dir: str, columns: tuple = ("doc_id", "text")):
    from ..sources.pages import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=list(columns)
    )


def _events(sf_dir: str,
            columns: tuple = ("event_id", "ts", "user_id",
                              "event_type", "value")):
    from ..sources.pages import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=list(columns)
    )


def _emb(sf_dir: str, columns: tuple = ("vec_id", "embedding")):
    from ..sources.pages import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=list(columns)
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_extract_text(sf_dir: str):
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")

    def proj(b: pa.Table) -> pa.Table:
        return _i64(
            b.select(["url", "text", "n_regions", "n_lines", "n_words", "lang"]),
            ["n_regions", "n_lines", "n_words"],
        )

    return ext.map_batches(proj, batch_format="pyarrow")


SQL_EXTRACT_TEXT = f"""
SELECT {URL_SQL} AS url,
       {LINEBREAK_SQL.format(col='text')} AS text,
       (len(string_split(text, ' ')) + 39) // 40 AS n_regions,
       (len(string_split(text, ' ')) + 7) // 8 AS n_lines,
       len(string_split(text, ' ')) AS n_words,
       lang
FROM documents
"""


def q_regions_flat(sf_dir: str):
    view = explode.regions_flat(_full(sf_dir))

    def proj(b: pa.Table) -> pa.Table:
        return _i64(
            b.select(
                ["url", "region_id", "region_seq", "text", "n_lines",
                 "x0", "y0", "x1", "y1"]
            ),
            ["region_seq", "n_lines", "x0", "y0", "x1", "y1"],
        )

    return view.map_batches(proj, batch_format="pyarrow")


SQL_REGIONS_FLAT = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
), r AS (
  SELECT doc_id, w, nw, unnest(range((nw + 39) // 40)) AS k FROM d
), rr AS (
  SELECT *, least((k + 1) * 40, nw) - k * 40 AS nwr FROM r
)
SELECT {URL_SQL} AS url,
       'r_' || k::VARCHAR AS region_id,
       k AS region_seq,
       {LINEBREAK_SQL.format(col="array_to_string(w[(k*40+1):least((k+1)*40, nw)], ' ')")} AS text,
       (nwr + 7) // 8 AS n_lines,
       10::BIGINT AS x0,
       20 + 50 * (k * 5) AS y0,
       480::BIGINT AS x1,
       20 + 50 * (k * 5 + (nwr + 7) // 8 - 1) + 40 AS y1
FROM rr
"""


def q_lines_flat(sf_dir: str):
    view = explode.lines_flat(_full(sf_dir))

    def proj(b: pa.Table) -> pa.Table:
        return _i64(
            b.select(
                ["url", "region_id", "line_id", "line_seq", "text", "n_words",
                 "x0", "y0", "x1", "y1"]
            ),
            ["line_seq", "n_words", "x0", "y0", "x1", "y1"],
        )

    return view.map_batches(proj, batch_format="pyarrow")


SQL_LINES_FLAT = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
), l AS (
  SELECT doc_id, w, nw, unnest(range((nw + 7) // 8)) AS i FROM d
), ll AS (
  SELECT *, least((i + 1) * 8, nw) - i * 8 AS nwl FROM l
)
SELECT {URL_SQL} AS url,
       'r_' || (i // 5)::VARCHAR AS region_id,
       'tl_' || i::VARCHAR AS line_id,
       i % 5 AS line_seq,
       array_to_string(w[(i*8+1):least((i+1)*8, nw)], ' ') AS text,
       nwl AS n_words,
       10::BIGINT AS x0,
       20 + 50 * i AS y0,
       10 + 60 * (nwl - 1) + 50 AS x1,
       20 + 50 * i + 40 AS y1
FROM ll
"""


def q_words_flat(sf_dir: str):
    view = explode.words_flat(_full(sf_dir))

    def proj(b: pa.Table) -> pa.Table:
        return _i64(
            b.select(
                ["url", "region_id", "line_id", "word_id", "word_seq", "text",
                 "x0", "y0", "x1", "y1"]
            ),
            ["word_seq", "x0", "y0", "x1", "y1"],
        )

    return view.map_batches(proj, batch_format="pyarrow")


SQL_WORDS_FLAT = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
), u AS (
  SELECT doc_id, unnest(w) AS word, unnest(range(nw)) AS i FROM d
)
SELECT {URL_SQL} AS url,
       'r_' || ((i // 8) // 5)::VARCHAR AS region_id,
       'tl_' || (i // 8)::VARCHAR AS line_id,
       'w_' || (i // 8)::VARCHAR || '_' || (i % 8)::VARCHAR AS word_id,
       i % 8 AS word_seq,
       word AS text,
       10 + 60 * (i % 8) AS x0,
       20 + 50 * (i // 8) AS y0,
       10 + 60 * (i % 8) + 50 AS x1,
       20 + 50 * (i // 8) + 40 AS y1
FROM u
"""


def q_html_main_text(sf_dir: str):
    """General-HTML boilerplate strip (north_star M9): nav/footer/link-
    soup removed by text-density + tag-path heuristics; ground truth is
    by construction SQL-expressible (pagegen.html_page_from_words)."""
    import ray.data

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = docs.map_batches(
        pagegen.html_pages_batch_from_documents, batch_format="pyarrow"
    )
    ext = boilerplate.strip_boilerplate(pages)

    def proj(b: pa.Table) -> pa.Table:
        # the SQL mirror filters paragraphs (length >= 40) BEFORE its
        # GROUP BY, so a document with no qualifying paragraph has no
        # row there — drop the engine's empty-doc rows to keep parity
        # by construction on corpora with very short documents
        b = b.filter(pc.greater(b.column("n_content_blocks"), 0))
        return pa.table(
            {
                "url": b.column("url"),
                "main_text": b.column("main_text"),
                "n_content_blocks": pc.cast(
                    b.column("n_content_blocks"), pa.int64()
                ),
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


SQL_HTML_MAIN_TEXT = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
), p AS (
  SELECT doc_id, nw, w, unnest(range((nw + 39) // 40)) AS k FROM d
), pp AS (
  SELECT doc_id, k,
         array_to_string(w[(k*40+1):least((k+1)*40, nw)], ' ') AS para
  FROM p
)
SELECT {URL_SQL} AS url,
       string_agg(para, chr(10) ORDER BY k) AS main_text,
       count(*) AS n_content_blocks
FROM pp WHERE length(para) >= 40
GROUP BY doc_id
"""


def q_extract_links(sf_dir: str):
    """Outlink extraction over the generated HTML corpus; target list is
    fully determined by the generator (2 nav + 6 category links/doc)."""
    import ray.data

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = docs.map_batches(
        pagegen.html_pages_batch_from_documents, batch_format="pyarrow"
    )
    return boilerplate.extract_links(pages)


SQL_EXTRACT_LINKS = f"""
WITH l AS (
  SELECT doc_id, unnest(range(8)) AS link_seq FROM documents
)
SELECT {URL_SQL} AS url,
       CASE WHEN link_seq = 0 THEN '/'
            WHEN link_seq = 1 THEN '/about'
            ELSE '/cat/' || doc_id::VARCHAR || '/' || (link_seq - 2)::VARCHAR
       END AS target,
       link_seq
FROM l
"""


def q_doc_spans(sf_dir: str):
    """Per-region span offsets into doc_text — the north-star span
    output, SQL-checked end to end."""
    ext = _full(sf_dir)

    def explode_spans(b: pa.Table) -> pa.Table:
        spans = b.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parents = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        return pa.table(
            {
                "url": pc.take(b.column("url"), parents),
                "region_id": pc.struct_field(flat, "region_id"),
                "span_start": pc.cast(pc.struct_field(flat, "start"), pa.int64()),
                "span_end": pc.cast(pc.struct_field(flat, "end"), pa.int64()),
            }
        )

    return ext.map_batches(explode_spans, batch_format="pyarrow")


SQL_DOC_SPANS = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
), r AS (
  SELECT doc_id, nw, w, unnest(range((nw + 39) // 40)) AS k FROM d
), rr AS (
  SELECT doc_id, k,
         length(array_to_string(w[(k*40+1):least((k+1)*40, nw)], ' ')) AS rlen
  FROM r
), s AS (
  SELECT doc_id, k, rlen,
         (sum(rlen + 1) OVER (PARTITION BY doc_id ORDER BY k
                              ROWS UNBOUNDED PRECEDING) - rlen - 1)::BIGINT
           AS span_start
  FROM rr
)
SELECT {URL_SQL} AS url, 'r_' || k::VARCHAR AS region_id,
       span_start, span_start + rlen AS span_end
FROM s
"""


def q_region_word_counts(sf_dir: str):
    """Grouped aggregate over the exploded words view."""
    view = explode.words_flat(_full(sf_dir))
    agg = view.groupby(["url", "region_id"]).count()

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["url", "region_id", "n_words"])

    return agg.map_batches(rename, batch_format="pyarrow")


SQL_REGION_WORD_COUNTS = f"""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS nw FROM documents
), r AS (
  SELECT doc_id, nw, unnest(range((nw + 39) // 40)) AS k FROM d
)
SELECT {URL_SQL} AS url, 'r_' || k::VARCHAR AS region_id,
       least((k + 1) * 40, nw) - k * 40 AS n_words
FROM r
"""


def q_match_line(sf_dir: str):
    rows = match.match_rows(_full(sf_dir), Match(line_id="tl_3"))

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "region_id", "line_id", "text"])

    return rows.map_batches(proj, batch_format="pyarrow")


SQL_MATCH_LINE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
)
SELECT {URL_SQL} AS url,
       'r_0' AS region_id,
       'tl_3' AS line_id,
       array_to_string(w[25:least(32, nw)], ' ') AS text
FROM d
WHERE nw > 24
"""


def q_match_word(sf_dir: str):
    rows = match.match_rows(
        _full(sf_dir), Match(region_id="r_1", line_id="tl_5", word_id="w_5_2")
    )

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "region_id", "line_id", "word_id", "text"])

    return rows.map_batches(proj, batch_format="pyarrow")


SQL_MATCH_WORD = f"""
SELECT {URL_SQL} AS url,
       'r_1' AS region_id,
       'tl_5' AS line_id,
       'w_5_2' AS word_id,
       string_split(text, ' ')[43] AS text
FROM documents
WHERE len(string_split(text, ' ')) >= 43
"""


def q_corpus_stats(sf_dir: str):
    """One-row corpus rollup via per-batch partial aggregation."""
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_docs": pa.array([len(b)], pa.int64()),
                "total_regions": pa.array(
                    [pc.sum(b.column("n_regions")).as_py() or 0], pa.int64()
                ),
                "total_lines": pa.array(
                    [pc.sum(b.column("n_lines")).as_py() or 0], pa.int64()
                ),
                "total_words": pa.array(
                    [pc.sum(b.column("n_words")).as_py() or 0], pa.int64()
                ),
            }
        )

    parts = ext.map_batches(partial, batch_format="pyarrow")
    cols = ["n_docs", "total_regions", "total_lines", "total_words"]
    agg = parts.sum(cols)  # global scalar aggregate
    return pa.table({c: pa.array([agg[f"sum({c})"]], pa.int64()) for c in cols})


SQL_CORPUS_STATS = """
SELECT count(*) AS n_docs,
       sum((len(string_split(text, ' ')) + 39) // 40)::BIGINT AS total_regions,
       sum((len(string_split(text, ' ')) + 7) // 8)::BIGINT AS total_lines,
       sum(len(string_split(text, ' ')))::BIGINT AS total_words
FROM documents
"""


def q_per_host_stats(sf_dir: str):
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")
    return metrics.per_host_stats(ext)


SQL_PER_HOST_STATS = """
SELECT 'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') || '.example.com' AS host,
       count(*) AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS total_words,
       0::BIGINT AS n_errors
FROM documents
GROUP BY host
"""


def q_top_hosts(sf_dir: str):
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")
    return metrics.top_hosts(ext, 10)


SQL_TOP_HOSTS = """
SELECT 'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') || '.example.com' AS host,
       count(*) AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS total_words,
       0::BIGINT AS n_errors
FROM documents
GROUP BY host
QUALIFY row_number() OVER (ORDER BY n_docs DESC, host ASC) <= 10
"""


def q_manifest_find(sf_dir: str):
    man = mf.manifest_from_nation(sf_dir)
    return mf.manifest_find(man, MetsMatch(use="GRP_0", mime_type=mf.PAGE_MIME))


SQL_MANIFEST_FIND = f"""
SELECT 'GRP_' || (CASE WHEN n_nationkey % 3 = 2 THEN 0
                       ELSE n_nationkey % 3 END)::VARCHAR AS use,
       'F_' || n_nationkey::VARCHAR AS file_id,
       '{mf.PAGE_MIME}' AS mime_type,
       'URL' AS loc_type,
       'shards/part_' || lpad(n_nationkey::VARCHAR, 4, '0') || '.parquet' AS href
FROM nation
WHERE (CASE WHEN n_nationkey % 3 = 2 THEN 0 ELSE n_nationkey % 3 END) = 0
  AND n_nationkey % 2 = 0
"""


def q_lang_counts(sf_dir: str):
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")
    agg = ext.groupby("lang").count()

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["lang", "n_docs"])

    return agg.map_batches(rename, batch_format="pyarrow")


SQL_LANG_COUNTS = """
SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
"""


def q_dedup_url(sf_dir: str):
    # union the corpus with itself → every url twice → per-url dedup
    # restores exactly one row per url (union + groupby shuffle)
    pages = pages_from_documents(sf_dir)
    doubled = pages.union(pages_from_documents(sf_dir))
    deduped = dedup.dedup_by_url(doubled)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "lang"])

    return deduped.map_batches(proj, batch_format="pyarrow")


SQL_DEDUP_URL = f"""
SELECT {URL_SQL} AS url, lang FROM documents
"""


def q_dedup_url_latest(sf_dir: str):
    """Per-url keep-latest-crawl: the corpus unioned with a one-day-later
    re-crawl of every url must dedup to the re-crawl timestamps."""
    import datetime

    pages = pages_from_documents(sf_dir)

    def bump(b: pa.Table) -> pa.Table:
        ts = pc.add(
            b.column("warc_ts"),
            pa.scalar(datetime.timedelta(days=1), pa.duration("us")),
        )
        return b.set_column(b.schema.get_field_index("warc_ts"), "warc_ts", ts)

    recrawl = pages_from_documents(sf_dir).map_batches(
        bump, batch_format="pyarrow"
    )
    deduped = dedup.dedup_by_url(pages.union(recrawl), policy="latest")

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "warc_ts"])

    return deduped.map_batches(proj, batch_format="pyarrow")


SQL_DEDUP_URL_LATEST = f"""
SELECT {URL_SQL} AS url,
       TIMESTAMP '2026-01-01' + to_microseconds(doc_id * 1000000)
         + INTERVAL 1 DAY AS warc_ts
FROM documents
"""


def q_blocklist_filter(sf_dir: str):
    """Broadcast anti-join: exclude documents from blocklisted hosts
    (h00–h04) — the standard CC domain-exclusion stage."""
    blocked_hosts = {f"h{k:02d}.example.com" for k in range(5)}
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")

    def host_col(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b.column("url"), r"//(?P<host>[^/]+)/"), "host"
        )
        return b.append_column("host", host)

    with_host = ext.map_batches(host_col, batch_format="pyarrow")
    kept = mf.anti_join_blocklist(with_host, blocked_hosts, key="host")

    def proj(b: pa.Table) -> pa.Table:
        return _i64(b.select(["url", "host", "n_words"]), ["n_words"])

    return kept.map_batches(proj, batch_format="pyarrow")


SQL_BLOCKLIST_FILTER = f"""
SELECT {URL_SQL} AS url,
       'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') || '.example.com' AS host,
       len(string_split(text, ' ')) AS n_words
FROM documents
WHERE doc_id % 50 >= 5
"""


def q_dedup_exact(sf_dir: str):
    return dedup.exact_dedup(_docs(sf_dir))


def q_dedup_incremental(sf_dir: str):
    """Incremental crawl dedup: drop every NEW-snapshot document whose
    exact text (md5) already exists in the PREVIOUS snapshot — the
    standard new-crawl-vs-archive stage. The archive is the even docs;
    the new snapshot is the odd docs plus re-crawls of archive pages
    (doc_id < 40, re-tagged +1000000 — same dup-injection pattern as
    q_neardup_cosine, so the drop path is exercised at every sf). The
    archive digest set rides the Bloom + co-partitioned exact verify
    (bloom_blocklist_filter_ds): worker memory is bounded by the Bloom
    bits however large the archive — at 10^12 archived docs the
    digests NEVER broadcast."""
    from ..stages import bloom

    def _with_dig(b: pa.Table, out: str) -> pa.Table:
        # null text cannot match any digest: SQL's `md5(NULL) NOT IN`
        # is NULL -> row dropped; mirror that (and never crash a batch
        # on one malformed row — poison-row principle)
        b = b.filter(pc.is_valid(b.column("text")))
        digs = pa.array(
            [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in b.column("text").to_pylist()
            ],
            pa.string(),
        )
        return b.append_column(out, digs)

    docs = _docs(sf_dir)

    def old_snap(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return _with_dig(
            b.filter(pa.array(ids % 2 == 0)).select(["doc_id", "text"]),
            "dig",
        ).select(["dig"])

    def new_snap(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        odd = b.filter(pa.array(ids % 2 == 1)).select(["doc_id", "text"])
        recrawl = b.filter(pa.array((ids % 2 == 0) & (ids < 40)))
        recrawl = pa.table(
            {
                "doc_id": pc.add(recrawl.column("doc_id"), 1000000),
                "text": recrawl.column("text"),
            }
        )
        return _with_dig(pa.concat_tables([odd, recrawl]), "__dig")

    # materialize: bloom_blocklist_filter_ds consumes the blocked side
    # three times (count, bits build, verify union) — without this the
    # digest scan re-executes per consumer (lazy datasets re-run)
    old_digests = docs.map_batches(
        old_snap, batch_format="pyarrow"
    ).materialize()
    new_docs = docs.map_batches(new_snap, batch_format="pyarrow")
    kept = bloom.bloom_blocklist_filter_ds(
        new_docs, old_digests, key_col="__dig", blocked_col="dig"
    )
    return kept.map_batches(
        lambda b: b.drop_columns(["__dig"]), batch_format="pyarrow"
    )


def q_dedup_incremental_fuzzy(sf_dir: str):
    """FUZZY incremental crawl dedup: drop every new-snapshot doc that
    is a NEAR-duplicate (verified shingle Jaccard, 2·inter >= uni) of
    some archive doc — the asymmetric query-vs-archive LSH stage a
    rolling crawl runs after the exact digest pass. Composed from the
    scale paths: verified_jaccard_pairs over the union, cross-snapshot
    pairs only, Bloom + co-partitioned loser anti-join (the loser-id
    set never broadcasts). Snapshots simulated by doc_id parity.

    Keeps verified_jaccard_pairs' hot_mode="error" default: the loser
    rule consumes DIRECT cross-parity pairs, which star emission can
    miss (a hot bucket whose run-min is odd star-links odd members to
    the odd min, not to the even archive member), so above the cap
    this pipeline must fail loudly rather than silently under-drop;
    a components-based variant would tolerate star but has different
    (transitive) drop semantics than the SQL oracle."""
    import numpy as np

    from ..stages import bloom

    pairs = dedup.verified_jaccard_pairs(_docs(sf_dir))

    def cross_losers(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy(zero_copy_only=False)
        bb = b.column("id_b").to_numpy(zero_copy_only=False)
        cross = (a % 2) != (bb % 2)
        a, bb = a[cross], bb[cross]
        odd = np.where(a % 2 == 1, a, bb)
        return pa.table(
            {"key": pa.array([str(v) for v in odd], pa.string())}
        )

    # materialize: the ~6s verified-pairs chain would otherwise re-run
    # for each of the bloom helper's three consumers; the loser set is
    # tiny (bounded by near-dup count)
    losers = pairs.map_batches(
        cross_losers, batch_format="pyarrow"
    ).materialize()

    def new_snap(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 2 == 1)).select(["doc_id", "text"])
        return b.append_column(
            "__key", pc.cast(b.column("doc_id"), pa.string())
        )

    new_docs = _docs(sf_dir).map_batches(new_snap, batch_format="pyarrow")
    kept = bloom.bloom_blocklist_filter_ds(
        new_docs, losers, key_col="__key", blocked_col="key"
    )
    return kept.map_batches(
        lambda b: b.drop_columns(["__key"]), batch_format="pyarrow"
    )


SQL_DEDUP_INCREMENTAL = """
WITH new_snap AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 2 = 0 AND doc_id < 40
)
SELECT doc_id, text FROM new_snap
WHERE md5(text) NOT IN
      (SELECT md5(text) FROM documents
       WHERE doc_id % 2 = 0 AND text IS NOT NULL)
"""


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
FROM documents
GROUP BY md5(text)
"""


def q_ngram_jaccard(sf_dir: str):
    return dedup.ngram_jaccard_pairs(_docs(sf_dir))


SQL_NGRAM_JACCARD = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN
           list_distinct(list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         ELSE [array_to_string(w, ' ')] END AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.sh, b.sh)) AS inter,
       len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) > 0
  AND 2 * len(list_intersect(a.sh, b.sh))
      >= len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
"""


SQL_DEDUP_INCREMENTAL_FUZZY = (
    """
WITH p AS ("""
    + SQL_NGRAM_JACCARD.strip().rstrip()
    + """
)
SELECT doc_id, text FROM documents
WHERE doc_id % 2 = 1
  AND doc_id NOT IN (
    SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END FROM p
    WHERE (id_a % 2) != (id_b % 2)
  )
"""
)


def q_lineitem_agg(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with per-batch partial combine;
    money summed as integer cents for order-independent exactness."""
    import numpy as np
    import ray.data

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        qty = pa.array(
            np.round(b.column("l_quantity").to_numpy(zero_copy_only=False) * 100)
            .astype("int64"),
            pa.int64(),
        )
        price = pa.array(
            np.round(
                b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
            ).astype("int64"),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty_cents": qty,
                "price_cents": price,
            }
        )
        part = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("price_cents", "sum"), ("qty_cents", "count")]
        )
        name_map = {
            "l_returnflag": "l_returnflag",
            "l_linestatus": "l_linestatus",
            "qty_cents_sum": "sum_qty_cents",
            "price_cents_sum": "sum_price_cents",
            "qty_cents_count": "n_items",
        }
        return part.rename_columns([name_map[c] for c in part.column_names])

    agg = li.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).sum(["sum_qty_cents", "sum_price_cents", "n_items"])

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_cents", "sum_price_cents", "n_items"]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_cents,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_distinct_priorities(sf_dir: str):
    """ds.unique — distinct values of one column (a shuffle)."""
    import ray.data

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
    )
    vals = sorted(ds.unique("o_orderpriority"))
    return pa.table({"o_orderpriority": pa.array(vals, pa.string())})


SQL_DISTINCT_PRIORITIES = """
SELECT DISTINCT o_orderpriority FROM orders
"""


def q_filtered_read(sf_dir: str):
    """Predicate + column pushdown at the Parquet read (prune at the
    read: only two columns and matching row groups leave storage)."""
    import pyarrow.dataset as pads
    import ray.data

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag"],
        filter=pads.field("l_returnflag") == "R",
    )

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["l_orderkey", "l_linenumber"])

    return ds.map_batches(proj, batch_format="pyarrow")


SQL_FILTERED_READ = """
SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
"""


def q_pipeline_e2e(sf_dir: str):
    """The composed training-data pipeline: extract → quality filter →
    exact dedup (keep min url per text) → per-host counts. One SQL
    mirror checks the whole chain end to end."""
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")

    def keep_quality(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_words"), 20))
        return b.select(["url", "text"])

    filtered = ext.map_batches(keep_quality, batch_format="pyarrow")
    hashed = filtered.map_batches(
        lambda b: dedup.add_text_hash(b).select(["text_hash", "url"]),
        batch_format="pyarrow",
    )
    survivors = hashed.groupby("text_hash").min("url")

    def to_host(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b.column("min(url)"), r"//(?P<host>[^/]+)/"), "host"
        )
        t = pa.table({"host": host, "one": pa.nulls(len(b), pa.int64())})
        part = pa.TableGroupBy(t, "host").aggregate([("host", "count")])
        name_map = {"host": "host", "host_count": "n_docs"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    partials = survivors.map_batches(to_host, batch_format="pyarrow")
    agg = partials.groupby("host").sum("n_docs")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["host", "n_docs"])

    return agg.map_batches(rename, batch_format="pyarrow")


SQL_PIPELINE_E2E = f"""
WITH p AS (
  SELECT {URL_SQL} AS url, text
  FROM documents
  WHERE len(string_split(text, ' ')) >= 20
), d AS (
  SELECT md5(text) AS h, min(url) AS url FROM p GROUP BY md5(text)
)
SELECT regexp_extract(url, '//([^/]+)/', 1) AS host, count(*) AS n_docs
FROM d GROUP BY host
"""


def q_orders_enriched(sf_dir: str):
    """Broadcast join: big orders side, small customer dimension."""
    import pyarrow.parquet as pq
    import ray.data

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).rename_columns(["o_custkey", "c_name", "c_mktsegment"])
    out = join.broadcast_join(orders, cust, keys=["o_custkey"])

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["o_orderkey", "o_custkey", "c_name", "c_mktsegment"])

    return out.map_batches(proj, batch_format="pyarrow")


SQL_ORDERS_ENRICHED = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_orders_hash_join(sf_dir: str):
    """Same join through the both-sides-large partitioned hash join —
    one bucket-keyed shuffle, per-bucket Arrow hash join."""
    import ray.data

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    out = join.partitioned_hash_join(
        orders, cust, left_key="o_custkey", right_key="c_custkey", n_buckets=16
    )
    return out


SQL_ORDERS_HASH_JOIN = """
SELECT o_orderkey, o_custkey, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_orders_native_join(sf_dir: str):
    """Same join through Ray Data's built-in hash-partitioned
    Dataset.join — all three join implementations must agree."""
    import ray.data

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    out = join.native_join(
        orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=8
    )

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["o_orderkey", "o_custkey", "c_name"])

    return out.map_batches(proj, batch_format="pyarrow")


SQL_ORDERS_NATIVE_JOIN = SQL_ORDERS_HASH_JOIN


def q_events_asof(sf_dir: str):
    """As-of join: each purchase matched to the user's most recent
    signup at-or-before it."""
    import ray.data

    def typed(t):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("event_type"), t)).select(
                ["event_id", "ts", "user_id"]
            )
        return f

    ev = lambda: read_parquet_clean(  # noqa: E731
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    purchases = ev().map_batches(typed("purchase"), batch_format="pyarrow")
    signups = ev().map_batches(typed("signup"), batch_format="pyarrow")
    return join.asof_join_latest(
        purchases, signups, on="ts", by="user_id", right_cols=["event_id"]
    )


SQL_EVENTS_ASOF = """
SELECT p.event_id, p.ts, p.user_id,
       (SELECT s.event_id FROM events s
        WHERE s.user_id = p.user_id AND s.event_type = 'signup'
          AND s.ts <= p.ts
        ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS event_id_asof
FROM events p WHERE p.event_type = 'purchase'
"""


def q_events_range_join(sf_dir: str):
    """Range (interval) join — the join-family member between equality
    and as-of: each event pairs with EVERY campaign window whose
    [lo, hi) span contains it; windows overlap (1.5x the step), so an
    event can match two.  16 windows derived from the stream's own
    [min, max] span in exact integer epoch-microsecond arithmetic.
    The window table is the broadcast small side; the event stream
    never shuffles (stages/join.py interval_join_broadcast)."""
    import numpy as np

    ev = _events(sf_dir, columns=("event_id", "ts"))

    # bounds: per-block (min, max) partials, bounded take_all
    def bounds(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"t0": pa.array([], pa.int64()),
                             "t1": pa.array([], pa.int64())})
        ts = b.column("ts").cast(pa.int64())
        return pa.table({
            "t0": pa.array([pc.min(ts).as_py()], pa.int64()),
            "t1": pa.array([pc.max(ts).as_py()], pa.int64()),
        })

    parts = ev.map_batches(bounds, batch_format="pyarrow").take_all()
    t0 = min(r["t0"] for r in parts)
    t1 = max(r["t1"] for r in parts)
    step = (t1 - t0) // 16
    k = np.arange(16, dtype=np.int64)
    lo = t0 + k * step
    windows = pa.table({
        "window_id": pa.array(k, pa.int64()),
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(lo + step + step // 2, pa.int64()),
    })
    return join.interval_join_broadcast(
        ev, windows, ts_col="ts",
        left_cols=["event_id"], interval_cols=["window_id"],
    )


SQL_EVENTS_RANGE_JOIN = """
WITH b AS (
  SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events
), g AS (
  SELECT CAST(k AS BIGINT) AS window_id,
         t0 + k * ((t1 - t0) // 16) AS lo,
         t0 + k * ((t1 - t0) // 16)
           + ((t1 - t0) // 16) + ((t1 - t0) // 16) // 2 AS hi
  FROM b, range(16) r(k)
)
SELECT e.event_id, g.window_id
FROM events e JOIN g ON epoch_us(e.ts) >= g.lo AND epoch_us(e.ts) < g.hi
"""


def q_dedup_verified(sf_dir: str):
    """The scale path for near-dup dedup: LSH candidates verified with
    exact shingle Jaccard via co-partitioned lookup joins — equals the
    O(n²) oracle whenever LSH recall is 1 at the threshold (true here:
    every generator dup pair has J ≥ 0.9; miss prob ~1e-22 at r=2,
    bands=32 — see dedup.verified_jaccard_pairs)."""
    return dedup.verified_jaccard_pairs(_docs(sf_dir))


SQL_DEDUP_VERIFIED = SQL_NGRAM_JACCARD


def q_dedup_clusters(sf_dir: str):
    """Connected components over near-dup pairs. Consumes the VERIFIED
    LSH pairs (the composed path is the scale path — r01 verdict #2)
    through the DISTRIBUTED label-propagation loop (labels stay a
    Dataset; the driver sees one scalar per round — verdict #6); the
    recursive-CTE oracle stays valid because verified == exact
    all-pairs on this corpus (recall 1, see q_dedup_verified).

    hot_mode="star": components are the consumer, so hot LSH buckets
    (above dedup.HOT_RUN_CAP) may emit bounded star pairs — identical
    clusters in the hot-bucket regime (near-identical docs, where
    J(run_min, member) passes the verify for every member); below the
    cap emission is full pairwise, so this corpus is bit-unchanged."""
    pairs = dedup.verified_jaccard_pairs(_docs(sf_dir), hot_mode="star")
    return dedup.connected_components_distributed(pairs)


SQL_DEDUP_CLUSTERS = (
    """
WITH RECURSIVE p AS ("""
    + SQL_NGRAM_JACCARD.strip().rstrip()
    + """
), sym AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION SELECT id_b, id_a FROM p
), cc(node, lbl) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, c.lbl FROM sym s JOIN cc c ON c.node = s.b
)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY node
"""
)


def q_dedup_fuzzy_corpus(sf_dir: str):
    """The END-TO-END fuzzy-dedup user pipeline, composed entirely from
    the scale paths: MinHash-LSH candidates → exact-Jaccard verify
    (co-partitioned shingle lookups) → distributed connected components
    → drop every cluster member except the min-id representative via
    the Bloom + co-partitioned exact anti-join (the loser-id set never
    broadcasts). Output = the surviving corpus — what a user actually
    ships to training.

    hot_mode="star": the pairs feed connected components only, so hot
    LSH buckets emit bounded star pairs (O(d) rows instead of C(d,2)
    from a d-doc boilerplate cluster — r4 verdict #1) with unchanged
    clusters in the hot-bucket regime; below the cap (this corpus)
    emission is full pairwise and the output is bit-identical."""
    from ..stages import bloom

    pairs = dedup.verified_jaccard_pairs(_docs(sf_dir), hot_mode="star")
    labels = dedup.connected_components_distributed(pairs)

    def losers_only(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("doc_id"), b.column("cluster_id")))
        return pa.table(
            {"key": pc.cast(t.column("doc_id"), pa.string())}
        )

    # materialize: tiny (cluster losers only); avoids re-running the
    # label pipeline for each of the bloom helper's three consumers
    losers = labels.map_batches(
        losers_only, batch_format="pyarrow"
    ).materialize()

    def with_key(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "text"])
        return b.append_column(
            "__key", pc.cast(b.column("doc_id"), pa.string())
        )

    corpus = _docs(sf_dir).map_batches(with_key, batch_format="pyarrow")
    kept = bloom.bloom_blocklist_filter_ds(
        corpus, losers, key_col="__key", blocked_col="key"
    )
    return kept.map_batches(
        lambda b: b.drop_columns(["__key"]), batch_format="pyarrow"
    )


SQL_DEDUP_FUZZY_CORPUS = (
    """
WITH RECURSIVE p AS ("""
    + SQL_NGRAM_JACCARD.strip().rstrip()
    + """
), sym AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION SELECT id_b, id_a FROM p
), cc(node, lbl) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, c.lbl FROM sym s JOIN cc c ON c.node = s.b
), lblmin AS (
  SELECT node, min(lbl) AS cluster_id FROM cc GROUP BY node
)
SELECT doc_id, text FROM documents
WHERE doc_id NOT IN (SELECT node FROM lblmin WHERE node != cluster_id)
"""
)


def q_token_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        text_stats.token_stats_batch, batch_format="pyarrow"
    )


SQL_TOKEN_STATS = """
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
"""


def q_regex_tokens(sf_dir: str):
    return _docs(sf_dir).map_batches(
        text_stats.RegexTokenizer,
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


SQL_REGEX_TOKENS = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text),
           '{text_stats.BPE_ISH_PATTERN}')) AS n_regex_tokens
FROM documents
"""


def q_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(
        text_stats.quality_batch, batch_format="pyarrow"
    )


SQL_QUALITY = f"""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       len(w) AS n_tokens,
       len(list_filter(w, t -> t IN {STOPWORDS_SQL})) AS n_stopwords,
       length(text) - length(regexp_replace(text, '[.,!?;:()]', '', 'g')) AS n_punct,
       len(list_filter(w, t -> t IN {STOPWORDS_SQL}))::DOUBLE / len(w) AS stopword_ratio
FROM d
"""


def q_knn_cosine(sf_dir: str):
    return similarity.brute_force_topk(_emb(sf_dir), [0, 1, 2, 3, 4], k=10)


SQL_KNN_COSINE = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5)
SELECT q.query_id, e.vec_id AS neighbor_id,
       row_number() OVER (
         PARTITION BY q.query_id
         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[]) DESC,
                  e.vec_id ASC
       ) AS rank
FROM q, embeddings e
WHERE e.vec_id != q.query_id
QUALIFY rank <= 10
"""


def q_events_sliding(sf_dir: str):
    """Sliding 2h windows stepping hourly over the events stream."""
    return window.sliding_window(_events(sf_dir), size_hours=2, step_hours=1)


SQL_EVENTS_SLIDING = """
WITH g AS (SELECT unnest(range(2)) AS k)
SELECT date_trunc('hour', ts) - to_microseconds(k * 3600000000) AS window_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events, g
GROUP BY 1, 2
"""


def q_top_tokens_per_lang(sf_dir: str):
    """Grouped top-k: the 3 most frequent tokens per language —
    partial (lang, token) counts combine before the shuffle, the final
    per-group ranking is deterministic (count desc, token asc)."""
    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        parents = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        langs = pc.take(b.column("lang"), parents)
        t = pa.table({"lang": langs, "token": flat})
        part = pa.TableGroupBy(t, ["lang", "token"]).aggregate([("token", "count")])
        name_map = {"lang": "lang", "token": "token", "token_count": "n"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    partials = _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        partial, batch_format="pyarrow"
    )
    agg = partials.groupby(["lang", "token"]).sum("n")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["lang", "token", "n"])

    counts = agg.map_batches(rename, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("n", "descending"), ("token", "ascending")]
        )
        return group.take(idx[:3])

    return counts.groupby("lang").map_groups(topk, batch_format="pyarrow")


SQL_TOP_TOKENS_PER_LANG = """
SELECT lang, token, count(*) AS n
FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY lang, token
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) <= 3
"""


def q_event_quantiles(sf_dir: str):
    """Exact per-group order statistics (p50/p90/p99 of value-cents):
    groupby(event_type) shuffles the cents column only; each group sorts
    locally. Index convention = DuckDB quantile_disc (ceil(q*n)-1),
    calibrated empirically."""
    import math

    import numpy as np
    import ray.data

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def cents(b: pa.Table) -> pa.Table:
        c = pa.array(
            np.round(b.column("value").to_numpy(zero_copy_only=False) * 100.0)
            .astype("int64"),
            pa.int64(),
        )
        return pa.table({"event_type": b.column("event_type"), "cents": c})

    def per_group(group: pa.Table) -> pa.Table:
        vals = sorted(group.column("cents").to_pylist())
        n = len(vals)
        qs = {q: vals[min(n - 1, max(0, math.ceil(q * n) - 1))] for q in (0.5, 0.9, 0.99)}
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "p50_cents": pa.array([qs[0.5]], pa.int64()),
                "p90_cents": pa.array([qs[0.9]], pa.int64()),
                "p99_cents": pa.array([qs[0.99]], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
            }
        )

    return ev.map_batches(cents, batch_format="pyarrow").groupby(
        "event_type"
    ).map_groups(per_group, batch_format="pyarrow")


SQL_EVENT_QUANTILES = """
SELECT event_type,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS p90_cents,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS p99_cents,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_sessionize(sf_dir: str):
    return window.sessionize(_events(sf_dir), gap_minutes=30)


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         (sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_seq
  FROM e
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM s GROUP BY user_id, session_seq
"""


def q_user_totals_stateful(sf_dir: str):
    """Keyed mutable state on raw actors (the Dataset-API escape hatch):
    running per-user (count, cents) folded incrementally across streamed
    batches; the END state must equal a plain SQL groupby."""
    import numpy as np

    from ..state.keyed import KeyedStateIndex

    ev = _events(sf_dir)

    def cents(b: pa.Table) -> pa.Table:
        c = pa.array(
            np.round(b.column("value").to_numpy(zero_copy_only=False) * 100.0)
            .astype("int64"),
            pa.int64(),
        )
        return pa.table({"user_id": b.column("user_id"), "cents": c})

    idx = KeyedStateIndex(n_shards=4).consume_distributed(
        ev.map_batches(cents, batch_format="pyarrow"), "user_id", "cents"
    )
    snap = idx.snapshot()
    return snap.rename_columns(["user_id", "n_events", "sum_cents"])


SQL_USER_TOTALS = """
SELECT user_id, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events GROUP BY user_id
"""


def q_events_window(sf_dir: str):
    return window.tumbling_window(_events(sf_dir))


SQL_EVENTS_WINDOW = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events
GROUP BY 1, 2
"""


def q_dedup_paragraphs(sf_dir: str):
    """Paragraph(line)-level exact dedup over the EXTRACTED corpus text:
    which paragraphs repeat across the corpus, how often, and the
    first url carrying each — the cross-page boilerplate detector."""
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")
    return dedup.paragraph_dedup(ext, text_col="text", id_col="url")


SQL_DEDUP_PARAGRAPHS = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents
), l AS (
  SELECT doc_id, w, nw, unnest(range((nw + 7) // 8)) AS i FROM d
), lt AS (
  SELECT doc_id,
         array_to_string(w[(i*8+1):least((i+1)*8, nw)], ' ') AS line
  FROM l
)
SELECT md5(line) AS para_hash, count(*) AS n_occurrences,
       min({URL_SQL}) AS first_url
FROM lt GROUP BY md5(line)
"""


def q_repeated_substrings(sf_dir: str):
    """Substring-level exact dedup (Lee et al. 2022 / r2 verdict #5):
    maximal per-doc character spans covered by a 50-char window that
    occurs >= 2 times anywhere in the corpus — the cross-document
    boilerplate INSIDE otherwise distinct paragraphs that
    paragraph-level dedup cannot see. Two linear passes, narrow
    (hash, count) shuffle; the oracle groups on literal window text."""
    from ..stages import substring

    return substring.repeated_substring_spans(
        _docs(sf_dir), min_len=50, text_col="text", id_col="doc_id"
    )


SQL_REPEATED_SUBSTRINGS = """
WITH d AS (
  SELECT doc_id, text, unnest(range(length(text) - 49)) AS pos
  FROM documents WHERE length(text) >= 50
),
wins AS (
  SELECT doc_id, pos, substr(text, pos::INTEGER + 1, 50) AS w FROM d
),
hits AS (
  SELECT doc_id, pos FROM wins
  WHERE w IN (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2)
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  <= 50
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked
)
SELECT doc_id, min(pos)::BIGINT AS span_start,
       (max(pos) + 50)::BIGINT AS span_end
FROM isl GROUP BY doc_id, grp
"""


def q_repeated_substrings_bucketed(sf_dir: str):
    """The >=10^8-dup-hash scale form: the dup-window table stays a
    DATASET — only its Bloom bits broadcast; maybe-windows verify
    exactly in a co-partitioned bucket groupby (no false negatives, so
    result == the broadcast form; same oracle as repeated_substrings)."""
    from ..stages import substring

    return substring.repeated_substring_spans_bucketed(
        _docs(sf_dir), min_len=50, text_col="text", id_col="doc_id"
    )


def q_substring_clean(sf_dir: str):
    """Lee et al.'s dedup ACTION: cut every corpus-repeated >= 50-char
    window span out of the text. Every doc comes back (text_clean =
    original text for the clean majority, spliced for the rest); the
    cut happens inside the mark pass itself — no extra join."""
    from ..stages import substring

    return substring.repeated_substring_cut(
        _docs(sf_dir), min_len=50, text_col="text", id_col="doc_id"
    )


SQL_SUBSTRING_CLEAN = """
WITH d AS (
  SELECT doc_id, text, unnest(range(length(text) - 49)) AS pos
  FROM documents WHERE length(text) >= 50
),
wins AS (
  SELECT doc_id, pos, substr(text, pos::INTEGER + 1, 50) AS w FROM d
),
hits AS (
  SELECT doc_id, pos FROM wins
  WHERE w IN (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2)
),
cover AS (
  SELECT DISTINCT doc_id, pos + unnest(range(50)) AS ci FROM hits
),
chars AS (
  SELECT doc_id, i, substr(text, i::INTEGER + 1, 1) AS ch
  FROM (SELECT doc_id, text, unnest(range(length(text))) AS i
        FROM documents)
),
kept AS (
  SELECT c.doc_id, c.i, c.ch
  FROM chars c LEFT JOIN cover v
    ON v.doc_id = c.doc_id AND v.ci = c.i
  WHERE v.doc_id IS NULL
)
SELECT d.doc_id,
       CASE WHEN k.text_clean IS NOT NULL THEN k.text_clean
            WHEN h.doc_id IS NOT NULL THEN ''
            ELSE d.text END AS text_clean
FROM documents d
LEFT JOIN (SELECT DISTINCT doc_id FROM hits) h ON h.doc_id = d.doc_id
LEFT JOIN (
  SELECT doc_id, string_agg(ch, '' ORDER BY i) AS text_clean
  FROM kept GROUP BY doc_id
) k ON k.doc_id = d.doc_id
"""


def q_hash_sample(sf_dir: str):
    """Deterministic reproducible sampling by content hash — the QA /
    eval-split stage (pure per-row filter, no RNG state, no shuffle)."""
    pages = pages_from_documents(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "lang"])

    return dedup.hash_sample(
        pages.map_batches(proj, batch_format="pyarrow"), col="url"
    )


SQL_HASH_SAMPLE = f"""
SELECT url, lang
FROM (SELECT {URL_SQL} AS url, lang FROM documents)
WHERE substr(md5(url), 1, 8) < '28f5c28f'
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: the k smallest-md5(url) rows
    per language — the fixed-size per-stratum eval draw. Per-batch
    partial top-k bounds the shuffle to k x strata rows per block."""
    pages = pages_from_documents(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "lang"])

    return dedup.stratified_sample(
        pages.map_batches(proj, batch_format="pyarrow"),
        strata_col="lang", key_col="url", k=10,
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT url, lang FROM (
  SELECT url, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(url), url) AS rn
  FROM (SELECT {URL_SQL} AS url, lang FROM documents)
  WHERE url IS NOT NULL AND lang IS NOT NULL
) WHERE rn <= 10
"""


def q_url_canon(sf_dir: str):
    """URL canonicalization kit over a deliberately-messy url column
    (uppercase scheme/host, default port, unsorted query params,
    fragment) — ground truth by construction."""
    from ..functions.scalars import canonicalize_urls

    docs = _docs(sf_dir)

    def messy(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        raw = [
            f"HTTPS://H{i % 50:02d}.EXAMPLE.COM:443/doc/{i}"
            f"?b={i % 7}&a={i % 3}#sec"
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "url_canon": canonicalize_urls(pa.array(raw, pa.string())),
            }
        )

    return docs.map_batches(messy, batch_format="pyarrow")


SQL_URL_CANON = """
SELECT doc_id,
       'https://h' || lpad((doc_id % 50)::VARCHAR, 2, '0')
         || '.example.com/doc/' || doc_id::VARCHAR
         || '?a=' || (doc_id % 3)::VARCHAR
         || '&b=' || (doc_id % 7)::VARCHAR AS url_canon
FROM documents
"""


def q_events_preceding(sf_dir: str):
    """Per-user banded range join: clicks in the 30 minutes before each
    purchase (sorted searchsorted per key — no per-row Python)."""
    return window.preceding_window_count(_events(sf_dir))


SQL_EVENTS_PRECEDING = """
SELECT p.event_id, p.ts, p.user_id,
       (SELECT count(*) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts > p.ts - INTERVAL 30 MINUTE
           AND c.ts <= p.ts) AS n_preceding
FROM events p WHERE p.event_type = 'purchase'
"""


def q_image_meta(sf_dir: str):
    """REAL image decode over a deterministic synthetic corpus: each
    doc becomes a constant-color image — even ids binary PPM, odd ids
    uncompressed BMP — so width/height/channel-means are exactly
    SQL-expressible while the decode kernels (both codecs), the resize
    and the feature extraction actually run."""
    import numpy as np

    from ..stages import multimodal as mm

    docs = _docs(sf_dir)

    def gen(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            w, h = 16 + i % 32, 16 + i % 16
            color = (i % 256, (i * 7) % 256, (i * 13) % 256)
            arr = np.full((h, w, 3), color, dtype=np.uint8)
            payloads.append(
                mm.encode_ppm(arr) if i % 2 == 0 else mm.encode_bmp(arr)
            )
        return pa.table(
            {
                "media_id": pa.array([str(i) for i in ids], pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "mime_type": pa.array(
                    ["image/x-portable-pixmap" if i % 2 == 0 else "image/bmp"
                     for i in ids],
                    pa.string(),
                ),
            }
        )

    media = docs.map_batches(gen, batch_format="pyarrow")
    feats = mm.decode_images_real(media)

    def proj(b: pa.Table) -> pa.Table:
        # constant-color images: float means are exact integers
        return pa.table(
            {
                "media_id": b.column("media_id"),
                "width": b.column("width"),
                "height": b.column("height"),
                "channels": b.column("channels"),
                "mean_r": pc.cast(pc.round(b.column("mean_r")), pa.int64()),
                "mean_g": pc.cast(pc.round(b.column("mean_g")), pa.int64()),
                "mean_b": pc.cast(pc.round(b.column("mean_b")), pa.int64()),
            }
        )

    return feats.map_batches(proj, batch_format="pyarrow")


SQL_IMAGE_META = """
SELECT doc_id::VARCHAR AS media_id,
       (16 + doc_id % 32)::BIGINT AS width,
       (16 + doc_id % 16)::BIGINT AS height,
       3::BIGINT AS channels,
       (doc_id % 256)::BIGINT AS mean_r,
       ((doc_id * 7) % 256)::BIGINT AS mean_g,
       ((doc_id * 13) % 256)::BIGINT AS mean_b
FROM documents
"""


def q_audio_meta(sf_dir: str):
    """REAL PCM-WAV decode (stdlib wave + numpy FFT features) over
    deterministic sine-wave clips; the integer metadata is
    SQL-expressible by construction, the spectral features are pinned
    in pytest."""
    import io
    import wave

    import numpy as np

    from ..stages import multimodal as mm

    docs = _docs(sf_dir)
    RATE = 8000

    def gen(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            n = 400 + (i % 50) * 8
            t = np.arange(n, dtype=np.float64)
            freq = 200.0 + (i % 10) * 50.0
            x = (np.sin(2 * np.pi * freq * t / RATE) * 12000).astype(np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(RATE)
                wf.writeframes(x.tobytes())
            payloads.append(buf.getvalue())
        return pa.table(
            {
                "media_id": pa.array([str(i) for i in ids], pa.string()),
                "kind": pa.array(["audio"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "mime_type": pa.array(["audio/wav"] * len(ids), pa.string()),
            }
        )

    media = docs.map_batches(gen, batch_format="pyarrow")
    feats = mm.featurize_wav(media)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["media_id", "n_samples", "sample_rate", "duration_ms"])

    return feats.map_batches(proj, batch_format="pyarrow")


SQL_AUDIO_META = """
SELECT doc_id::VARCHAR AS media_id,
       (400 + (doc_id % 50) * 8)::BIGINT AS n_samples,
       8000::BIGINT AS sample_rate,
       ((400 + (doc_id % 50) * 8) * 1000 // 8000)::BIGINT AS duration_ms
FROM documents
"""


def q_common_tokens(sf_dir: str):
    """Corpus-statistics quality signal: per-doc count of tokens from
    the corpus's frequent vocabulary (Zipf head broadcast once)."""
    return text_stats.common_token_stats(_docs(sf_dir), min_freq=50)


SQL_COMMON_TOKENS = """
WITH tf AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
)
SELECT doc_id, count(*) AS n_tokens,
       sum(CASE WHEN tf.n >= 50 THEN 1 ELSE 0 END)::BIGINT AS n_common
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents) dt
JOIN tf USING (token)
GROUP BY doc_id
"""


def q_pdf_text(sf_dir: str):
    """REAL PDF text extraction (object scan → FlateDecode → content-
    stream text operators) over deterministic generated PDFs — pages
    and text SQL-expressible by construction; odd ids exercise the
    compressed-stream path."""
    from ..stages import pdf_layout as pl

    docs = _docs(sf_dir)

    def gen(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            pages = [
                [(72.0, 700.0 - 20 * p, f"doc {i} page {p}")]
                for p in range(1 + i % 3)
            ]
            payloads.append(pl.encode_simple_pdf(pages, compress=i % 2 == 1))
        return pa.table(
            {
                "url": pa.array([str(i) for i in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = docs.map_batches(gen, batch_format="pyarrow")
    out = pl.parse_pdfs(media, batch_size=256, engine="real")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "n_pages": pc.cast(b.column("n_pages"), pa.int64()),
                "text": b.column("text"),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow")


SQL_PDF_TEXT = """
WITH p AS (
  SELECT doc_id, unnest(range(1 + doc_id % 3)) AS pg FROM documents
)
SELECT doc_id::VARCHAR AS url,
       (1 + doc_id % 3)::BIGINT AS n_pages,
       string_agg('doc ' || doc_id::VARCHAR || ' page ' || pg::VARCHAR,
                  chr(10) ORDER BY pg) AS text
FROM p GROUP BY doc_id
"""


def q_chunk_stride(sf_dir: str):
    """Overlapping context-window chunking (size 200, stride 150): the
    LM-pretraining chunker for documents longer than one context
    window. Pure per-batch map; the kernel loops over chunk ordinals
    (whole-column utf8 slices), never rows."""
    return text_stats.chunk_stride(_docs(sf_dir), size=200, stride=150)


SQL_CHUNK_STRIDE = """
WITH c AS (
  SELECT doc_id, text,
         unnest(range(CAST(ceil(length(text) / 150.0) AS BIGINT))) AS i
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, i::BIGINT AS chunk_id,
       substr(text, (i * 150 + 1)::INTEGER, 200) AS chunk_text
FROM c
"""


def q_pack_chunks(sf_dir: str):
    """LM sequence packing: map every document to its chunk range in
    the doc_id-ordered 512-token stream (distributed ordered prefix
    sum — ranged partial sums + tiny broadcast offsets)."""
    return text_stats.pack_chunks(_docs(sf_dir), chunk_tokens=512)


SQL_PACK_CHUNKS = """
WITH c AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - n_tokens)::BIGINT AS token_start
  FROM c
)
SELECT doc_id, n_tokens, token_start,
       (token_start // 512)::BIGINT AS start_chunk,
       (CASE WHEN n_tokens > 0 THEN (token_start + n_tokens - 1) // 512
             ELSE token_start // 512 END)::BIGINT AS end_chunk
FROM s
"""


def q_hash_split(sf_dir: str):
    """Leakage-safe train/val/test assignment by url hash (≈90/5/5)."""
    pages = pages_from_documents(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url"])

    return dedup.hash_split(
        pages.map_batches(proj, batch_format="pyarrow"), col="url"
    )


SQL_HASH_SPLIT = f"""
SELECT url,
       CASE WHEN substr(md5(url), 1, 8) < 'e6666666' THEN 'train'
            WHEN substr(md5(url), 1, 8) < 'f3333333' THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT {URL_SQL} AS url FROM documents)
"""


def q_pipeline_pack_train(sf_dir: str):
    """The training-data prep chain composed end to end in ONE
    SQL-checked query: extract → quality filter (≥20 words) →
    leakage-safe train split → LM sequence packing over the surviving
    documents. Every stage is the scale-shaped operator; the only
    non-map work is pack_chunks' ranged prefix sum."""
    ext = extract_pages(pages_from_documents(sf_dir), mode="text")

    def quality(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_words"), 20))
        return b.select(["url", "n_words"])

    filtered = ext.map_batches(quality, batch_format="pyarrow")
    train = dedup.hash_split(filtered, col="url")

    def keep_train(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("split"), "train"))
        doc_id = pc.cast(
            pc.struct_field(
                pc.extract_regex(b.column("url"), r"/doc/(?P<id>\d+)$"), "id"
            ),
            pa.int64(),
        )
        return pa.table({"doc_id": doc_id, "n_words": b.column("n_words")})

    docs = train.map_batches(keep_train, batch_format="pyarrow")
    return text_stats.pack_chunks(
        docs, chunk_tokens=512, tokens_col="n_words"
    )


SQL_PIPELINE_PACK_TRAIN = f"""
WITH f AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM (SELECT doc_id, text, {URL_SQL} AS url FROM documents)
  WHERE len(string_split(text, ' ')) >= 20
    AND substr(md5(url), 1, 8) < 'e6666666'
), s AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - n_tokens)::BIGINT AS token_start
  FROM f
)
SELECT doc_id, n_tokens, token_start,
       (token_start // 512)::BIGINT AS start_chunk,
       (CASE WHEN n_tokens > 0 THEN (token_start + n_tokens - 1) // 512
             ELSE token_start // 512 END)::BIGINT AS end_chunk
FROM s
"""


def q_host_cap(sf_dir: str):
    """Per-domain page cap (≤5 per host, deterministic by url digest) —
    the anti-Zipf stage; pre-truncated per batch before the shuffle."""
    pages = pages_from_documents(sf_dir)

    def with_host(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b.column("url"), r"//(?P<host>[^/]+)/"), "host"
        )
        return pa.table({"url": b.column("url"), "host": host})

    hosted = pages.map_batches(with_host, batch_format="pyarrow")
    return dedup.per_key_cap(hosted, key="host", k=5, order_col="url")


SQL_HOST_CAP = f"""
SELECT url, host FROM (
  SELECT {URL_SQL} AS url,
         'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') || '.example.com' AS host
  FROM documents
)
QUALIFY row_number() OVER (PARTITION BY host ORDER BY md5(url)) <= 5
"""


# -- rows-only queries (no faithful ANSI-SQL form) ---------------------------


def q_top_tokens(sf_dir: str):
    """Heavy hitters: top-20 tokens by corpus frequency. Per-batch
    partial counts combine before the global groupby — the hot token
    contributes one partial row per block, never one row per
    occurrence."""
    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b.column("text"), " "))
        t = pa.table({"token": toks})
        part = pa.TableGroupBy(t, "token").aggregate([("token", "count")])
        name_map = {"token": "token", "token_count": "n"}
        return part.rename_columns([name_map[c] for c in part.column_names])

    partials = _docs(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("token").sum("n")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["token", "n"])

    counts = agg.map_batches(rename, batch_format="pyarrow")
    top = counts.sort(["n", "token"], descending=[True, False]).limit(20)
    return top


SQL_TOP_TOKENS = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
QUALIFY row_number() OVER (ORDER BY n DESC, token ASC) <= 20
"""


def q_distinct_tokens(sf_dir: str):
    """HLL sketch estimate of distinct tokens (rows-only: approximate
    by design; accuracy pinned vs exact in tests/test_sketch.py)."""
    from ..stages.sketch import distinct_tokens

    est = distinct_tokens(_docs(sf_dir))
    return pa.table({"approx_distinct_tokens": pa.array([int(round(est))], pa.int64())})


def q_distinct_tokens_exact(sf_dir: str):
    """EXACT distinct-token count — the bit-checked sibling of the HLL
    sketch (distinct_tokens_sketch): per-batch DISTINCT partials (one
    deduped token set per block) → ONE narrow token groupby → group
    count. Only per-block-unique tokens shuffle, never the corpus; the
    driver sees one scalar."""

    def partial(b: pa.Table) -> pa.Table:
        toks: set = set()
        for t in b.column("text").to_pylist():
            if t:
                toks.update(t.split(" "))
        return pa.table({"tok": pa.array(list(toks), pa.string())})

    parts = _docs(sf_dir).map_batches(partial, batch_format="pyarrow")
    n = parts.groupby("tok").count().count()
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


SQL_DISTINCT_TOKENS_EXACT = """
SELECT count(DISTINCT t)::BIGINT AS n_distinct
FROM (SELECT unnest(string_split(text, ' ')) AS t
      FROM documents WHERE text IS NOT NULL AND text != '')
"""


def q_dedup_minhash(sf_dir: str):
    return dedup.lsh_candidate_pairs(_docs(sf_dir))


def q_dedup_simhash(sf_dir: str):
    return _docs(sf_dir).map_batches(dedup.simhash_batch, batch_format="pyarrow")


def q_simhash_pairs(sf_dir: str):
    return dedup.simhash_candidate_pairs(_docs(sf_dir), max_hamming=8)


def q_langid(sf_dir: str):
    return _docs(sf_dir).map_batches(
        text_stats.LangId, batch_format="pyarrow", concurrency=(1, 2)
    )


def _langid_sql() -> str:
    """ANSI-SQL mirror of :class:`LangId`, generated from the same
    LANG_PROFILES so vocab edits can never desynchronise the oracle.
    Tie rule: CASE order == sorted(langs) == the argmax tie rule."""
    from ..stages.text_stats import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    scores = ", ".join(
        "count(*) FILTER (tok IN (%s)) AS s_%s"
        % (", ".join("'%s'" % w for w in LANG_PROFILES[lang]), lang)
        for lang in langs
    )
    whens = " ".join(
        "WHEN s_%s = m THEN '%s'" % (lang, lang) for lang in langs[:-1]
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
), s AS (
  SELECT doc_id, {scores} FROM toks GROUP BY doc_id
), sm AS (
  SELECT *, greatest({", ".join("s_" + lang for lang in langs)}) AS m FROM s
)
SELECT d.doc_id,
  CASE WHEN COALESCE(m, 0) = 0 THEN 'und' {whens} ELSE '{langs[-1]}' END
    AS pred_lang,
  COALESCE(m, 0)::BIGINT AS score
FROM documents d LEFT JOIN sm USING (doc_id)
"""


SQL_LANGID = _langid_sql()


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(
        text_stats.fingerprint_batch, batch_format="pyarrow"
    )


# Winnowing oracle (k=3-token shingles, window=4): md5-hex shingle
# hashes, per-window lexicographic min (== numeric min on the 128-bit
# value), distinct selected minima sorted and comma-joined — the FULL
# fingerprint set is value-checked, not just a summary of it.
SQL_FINGERPRINT = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), pos AS (
  SELECT doc_id, l, len(l) - 3 + 1 AS n_sh,
         unnest(range(1, greatest(len(l) - 3 + 2, 1))) AS s
  FROM base WHERE len(l) >= 3
), grams AS (
  SELECT doc_id, s, n_sh, md5(array_to_string(l[s:s+2], ' ')) AS h FROM pos
), wm AS (
  SELECT doc_id, n_sh, s,
         min(h) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
  FROM grams
), agg AS (
  SELECT doc_id, any_value(n_sh) AS n_shingles,
         count(DISTINCT m) AS n_fp,
         string_agg(DISTINCT m, ',' ORDER BY m) AS fp_set
  FROM wm WHERE s <= greatest(n_sh - 4 + 1, 1) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.n_shingles, 0)::BIGINT AS n_shingles,
       COALESCE(a.n_fp, 0)::BIGINT AS n_fp,
       COALESCE(a.fp_set, '') AS fp_set
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_semantic_dedup(sf_dir: str):
    """SemDeDup semantic deduplication over the embeddings table
    (rows-only: k-means clustering is not SQL-expressible; invariants
    pinned in tests/test_rowsonly_validation.py). Random synthetic
    embeddings have no natural near-dups (max pair sim ~0.51), so —
    exactly like q_neardup_cosine — the corpus is the embeddings table
    UNIONed with exact duplicates of vec_id < 20 (new ids +100000); the
    expected outcome is one survivor per duplicate pair and keep=True
    everywhere else."""

    def dup_some(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.less(b.column("vec_id"), 20))
        dup = pa.table(
            {
                "vec_id": pc.add(sel.column("vec_id"), 100000),
                "embedding": sel.column("embedding"),
            }
        )
        base = pa.table(
            {"vec_id": b.column("vec_id"), "embedding": b.column("embedding")}
        )
        return pa.concat_tables([base, dup])

    corpus = _emb(sf_dir).map_batches(dup_some, batch_format="pyarrow")
    return similarity.semantic_dedup(corpus, threshold=0.95)


def q_semantic_dedup_grid(sf_dir: str):
    """SemDeDup with the SQL-expressible sign-bit grid quantizer
    (similarity.semantic_dedup(grid_bits=2)): same within-cluster
    drop-if-similar-to-earlier rule as q_semantic_dedup, but partition
    and order are mirrorable in ANSI SQL, so the plumbing is
    bit-checked. Same dup-injected corpus as q_semantic_dedup; output
    projected to (vec_id, cluster, keep) — float-free."""

    def dup_some(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.less(b.column("vec_id"), 20))
        dup = pa.table(
            {
                "vec_id": pc.add(sel.column("vec_id"), 100000),
                "embedding": sel.column("embedding"),
            }
        )
        base = pa.table(
            {"vec_id": b.column("vec_id"), "embedding": b.column("embedding")}
        )
        return pa.concat_tables([base, dup])

    corpus = _emb(sf_dir).map_batches(dup_some, batch_format="pyarrow")
    out = similarity.semantic_dedup(corpus, threshold=0.95, grid_bits=2)
    return out.map_batches(
        lambda b: b.select(["vec_id", "cluster", "keep"]),
        batch_format="pyarrow",
    )


SQL_SEMANTIC_DEDUP_GRID = """
WITH all_e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 20
), assigned AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)::BIGINT AS cluster
  FROM all_e
), prior AS (
  SELECT a.vec_id,
         max(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[])) AS mps
  FROM assigned a JOIN assigned b
    ON b.cluster = a.cluster AND b.vec_id < a.vec_id
  GROUP BY a.vec_id
)
SELECT a.vec_id, a.cluster,
       (p.mps IS NULL OR p.mps <= 0.95) AS keep
FROM assigned a LEFT JOIN prior p USING (vec_id)
"""


def q_knn_ivf(sf_dir: str):
    return similarity.ivf_topk(_emb(sf_dir), [0, 1, 2, 3, 4], k=10)


def q_knn_ivf_exact(sf_dir: str):
    """IVF with n_probe == n_buckets: every inverted list is probed, so
    the result is EXACTLY brute-force top-k — this drives the full IVF
    machinery (seeded-sample centroids, streaming bucket assignment,
    probe routing, per-bucket scoring, global merge) through the same
    bit-checked SQL oracle as knn_cosine. q_knn_ivf keeps the
    approximate n_probe=4 form (rows-only, recall-pinned in pytest)."""
    return similarity.ivf_topk(
        _emb(sf_dir), [0, 1, 2, 3, 4], k=10, n_buckets=16, n_probe=16
    )


NEARDUP_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def q_neardup_cosine(sf_dir: str):
    # The scale path (hyperplane-LSH buckets + exact-cosine verify, no
    # corpus broadcast) at a REAL near-dup threshold (0.95 — LSH is a
    # high-threshold tool; see cosine_neardup_pairs_lsh). Random
    # synthetic embeddings never reach 0.95, so the corpus is the
    # embeddings table UNIONed with exact duplicates of vec_id < 20
    # (new ids +100000) — the qualifying pairs are exactly those dups,
    # which identical sign patterns catch with recall 1. Projected to
    # ids so the SQL mirror is float-free; returned as a schema-pinned
    # Table because an all-empty Dataset loses its column schema
    # through to_pandas (observed at sf0.001).
    import ray

    emb = _emb(sf_dir)

    def dup_some(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.less(b.column("vec_id"), 20))
        dup = pa.table(
            {
                "vec_id": pc.add(sel.column("vec_id"), 100000),
                "embedding": sel.column("embedding"),
            }
        )
        base = pa.table(
            {"vec_id": b.column("vec_id"), "embedding": b.column("embedding")}
        )
        return pa.concat_tables([base, dup])

    corpus = emb.map_batches(dup_some, batch_format="pyarrow")
    ds = similarity.cosine_neardup_pairs_lsh(corpus, threshold=0.95)
    proj = ds.map_batches(
        lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    blocks = [ray.get(r) for r in proj.to_arrow_refs()]
    blocks = [b.cast(NEARDUP_SCHEMA) for b in blocks if b.num_rows] or [
        NEARDUP_SCHEMA.empty_table()
    ]
    return pa.concat_tables(blocks)


SQL_NEARDUP_COSINE = """
WITH all_e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 20
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= 0.95
"""


def q_find_first_region(sf_dir: str):
    """Corpus-wide Page.Find(Match{region}) — first-match semantics."""
    ff = match.find_first(_full(sf_dir), Match(region_id="r_1"))

    def proj(b: pa.Table) -> pa.Table:
        return _i64(b.select(["url", "region_id", "ro_index"]), ["ro_index"])

    return ff.map_batches(proj, batch_format="pyarrow")


SQL_FIND_FIRST_REGION = f"""
SELECT {URL_SQL} AS url, 'r_1' AS region_id, 1::BIGINT AS ro_index
FROM documents
WHERE len(string_split(text, ' ')) > 40
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (n-gram-overlap hygiene as in GPT-3,
    Brown et al. 2020 §4 / The Pile): eval set = documents with
    doc_id % 97 == 3 (deterministic stand-in benchmark, synthesised
    from the same table — no external data); every other document is
    flagged iff it shares any token 4-gram with it. The eval gram set
    is the broadcast small side; the corpus side is a pure streaming
    actor-pool map with no shuffle at any scale."""
    import numpy as np

    from ..stages import decontam

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )

    def mod_filter(want_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 3
            return b.filter(pa.array(m if want_eval else ~m))

        return f

    ev = base.map_batches(mod_filter(True), batch_format="pyarrow")
    corpus = base.map_batches(mod_filter(False), batch_format="pyarrow")
    out = decontam.decontaminate(corpus, ev, n=4)
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_hits", "contaminated"]),
        batch_format="pyarrow",
    )


SQL_DECONTAMINATE = """
WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM base),
flat AS (SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts,1) AS ord
         FROM toks),
grams AS (
  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok||' '||d.tok AS gram
  FROM flat a
  JOIN flat b ON b.doc_id=a.doc_id AND b.ord=a.ord+1
  JOIN flat c ON c.doc_id=a.doc_id AND c.ord=a.ord+2
  JOIN flat d ON d.doc_id=a.doc_id AND d.ord=a.ord+3
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 3),
hits AS (SELECT g.doc_id, count(*)::BIGINT AS n_hits
         FROM grams g JOIN ev ON g.gram = ev.gram
         WHERE g.doc_id % 97 != 3 GROUP BY g.doc_id)
SELECT b.doc_id,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM base b LEFT JOIN hits h USING(doc_id)
WHERE b.doc_id % 97 != 3
"""


def q_repetition(sf_dir: str):
    """Gopher-style duplicate-line stats (Rae et al. 2021 A1). The
    synthetic corpus has no naturally repeated lines, so rows with
    doc_id % 7 == 0 get their text doubled (text + "\\n" + text) in
    BOTH engine and SQL, making the metrics non-trivially non-zero.
    Integer counts only (ratios derive downstream) so the check is
    order-independent and exact."""
    from ..stages import repetition

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )

    def double_some(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        doubled = pc.binary_join_element_wise(txt, txt, "\n")
        new_txt = pc.if_else(pa.array(ids % 7 == 0), doubled, txt)
        return pa.table({"doc_id": b.column("doc_id"), "text": new_txt})

    return repetition.repetition_stats(
        base.map_batches(double_some, batch_format="pyarrow")
    )


SQL_REPETITION = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || text
              ELSE text END AS text
  FROM documents WHERE text IS NOT NULL
),
l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM base),
per AS (SELECT doc_id, line, count(*)::BIGINT AS c,
               length(line)::BIGINT AS len
        FROM l GROUP BY doc_id, line)
SELECT doc_id,
  sum(c)::BIGINT AS n_lines,
  (sum(c) - count(*))::BIGINT AS n_dup_lines,
  sum(CASE WHEN c > 1 THEN c*len ELSE 0 END)::BIGINT AS dup_line_chars,
  sum(c*len)::BIGINT AS total_line_chars
FROM per GROUP BY doc_id
"""


def q_pii_redact(sf_dir: str):
    """PII redaction (C4/RefinedWeb-style privacy pass): mask emails /
    IPv4s / phone-like runs, count each. The synthetic corpus contains
    no PII, so deterministic PII is appended per doc_id residue in BOTH
    engine and SQL (no external data); both sides then run the same
    RE2 patterns, so the redacted text itself is bit-checked."""
    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )

    def inject(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        ids_s = pc.cast(b.column("doc_id"), pa.string())
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        with_email = pc.binary_join_element_wise(
            txt, pc.binary_join_element_wise(
                pa.array(["contact user"] * len(b)), ids_s, "@example.com", ""
            ), " "
        )
        txt = pc.if_else(pa.array(ids % 11 == 0), with_email, txt)
        oct3 = pc.cast(pa.array(ids % 256), pa.string())
        with_ip = pc.binary_join_element_wise(
            txt, pc.binary_join_element_wise(
                pa.array(["from 10.0."] * len(b)), oct3, ".7", ""
            ), " "
        )
        txt = pc.if_else(pa.array(ids % 13 == 0), with_ip, txt)
        with_phone = pc.binary_join_element_wise(
            txt, "call +1 555-000-1234", " "
        )
        txt = pc.if_else(pa.array(ids % 17 == 0), with_phone, txt)
        return pa.table({"doc_id": b.column("doc_id"), "text": txt})

    return pii.redact_pii(base.map_batches(inject, batch_format="pyarrow"))


_PII_E, _PII_I, _PII_P = (p for _, p, _ in pii.PATTERNS)

SQL_PII_REDACT = f"""
WITH injected AS (
  SELECT doc_id,
    CASE WHEN doc_id % 17 = 0 THEN t3 || ' call +1 555-000-1234' ELSE t3 END AS text
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 13 = 0
           THEN t2 || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7'
           ELSE t2 END AS t3
    FROM (
      SELECT doc_id,
        CASE WHEN doc_id % 11 = 0
             THEN text || ' contact user' || doc_id::VARCHAR || '@example.com'
             ELSE text END AS t2
      FROM documents WHERE text IS NOT NULL
    )
  )
),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(text, '{_PII_E}'))::BIGINT AS n_email,
              regexp_replace(text, '{_PII_E}', '[EMAIL]', 'g') AS t FROM injected),
s2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t, '{_PII_I}'))::BIGINT AS n_ipv4,
              regexp_replace(t, '{_PII_I}', '[IP]', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4,
              len(regexp_extract_all(t, '{_PII_P}'))::BIGINT AS n_phone,
              regexp_replace(t, '{_PII_P}', '[PHONE]', 'g') AS t FROM s2)
SELECT doc_id, t AS text_redacted, n_email, n_ipv4, n_phone FROM s3
"""


def q_normalize_text(sf_dir: str):
    """Canonical text cleanup (NFC, control strip, whitespace collapse,
    trim) with auditable before/after codepoint counts. The corpus has
    embedded newlines/tab runs, so the collapse is non-trivial; dirty
    control bytes are additionally injected for doc_id % 19 == 0 rows
    in BOTH engine and SQL."""
    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )

    def dirty(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        dirtied = pc.binary_join_element_wise(
            "\x01pre\x02 ", txt, " \x1ftail", ""
        )
        txt = pc.if_else(pa.array(ids % 19 == 0), dirtied, txt)
        return pa.table({"doc_id": b.column("doc_id"), "text": txt})

    return text_stats.normalize_text(
        base.map_batches(dirty, batch_format="pyarrow")
    )


SQL_NORMALIZE_TEXT = f"""
WITH dirty AS (
  SELECT doc_id,
    CASE WHEN doc_id % 19 = 0
         THEN chr(1) || 'pre' || chr(2) || ' ' || text || ' ' || chr(31) || 'tail'
         ELSE text END AS text
  FROM documents WHERE text IS NOT NULL
),
n AS (
  SELECT doc_id, length(text)::BIGINT AS n_chars_before,
         trim(regexp_replace(regexp_replace(nfc_normalize(text),
              '{text_stats.NORM_CTRL_RE}', '', 'g'), '{text_stats.NORM_WS_RE}',
              ' ', 'g'), ' ') AS text_norm
  FROM dirty
)
SELECT doc_id, text_norm, n_chars_before,
       length(text_norm)::BIGINT AS n_chars_after
FROM n
"""


def q_token_rank(sf_dir: str):
    """Corpus-wide exact ranking (distributed ORDER BY — the curation
    cut "keep the top N% by signal"): every document's dense 0-based
    position ordered by (n_tokens DESC, doc_id ASC), assigned with the
    range-partition + order-statistics shape (stages/rank.py). Only
    (key, id) pairs shuffle; the driver sees a sample and one count
    per bucket."""
    from ..stages import rank, text_stats

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )

    def n_tokens(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), " ")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )

    keyed = base.map_batches(n_tokens, batch_format="pyarrow")
    return rank.global_rank(keyed, key_col="n_tokens", id_col="doc_id",
                            descending=True)


SQL_TOKEN_RANK = """
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_tokens,
       (ROW_NUMBER() OVER (ORDER BY len(string_split(text, ' ')) DESC,
                           doc_id ASC) - 1)::BIGINT AS rank
FROM documents WHERE text IS NOT NULL
"""


def q_length_quantiles(sf_dir: str):
    """Corpus length percentiles via the mergeable histogram sketch
    (HDR-family): one fixed-size bincount partial per block, summed in
    any order; exact-to-bin so the SQL mirror (quantile_disc over
    floor-binned values) matches bit-for-bit — a SQL-checkable sketch,
    unlike sampling."""
    from ..stages import sketch

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("n_chars"))),
        batch_format="pyarrow",
    )
    return sketch.hist_quantiles(base, value_col="n_chars", bin_width=16)


SQL_LENGTH_QUANTILES = """
SELECT count(*)::BIGINT AS n,
       quantile_disc((n_chars // 16) * 16, 0.5)::BIGINT AS q50,
       quantile_disc((n_chars // 16) * 16, 0.9)::BIGINT AS q90,
       quantile_disc((n_chars // 16) * 16, 0.99)::BIGINT AS q99
FROM documents WHERE n_chars IS NOT NULL
"""


def q_quality_gate(sf_dir: str):
    """Sketch-driven ADAPTIVE filter: keep documents whose binned
    n_chars reaches the corpus median, where the median comes from the
    mergeable histogram sketch (exact-to-bin, so the whole
    threshold-then-filter chain is SQL-checkable). Each block reduces
    to one bincount partial; the driver sees only the tiny histogram
    and broadcasts ONE scalar; the gate itself is a pure streaming
    map — the shape of every distribution-relative curation cut
    ('drop the bottom half by length/quality') at 10^12 rows."""
    from ..stages import sketch

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("n_chars"))),
        batch_format="pyarrow",
    )
    qt = sketch.hist_quantiles(base, value_col="n_chars", bin_width=16)
    q50 = qt.column("q50")[0].as_py()

    def keep(b: pa.Table) -> pa.Table:
        binned = pc.multiply(
            pc.divide(pc.cast(b.column("n_chars"), pa.int64()), 16), 16
        )
        return b.filter(pc.greater_equal(binned, q50))

    return base.map_batches(keep, batch_format="pyarrow")


SQL_QUALITY_GATE = """
WITH q AS (SELECT quantile_disc((n_chars // 16) * 16, 0.5) AS q50
           FROM documents WHERE n_chars IS NOT NULL)
SELECT doc_id, n_chars FROM documents, q
WHERE n_chars IS NOT NULL AND (n_chars // 16) * 16 >= q.q50
"""


def q_bloom_blocklist(sf_dir: str):
    """Domain exclusion via the Bloom-prefiltered blocklist, scale
    form (r2 verdict #4): ~10 bits/key broadcast once, clean rows pay
    k bit-probes and no shuffle, maybe-rows anti-join the blocklist
    DATASET in a co-partitioned bucket groupby — no exact set is ever
    broadcast. ONE-PASS shape (r4 verdict #3): a single probe pass tags
    every row — the page stream is generated/scanned ONCE instead of
    once per branch — clean rows ride the groupby in passthrough
    buckets, maybe rows anti-join the blocklist in theirs. Result
    identical to the plain anti-join, same oracle shape as
    `blocklist_filter`."""
    import ray

    from ..stages import bloom

    blocked_ds = ray.data.from_arrow(
        pa.table(
            {"host": [f"h{k:02d}.example.com" for k in range(5)]}
        )
    )

    def host_col(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b.column("url"), r"//(?P<host>[^/]+)/"), "host"
        )
        return b.append_column("host", host)

    pages = pages_from_documents(sf_dir).map_batches(
        host_col, batch_format="pyarrow"
    )
    kept_pages = bloom.bloom_blocklist_filter_ds(
        pages, blocked_ds, key_col="host", n_expected=5, one_pass=True
    )
    ext = extract_pages(kept_pages, mode="text")

    def proj(b: pa.Table) -> pa.Table:
        b = host_col(b)
        return _i64(b.select(["url", "host", "n_words"]), ["n_words"])

    return ext.map_batches(proj, batch_format="pyarrow")


# the Bloom path must produce the IDENTICAL result set — same oracle
SQL_BLOOM_BLOCKLIST = SQL_BLOCKLIST_FILTER


def q_top_tokens_bounded(sf_dir: str):
    """Exact top-20 tokens with O(cap) summary state per block
    (Misra–Gries family: block top-C summaries → candidate union →
    exact recount of candidates only) — the bounded-vocabulary form of
    `top_tokens`, same oracle; the n/cap guarantee is checked and the
    operator raises rather than silently missing a heavy hitter."""
    from ..stages import heavyhitters

    return heavyhitters.top_k_bounded(_docs(sf_dir), k=20, cap=2048)


def q_pipeline_hygiene(sf_dir: str):
    """The full text-hygiene chain composed end to end in ONE checked
    query: deterministic dirt injection → benchmark decontamination
    (4-gram vs the doc_id%97==3 eval slice) → duplicate-line gate
    (drop any doc with repeated lines) → canonical normalization →
    PII redaction. Every stage is the same operator the standalone
    queries check; the SQL mirror composes their mirrors, so the
    CHAIN is bit-checked, not just the pieces. Output: the surviving
    clean corpus with redacted text and audit counts."""
    from ..stages import decontam, pii, repetition, text_stats

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )

    def inject(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        ids_s = pc.cast(b.column("doc_id"), pa.string())
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        # same residue classes as the standalone queries, applied in a
        # fixed order mirrored by the SQL
        txt = pc.if_else(
            pa.array(ids % 7 == 0),
            pc.binary_join_element_wise(txt, txt, "\n"), txt,
        )
        txt = pc.if_else(
            pa.array(ids % 11 == 0),
            pc.binary_join_element_wise(
                txt, pc.binary_join_element_wise(
                    pa.array(["contact user"] * len(b)), ids_s,
                    "@example.com", ""
                ), " "
            ), txt,
        )
        oct3 = pc.cast(pa.array(ids % 256), pa.string())
        txt = pc.if_else(
            pa.array(ids % 13 == 0),
            pc.binary_join_element_wise(
                txt, pc.binary_join_element_wise(
                    pa.array(["from 10.0."] * len(b)), oct3, ".7", ""
                ), " "
            ), txt,
        )
        txt = pc.if_else(
            pa.array(ids % 17 == 0),
            pc.binary_join_element_wise(txt, "call +1 555-000-1234", " "),
            txt,
        )
        txt = pc.if_else(
            pa.array(ids % 19 == 0),
            pc.binary_join_element_wise(
                "\x01pre\x02 ", txt, " \x1ftail", ""
            ), txt,
        )
        return pa.table({"doc_id": b.column("doc_id"), "text": txt})

    injected = base.map_batches(inject, batch_format="pyarrow")

    def mod_filter(want_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 3
            return b.filter(pa.array(m if want_eval else ~m))

        return f

    ev = injected.map_batches(mod_filter(True), batch_format="pyarrow")
    corpus = injected.map_batches(mod_filter(False), batch_format="pyarrow")

    flagged = decontam.decontaminate(corpus, ev, n=4)
    clean = flagged.map_batches(
        lambda b: b.filter(pc.invert(b.column("contaminated"))).select(
            ["doc_id", "text"]
        ),
        batch_format="pyarrow",
    )

    def no_dup_lines(b: pa.Table) -> pa.Table:
        rep = repetition.repetition_stats_batch(b)
        keep = pc.equal(rep.column("n_dup_lines"), 0)
        return b.filter(keep)

    gated = clean.map_batches(no_dup_lines, batch_format="pyarrow")

    normed = text_stats.normalize_text(gated)

    def renamed(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"), "text": b.column("text_norm")}
        )

    return pii.redact_pii(normed.map_batches(renamed, batch_format="pyarrow"))


SQL_PIPELINE_HYGIENE = f"""
WITH injected AS (
  SELECT doc_id,
    CASE WHEN doc_id % 19 = 0
         THEN chr(1) || 'pre' || chr(2) || ' ' || t4 || ' ' || chr(31) || 'tail'
         ELSE t4 END AS text
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 17 = 0 THEN t3 || ' call +1 555-000-1234'
           ELSE t3 END AS t4
    FROM (
      SELECT doc_id,
        CASE WHEN doc_id % 13 = 0
             THEN t2 || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7'
             ELSE t2 END AS t3
      FROM (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 0
               THEN t1 || ' contact user' || doc_id::VARCHAR || '@example.com'
               ELSE t1 END AS t2
        FROM (
          SELECT doc_id,
            CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || text
                 ELSE text END AS t1
          FROM documents WHERE text IS NOT NULL
        )
      )
    )
  )
),
toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM injected),
flat AS (SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts,1) AS ord
         FROM toks),
grams AS (
  SELECT a.doc_id, a.tok||' '||b.tok||' '||c.tok||' '||d.tok AS gram
  FROM flat a
  JOIN flat b ON b.doc_id=a.doc_id AND b.ord=a.ord+1
  JOIN flat c ON c.doc_id=a.doc_id AND c.ord=a.ord+2
  JOIN flat d ON d.doc_id=a.doc_id AND d.ord=a.ord+3
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 3),
contaminated AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN ev ON g.gram = ev.gram
  WHERE g.doc_id % 97 != 3
),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM injected WHERE doc_id % 97 != 3
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
dupped AS (
  SELECT doc_id FROM (
    SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line
  ) GROUP BY doc_id HAVING sum(c) - count(*) > 0
),
survivors AS (
  SELECT doc_id, text FROM injected
  WHERE doc_id % 97 != 3
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND doc_id NOT IN (SELECT doc_id FROM dupped)
),
normed AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(nfc_normalize(text),
              '{text_stats.NORM_CTRL_RE}', '', 'g'),
              '{text_stats.NORM_WS_RE}', ' ', 'g'), ' ') AS text
  FROM survivors
),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(text, '{_PII_E}'))::BIGINT AS n_email,
              regexp_replace(text, '{_PII_E}', '[EMAIL]', 'g') AS t
       FROM normed),
s2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t, '{_PII_I}'))::BIGINT AS n_ipv4,
              regexp_replace(t, '{_PII_I}', '[IP]', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4,
              len(regexp_extract_all(t, '{_PII_P}'))::BIGINT AS n_phone,
              regexp_replace(t, '{_PII_P}', '[PHONE]', 'g') AS t FROM s2)
SELECT doc_id, t AS text_redacted, n_email, n_ipv4, n_phone FROM s3
"""


def q_lm_perplexity(sf_dir: str):
    """CCNet-style n-gram LM quality scoring: a smoothed bigram LM is
    trained on a deterministic hash-sampled slice of the corpus, then
    every document is scored by average bigram log-probability (the
    classic perplexity quality filter). Scores are order-free integer
    fixed-point sums, so the DuckDB mirror is bit-exact — see
    stages/lm.py for the exactness contract."""
    from ..stages import lm

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lm.perplexity_scores(docs)


SQL_LM_PERPLEXITY = """
WITH train AS (
  SELECT string_split(COALESCE(text, ''), ' ') AS l FROM documents
  WHERE substr(md5(doc_id::VARCHAR), 1, 8) < '28f5c28f'
), uni AS (
  SELECT tok, count(*) AS c1
  FROM (SELECT unnest(l) AS tok FROM train) GROUP BY tok
), vsize AS (
  SELECT count(*) AS v FROM uni
), big AS (
  SELECT bg, count(*) AS c12
  FROM (
    SELECT l[s] || chr(31) || l[s + 1] AS bg
    FROM (SELECT l, unnest(range(1, len(l))) AS s
          FROM train WHERE len(l) >= 2)
  ) GROUP BY bg
), dbig AS (
  SELECT doc_id, l[s] AS w1, l[s] || chr(31) || l[s + 1] AS bg
  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS s
        FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l
              FROM documents)
        WHERE len(l) >= 2)
), terms AS (
  SELECT doc_id,
    CAST(floor(1e7 * ln(COALESCE(b.c12, 0) + 1)) AS BIGINT)
    - CAST(floor(1e7 * ln(COALESCE(u.c1, 0) + (SELECT v FROM vsize)))
           AS BIGINT) AS t
  FROM dbig LEFT JOIN big b USING (bg) LEFT JOIN uni u ON dbig.w1 = u.tok
), agg AS (
  SELECT doc_id, count(*) AS n, sum(t) AS s FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n, 0)::BIGINT AS n_bigrams,
       COALESCE(a.s, 0)::BIGINT AS score_fp,
       CASE WHEN a.n IS NULL THEN 0.0 ELSE a.s / (1e7 * a.n) END
         AS avg_logprob
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


MIX_TARGETS = {"en": 3.0, "de": 1.0, "fr": 1.0, "es": 1.0}


def q_mix_sample(sf_dir: str):
    """Deterministic training-mixture resampling (Pile/Llama-style data
    mixing): downsample per language to target proportions via pure
    per-row hash decisions — reproducible across runs and
    partitionings, SQL-mirrorable, no shuffle of document rows."""
    from ..stages import mix

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return mix.mixture_sample(docs, MIX_TARGETS)


_MIX_VALUES = ", ".join(
    f"('{lang}', {p})" for lang, p in MIX_TARGETS.items()
)

SQL_MIX_SAMPLE = f"""
WITH w AS (
  SELECT lang, p::DOUBLE AS p FROM (VALUES {_MIX_VALUES}) t(lang, p)
), counts AS (
  SELECT lang, count(*)::DOUBLE AS n FROM documents
  WHERE lang IN (SELECT lang FROM w) GROUP BY lang
), s AS (
  SELECT min(n / p) AS s FROM counts JOIN w USING (lang)
), th AS (
  SELECT w.lang, (w.p * (SELECT s FROM s)) / c.n AS rate,
         lower(lpad(to_hex(CAST(floor(((w.p * (SELECT s FROM s)) / c.n)
                                * 4294967296.0) AS BIGINT)), 8, '0')) AS hex
  FROM w JOIN counts c USING (lang)
)
SELECT d.doc_id, d.lang
FROM documents d JOIN th ON d.lang = th.lang
WHERE th.rate >= 1.0
   OR substr(md5(th.lang || '|' || d.doc_id::VARCHAR), 1, 8) < th.hex
"""


def q_inverted_index(sf_dir: str):
    """Inverted-index build: token → sorted posting list with a
    document-frequency cap (the IR stopword guard that also bounds the
    largest posting list a task holds at scale)."""
    from ..stages import index

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return index.inverted_index(docs, max_df=400)


SQL_INVERTED_INDEX = """
WITH pairs AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tok
    FROM documents)
)
SELECT tok AS token, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY tok HAVING count(*) <= 400
"""


def q_tfidf_topterms(sf_dir: str):
    """Per-document top-5 TF-IDF keywords. Integer fixed-point scores
    (floor(1e7·tf·ln(N/df))) make the ranking — and hence the result —
    bit-identical to the SQL mirror; see stages/index.py."""
    from ..stages import index

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return index.tfidf_topterms(docs, k=5)


SQL_TFIDF_TOPTERMS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks GROUP BY token
), n AS (
  SELECT count(*)::DOUBLE AS n FROM documents
), scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         CAST(floor(1e7 * (t.tf * ln((SELECT n FROM n) / d.df)))
              AS BIGINT) AS score_fp
  FROM tf t JOIN df d USING (token)
)
SELECT doc_id, token, tf, df, score_fp,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY score_fp DESC, token ASC)::BIGINT AS rank
FROM scored
QUALIFY rank <= 5
"""


def _linebreak_py(texts: list) -> list:
    """Python equivalent of LINEBREAK_SQL: lines of 8 space-separated
    words (the shared test-fixture injection — documents.text has no
    natural newlines)."""
    out = []
    for t in texts:
        w = (t or "").split(" ")
        out.append(
            "\n".join(" ".join(w[i:i + 8]) for i in range(0, len(w), 8))
        )
    return out


def q_gopher_rules(sf_dir: str):
    """Gopher quality-rule bundle (Rae et al. 2021 Table A1) over
    linebroken documents — all thresholds integer-exact (cross-
    multiplied ratios), so every rule boolean is bit-checked."""
    from ..stages import quality

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def inject(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": pa.array(
                    _linebreak_py(b.column("text").to_pylist()), pa.string()
                ),
            }
        )

    return quality.gopher_rules(
        docs.map_batches(inject, batch_format="pyarrow"), min_words=50
    )


SQL_GOPHER_RULES = f"""
WITH t AS (
  SELECT doc_id, {LINEBREAK_SQL.format(col="COALESCE(text, '')")} AS t2
  FROM documents
), words AS (
  SELECT doc_id, unnest(string_split_regex(t2, '[ \n]')) AS w FROM t
), wstats AS (
  SELECT doc_id, count(*) AS n_words, sum(len(w)) AS sum_len,
         count(*) FILTER (regexp_matches(w, '[a-zA-Z]')) AS n_alpha,
         count(DISTINCT w) FILTER (w IN {STOPWORDS_SQL}) AS n_stop
  FROM words GROUP BY doc_id
), lns AS (
  SELECT doc_id, unnest(string_split(t2, chr(10))) AS x FROM t
), lstats AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) FILTER (x LIKE '- %' OR x LIKE '* %' OR x LIKE '•%')
           AS n_bullet,
         count(*) FILTER (x LIKE '%...' OR x LIKE '%…') AS n_ell_lines
  FROM lns GROUP BY doc_id
), syms AS (
  SELECT doc_id,
         (len(t2) - len(replace(t2, '#', '')))
         + (len(t2) - len(replace(t2, '...', ''))) / 3
         + (len(t2) - len(replace(t2, '…', ''))) AS n_symbols
  FROM t
), j AS (
  SELECT w.doc_id, n_words, sum_len, n_alpha, n_stop, n_symbols,
         n_lines, n_bullet, n_ell_lines
  FROM wstats w JOIN lstats USING (doc_id) JOIN syms USING (doc_id)
)
SELECT doc_id,
  n_words::BIGINT AS n_words, sum_len::BIGINT AS sum_word_len,
  n_alpha::BIGINT AS n_alpha_words,
  n_stop::BIGINT AS n_stopwords_distinct,
  n_symbols::BIGINT AS n_symbols, n_lines::BIGINT AS n_lines,
  n_bullet::BIGINT AS n_bullet_lines,
  n_ell_lines::BIGINT AS n_ellipsis_lines,
  (n_words >= 50 AND n_words <= 100000) AS r_words,
  (sum_len >= 3 * n_words AND sum_len <= 10 * n_words) AS r_mean_len,
  (10 * n_symbols <= n_words) AS r_symbol,
  (10 * n_bullet <= 9 * n_lines) AS r_bullet,
  (10 * n_ell_lines <= 3 * n_lines) AS r_ellipsis,
  (5 * n_alpha >= 4 * n_words) AS r_alpha,
  (n_stop >= 2) AS r_stopwords,
  ((n_words >= 50 AND n_words <= 100000)
   AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
   AND (10 * n_symbols <= n_words)
   AND (10 * n_bullet <= 9 * n_lines)
   AND (10 * n_ell_lines <= 3 * n_lines)
   AND (5 * n_alpha >= 4 * n_words)
   AND (n_stop >= 2)) AS keep
FROM j
"""


def q_pipeline_pretrain(sf_dir: str):
    """The PRETRAINING-CORPUS chain composed end to end in ONE
    SQL-checked query: Gopher quality gate (full rule bundle) → exact
    text dedup (keep min doc_id per md5, one bucketed shuffle carrying
    each winner once) → leakage-safe train split → overlapping stride
    chunking of the surviving text. What a user actually feeds the
    tokenizer — every stage the scale-shaped operator."""
    import hashlib as _hl

    import numpy as np

    from ..stages import quality

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def gate(b: pa.Table) -> pa.Table:
        lb = pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "text": pa.array(
                    _linebreak_py(b.column("text").to_pylist()), pa.string()
                ),
            }
        )
        stats = quality.gopher_rules_batch(lb, min_words=50)
        return lb.filter(stats.column("keep"))

    def add_dig_bucket(b: pa.Table) -> pa.Table:
        digs = [
            _hl.md5(t.encode("utf-8")).hexdigest()
            for t in b.column("text").to_pylist()
        ]
        bucket = (
            np.frombuffer(
                bytes.fromhex("".join(d[:8] for d in digs)), dtype=">u4"
            ).astype(np.int64) % 64
            if digs else np.zeros(0, np.int64)
        )
        b = b.append_column("__dig", pa.array(digs, pa.string()))
        return b.append_column(
            "__bucket", pa.array(bucket.astype(np.int32), pa.int32())
        )

    def dedup_bucket(g: pa.Table) -> pa.Table:
        digs = np.asarray(g.column("__dig").to_pylist(), dtype=object)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, digs))
        first = np.r_[True, digs[order][1:] != digs[order][:-1]]
        return g.take(pa.array(order[first])).drop_columns(
            ["__dig", "__bucket"]
        )

    def keep_train(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        host = pc.utf8_lpad(
            pc.cast(pa.array(ids % 50), pa.string()), 2, "0"
        )
        urls = [
            f"https://h{h}.example.com/doc/{i}"
            for h, i in zip(host.to_pylist(), ids)
        ]
        keep = pa.array(
            [
                _hl.md5(u.encode("utf-8")).hexdigest()[:8] < "e6666666"
                for u in urls
            ]
        )
        return b.filter(keep)

    gated = docs.map_batches(gate, batch_format="pyarrow")
    pre = gated.map_batches(add_dig_bucket, batch_format="pyarrow")
    deduped = pre.groupby("__bucket").map_groups(
        dedup_bucket, batch_format="pyarrow"
    )
    train = deduped.map_batches(keep_train, batch_format="pyarrow")
    return text_stats.chunk_stride(train, size=200, stride=150)


SQL_PIPELINE_PRETRAIN = f"""
WITH t AS (
  SELECT doc_id, {LINEBREAK_SQL.format(col="COALESCE(text, '')")} AS t2
  FROM documents
), words AS (
  SELECT doc_id, unnest(string_split_regex(t2, '[ \n]')) AS w FROM t
), wstats AS (
  SELECT doc_id, count(*) AS n_words, sum(len(w)) AS sum_len,
         count(*) FILTER (regexp_matches(w, '[a-zA-Z]')) AS n_alpha,
         count(DISTINCT w) FILTER (w IN {STOPWORDS_SQL}) AS n_stop
  FROM words GROUP BY doc_id
), lns AS (
  SELECT doc_id, unnest(string_split(t2, chr(10))) AS x FROM t
), lstats AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) FILTER (x LIKE '- %' OR x LIKE '* %' OR x LIKE '•%')
           AS n_bullet,
         count(*) FILTER (x LIKE '%...' OR x LIKE '%…') AS n_ell_lines
  FROM lns GROUP BY doc_id
), syms AS (
  SELECT doc_id,
         (len(t2) - len(replace(t2, '#', '')))
         + (len(t2) - len(replace(t2, '...', ''))) / 3
         + (len(t2) - len(replace(t2, '…', ''))) AS n_symbols
  FROM t
), kept AS (
  SELECT t.doc_id, t.t2
  FROM t JOIN wstats w USING (doc_id) JOIN lstats USING (doc_id)
       JOIN syms USING (doc_id)
  WHERE (n_words >= 50 AND n_words <= 100000)
    AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
    AND (10 * n_symbols <= n_words)
    AND (10 * n_bullet <= 9 * n_lines)
    AND (10 * n_ell_lines <= 3 * n_lines)
    AND (5 * n_alpha >= 4 * n_words)
    AND (n_stop >= 2)
), deduped AS (
  SELECT doc_id, t2 FROM (
    SELECT doc_id, t2,
           row_number() OVER (PARTITION BY md5(t2) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
), train AS (
  SELECT doc_id, t2 FROM deduped
  WHERE substr(md5({URL_SQL}), 1, 8) < 'e6666666'
), c AS (
  SELECT doc_id, t2,
         unnest(range(CAST(ceil(length(t2) / 150.0) AS BIGINT))) AS i
  FROM train
)
SELECT doc_id, i::BIGINT AS chunk_id,
       substr(t2, (i * 150 + 1)::INTEGER, 200) AS chunk_text
FROM c
"""


def q_c4_clean(sf_dir: str):
    """C4-style line filtering (Raffel et al. 2020 §2.2): keep lines
    ending in terminal punctuation with ≥5 words, rebuild the document.
    Fixture injection (shared with the SQL mirror): linebreak every 8
    words, then '.'-terminate every 3rd line so the filter has a
    non-trivial mix; the cleaned TEXT itself is bit-checked."""
    from ..stages import quality

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def inject(b: pa.Table) -> pa.Table:
        out = []
        for t in _linebreak_py(b.column("text").to_pylist()):
            ls = t.split("\n")
            out.append(
                "\n".join(
                    x + "." if i % 3 == 0 else x for i, x in enumerate(ls)
                )
            )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": pa.array(out, pa.string()),
            }
        )

    return quality.c4_line_filter(
        docs.map_batches(inject, batch_format="pyarrow"), min_line_words=5
    )


SQL_C4_CLEAN = f"""
WITH t AS (
  SELECT doc_id, {LINEBREAK_SQL.format(col="COALESCE(text, '')")} AS t2
  FROM documents
), lns AS (
  SELECT doc_id, generate_subscripts(l, 1) AS s, unnest(l) AS x
  FROM (SELECT doc_id, string_split(t2, chr(10)) AS l FROM t)
), dotted AS (
  SELECT doc_id, s,
         CASE WHEN (s - 1) % 3 = 0 THEN x || '.' ELSE x END AS x
  FROM lns
), marked AS (
  SELECT doc_id, s, x,
         (regexp_matches(x, '[.!?"]$')
          AND len(x) - len(replace(x, ' ', '')) + 1 >= 5) AS keep
  FROM dotted
)
SELECT doc_id,
  COALESCE(string_agg(x, chr(10) ORDER BY s) FILTER (keep), '')
    AS text_clean,
  count(*)::BIGINT AS n_lines,
  count(*) FILTER (keep)::BIGINT AS n_kept
FROM marked GROUP BY doc_id
"""


def q_dsir_weights(sf_dir: str):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    fixed-point importance weights for every raw-pool document against
    a hash-defined target slice (doc_id % 13 == 1 stands in for the
    high-quality seed corpus). The 4096-bucket hashed-unigram
    distributions aggregate as narrow partials, the term vector
    broadcasts once, and scoring is a pure streaming actor-pool map —
    see stages/dsir.py for the scale contract."""
    from ..stages import dsir

    base = _docs(sf_dir)

    def mod_filter(want_target: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b.column("doc_id").to_numpy(zero_copy_only=False) % 13 == 1
            return b.filter(pa.array(m if want_target else ~m))

        return f

    target = base.map_batches(mod_filter(True), batch_format="pyarrow")
    raw = base.map_batches(mod_filter(False), batch_format="pyarrow")
    return dsir.dsir_weights(raw, target, id_col="doc_id")


# shared CTE core for the two DSIR oracles (weights + selection cut)
_DSIR_CORE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents
), feats AS (
  SELECT doc_id, substr(md5(tok), 1, 3) AS b FROM tok
), tc AS (
  SELECT b, count(*) AS n FROM feats WHERE doc_id % 13 = 1 GROUP BY b
), rc AS (
  SELECT b, count(*) AS n FROM feats WHERE doc_id % 13 != 1 GROUP BY b
), term AS (
  SELECT COALESCE(tc.b, rc.b) AS b,
         CAST(floor(1e7 * ln(COALESCE(tc.n, 0) + 1)) AS BIGINT)
         - CAST(floor(1e7 * ln(COALESCE(rc.n, 0) + 1)) AS BIGINT) AS t
  FROM tc FULL JOIN rc ON tc.b = rc.b
), df AS (
  SELECT doc_id, b, count(*) AS c FROM feats
  WHERE doc_id % 13 != 1 GROUP BY doc_id, b
), agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens,
         sum(c * t)::BIGINT AS weight_fp
  FROM df JOIN term USING (b) GROUP BY doc_id
)
"""

SQL_DSIR_WEIGHTS = _DSIR_CORE_SQL + """
SELECT doc_id, n_tokens, weight_fp,
       weight_fp / (1e7 * n_tokens) AS avg_weight
FROM agg
"""


def q_dsir_select(sf_dir: str):
    """The DSIR paper's actual SELECTION step composed end to end:
    importance weights → exact corpus-wide top-k cut via the
    distributed range-partition ranking (rank.global_rank — ONE
    narrow (weight_fp, doc_id) shuffle; ranking the whole corpus is
    the general "best N%" curation shape, the k-filter is free)."""
    import pyarrow.compute as _pc

    from ..stages import dsir, rank

    base = _docs(sf_dir)

    def mod_filter(want_target: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b.column("doc_id").to_numpy(zero_copy_only=False) % 13 == 1
            return b.filter(pa.array(m if want_target else ~m))

        return f

    target = base.map_batches(mod_filter(True), batch_format="pyarrow")
    raw = base.map_batches(mod_filter(False), batch_format="pyarrow")
    weights = dsir.dsir_weights(raw, target, id_col="doc_id")

    narrow = weights.map_batches(
        lambda b: b.select(["doc_id", "weight_fp"]),
        batch_format="pyarrow",
    )
    ranked = rank.global_rank(
        narrow, key_col="weight_fp", id_col="doc_id", descending=True
    )
    return ranked.map_batches(
        lambda b: b.filter(_pc.less(b.column("rank"), 100)),
        batch_format="pyarrow",
    )


SQL_DSIR_SELECT = _DSIR_CORE_SQL + """
SELECT doc_id, weight_fp, rank FROM (
  SELECT doc_id, weight_fp,
         (row_number() OVER (ORDER BY weight_fp DESC, doc_id) - 1)::BIGINT
           AS rank
  FROM agg
) WHERE rank < 100
"""


def q_line_dedup_clean(sf_dir: str):
    """RefinedWeb-style line-level boilerplate removal (Penedo et al.
    2023 §3.3): delete every layout line occurring in >= 2 distinct
    documents corpus-wide and return each doc's reassembled clean
    text. Zero-hit docs (the crawl majority) pass through shuffle-free;
    only Bloom-hit docs explode, exact-verify, and regroup — see
    stages/linefreq.py for the scale contract."""
    from ..stages import linefreq

    return linefreq.frequent_line_clean(
        _docs(sf_dir), text_col="text", id_col="doc_id", min_docs=2
    )


SQL_LINE_DEDUP_CLEAN = f"""
WITH base AS (
  SELECT doc_id, {LINEBREAK_SQL.format(col="COALESCE(text, '')")} AS lt
  FROM documents
), d AS (
  SELECT doc_id, string_split(lt, chr(10)) AS ls FROM base
), lt2 AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS i
  FROM d
), freq AS (
  SELECT line FROM lt2 GROUP BY line HAVING count(DISTINCT doc_id) >= 2
), kept AS (
  SELECT doc_id, i, line FROM lt2
  WHERE line NOT IN (SELECT line FROM freq)
), agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines FROM lt2 GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       t.n_lines,
       (t.n_lines - COALESCE(a.n_kept, 0))::BIGINT AS n_removed
FROM tot t LEFT JOIN agg a USING (doc_id)
"""


def q_host_pagerank(sf_dir: str):
    """Host-graph link centrality (fixed-point PageRank, 3 power
    iterations) — the CommonCrawl-style host-ranking step used as a
    quality prior in web-corpus sampling.  Edges are the corpus's
    deterministic cross-host projection: doc on host ``doc_id % 50``
    links to hosts ``(doc_id + s + 1) % 50`` for each of its
    ``1 + doc_id % 8`` outlinks (variable fanout → genuinely skewed
    in-link mass, so the ranks move away from uniform).  ONE narrow
    all-to-all collapses the edge set to the host-pair table; each
    iteration streams that table with the contrib vector broadcast
    once (stages/graphrank.py)."""
    import numpy as np

    from ..stages import graphrank

    base = _docs(sf_dir, columns=("doc_id",))

    def edges(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        fan = 1 + ids % 8
        src_h = np.repeat(ids % 50, fan)
        # per-doc link index 0..fan-1, fully vectorized
        cum = np.cumsum(fan)
        s = np.arange(cum[-1] if len(fan) else 0, dtype=np.int64) - \
            np.repeat(cum - fan, fan)
        dst_h = (np.repeat(ids, fan) + s + 1) % 50
        lab = np.char.add(
            "h", np.char.zfill(src_h.astype("U2"), 2))
        lab_d = np.char.add(
            "h", np.char.zfill(dst_h.astype("U2"), 2))
        return pa.table({
            "src": pa.array(lab.tolist(), pa.string()),
            "dst": pa.array(lab_d.tolist(), pa.string()),
        })

    e = base.map_batches(edges, batch_format="pyarrow")
    return graphrank.pagerank(e, n_iter=3)


def _pr_sql_iter(prev: str, cur: str) -> str:
    """One unrolled PageRank iteration (exact int64 mirror of
    stages/graphrank.py: floor-div contribs, damped floor-div update)."""
    return f""", a{cur} AS (
  SELECT p.dst AS node,
         sum(p.cnt * (r{prev}.r // deg.outdeg))::BIGINT AS agg
  FROM p JOIN deg USING (src) JOIN r{prev} ON r{prev}.node = p.src
  GROUP BY p.dst
), r{cur} AS (
  SELECT nodes.node,
         (((100 - 85) * (1000000000000 // (SELECT n FROM nn))) // 100
          + (85 * COALESCE(a{cur}.agg, 0)) // 100)::BIGINT AS r
  FROM nodes LEFT JOIN a{cur} USING (node)
)"""


# shared CTE chain for the two PageRank oracles (ranks + quality gate)
_PR_CORE_SQL = (
    """
WITH l AS (
  SELECT doc_id, unnest(range(1 + doc_id % 8)) AS s FROM documents
), e AS (
  SELECT 'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') AS src,
         'h' || lpad(((doc_id + s + 1) % 50)::VARCHAR, 2, '0') AS dst
  FROM l
), p AS (
  SELECT src, dst, count(*)::BIGINT AS cnt FROM e GROUP BY src, dst
), nodes AS (
  SELECT DISTINCT src AS node FROM p
  UNION SELECT DISTINCT dst FROM p
), nn AS (
  SELECT count(*)::BIGINT AS n FROM nodes
), deg AS (
  SELECT src, sum(cnt)::BIGINT AS outdeg FROM p GROUP BY src
), r0 AS (
  SELECT node, (1000000000000 // (SELECT n FROM nn))::BIGINT AS r
  FROM nodes
)"""
    + _pr_sql_iter("0", "1")
    + _pr_sql_iter("1", "2")
    + _pr_sql_iter("2", "3")
)

SQL_HOST_PAGERANK = _PR_CORE_SQL + """
SELECT node, r AS rank_fp, r / 1000000000000.0 AS rank FROM r3
"""


def q_pagerank_gate(sf_dir: str):
    """Centrality-as-quality-prior, composed end to end: rank hosts
    with `host_pagerank`, keep documents whose host is among the
    top 10 by rank (ties broken by host name).  The ranked-host table
    is the SMALL side — sorted/cut driver-side (node-sized, guarded
    upstream) and broadcast into a pure streaming doc filter; the
    corpus side never shuffles."""
    import numpy as np

    from ..stages import graphrank  # noqa: F401  (rank path below)

    ranks = q_host_pagerank(sf_dir).take_all()  # node-sized small side
    ranks.sort(key=lambda r: (-r["rank_fp"], r["node"]))
    # dense host-number → rank_fp lookup (-1 = gated out), vectorized
    lut = np.full(50, -1, dtype=np.int64)
    for r in ranks[:10]:
        lut[int(r["node"][1:])] = r["rank_fp"]

    base = _docs(sf_dir, columns=("doc_id",))

    def gate(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        fp = lut[ids % 50]
        mask = fp >= 0
        kept = ids[mask]
        lab = np.char.add(
            "h", np.char.zfill((kept % 50).astype("U2"), 2))
        return pa.table({
            "doc_id": pa.array(kept, pa.int64()),
            "host": pa.array(lab.tolist(), pa.string()),
            "host_rank_fp": pa.array(fp[mask], pa.int64()),
        })

    return base.map_batches(gate, batch_format="pyarrow")


SQL_PAGERANK_GATE = _PR_CORE_SQL + """
, top AS (
  SELECT node, r FROM r3
  QUALIFY row_number() OVER (ORDER BY r DESC, node) <= 10
)
SELECT doc_id,
       'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') AS host,
       top.r AS host_rank_fp
FROM documents
JOIN top ON top.node = 'h' || lpad((doc_id % 50)::VARCHAR, 2, '0')
"""


def q_kmeans_clusters(sf_dir: str):
    """Full-corpus distributed k-means (Lloyd's, k=8, 3 iterations)
    over the embedding table — the trainer behind every
    centroid-based curation step (SemDeDup cluster partition, IVF ANN
    coarse quantizer).  Exact int64 fixed-point arithmetic
    (stages/kmeans.py): every iteration is ONE streaming pass with
    the (k x dim) centroid matrix broadcast once; blocks pre-reduce
    to <= k partial rows; no shuffle anywhere.  Bit-identical to the
    unrolled long-form SQL mirror (quantize -> 3x assign/update ->
    final label)."""
    from ..stages import kmeans

    return kmeans.lloyd_kmeans(_emb(sf_dir), k=8, n_iter=3)


def _km_sql_iter(prev: str, cur: str) -> str:
    """One unrolled Lloyd iteration (exact int64 mirror of
    stages/kmeans.py: int distances, (dist, cl) argmin, floor-div
    centroid means via the explicit mod formula — DuckDB's ``//``
    truncates toward zero, numpy floors, the exactly-divisible
    numerator makes every division mode agree)."""
    return f""", dist{cur} AS (
  SELECT q.vec_id, c.cl, SUM((q.v - c.v) * (q.v - c.v))::BIGINT AS dist
  FROM q JOIN c{prev} c USING (d) GROUP BY q.vec_id, c.cl
), a{cur} AS (
  SELECT vec_id, cl, dist FROM (
    SELECT vec_id, cl, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl)
             AS rn
    FROM dist{cur}) WHERE rn = 1
), upd{cur} AS (
  SELECT a.cl, q.d, SUM(q.v)::BIGINT AS s, COUNT(*)::BIGINT AS n
  FROM a{cur} a JOIN q ON q.vec_id = a.vec_id GROUP BY a.cl, q.d
), c{cur} AS (
  SELECT p.cl, p.d,
         CAST(COALESCE(
           (u.s - (((u.s % u.n) + u.n) % u.n)) // u.n, p.v
         ) AS BIGINT) AS v
  FROM c{prev} p LEFT JOIN upd{cur} u ON u.cl = p.cl AND u.d = p.d
)"""


def _km_sql_core(src: str) -> str:
    """The shared kmeans CTE chain over source relation ``src``
    (must expose vec_id, embedding): quantize -> init -> 3 unrolled
    Lloyd iterations -> final assignment CTE ``af(vec_id, cl, dist)``."""
    return (
        f"""q AS (
  SELECT vec_id, d, CAST(FLOOR(CAST(e AS DOUBLE) * 1048576) AS BIGINT)
           AS v
  FROM (SELECT vec_id, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS d
        FROM {src})
), init AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM {src} ORDER BY vec_id LIMIT 8
), c0 AS (
  SELECT i.cl, q.d, q.v FROM q JOIN init i USING (vec_id)
)"""
        + _km_sql_iter("0", "1")
        + _km_sql_iter("1", "2")
        + _km_sql_iter("2", "3")
        + """, distF AS (
  SELECT q.vec_id, c.cl, SUM((q.v - c.v) * (q.v - c.v))::BIGINT AS dist
  FROM q JOIN c3 c USING (d) GROUP BY q.vec_id, c.cl
), af AS (
  SELECT vec_id, cl, dist FROM (
    SELECT vec_id, cl, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl)
             AS rn
    FROM distF) WHERE rn = 1
)"""
    )


SQL_KMEANS_CLUSTERS = (
    "WITH " + _km_sql_core("embeddings") + """
SELECT vec_id, cl AS cluster, dist AS dist_fp FROM af
"""
)


def q_semantic_dedup_kmeans(sf_dir: str):
    """SemDeDup with the EXACT fixed-point k-means partition
    (stages/kmeans.py semdedup_kmeans): the full paper pipeline —
    k-means cluster, then within-cluster drop-if-similar-to-an-
    earlier-item, earlier = closer to the centroid (exact int64
    dist_fp asc, ties by id) — now ENTIRELY SQL-mirrorable, unlike
    q_semantic_dedup whose sampled float centroids are rows-only.
    Same dup-injected corpus as q_semantic_dedup (random synthetic
    embeddings have no natural near-dups); output projected
    float-free to (vec_id, cluster, keep)."""
    from ..stages import kmeans

    def dup_some(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.less(b.column("vec_id"), 20))
        dup = pa.table(
            {
                "vec_id": pc.add(sel.column("vec_id"), 100000),
                "embedding": sel.column("embedding"),
            }
        )
        base = pa.table(
            {"vec_id": b.column("vec_id"), "embedding": b.column("embedding")}
        )
        return pa.concat_tables([base, dup])

    corpus = _emb(sf_dir).map_batches(dup_some, batch_format="pyarrow")
    return kmeans.semdedup_kmeans(corpus, threshold=0.95, k=8, n_iter=3)


SQL_SEMANTIC_DEDUP_KMEANS = (
    """
WITH all_e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 20
), """
    + _km_sql_core("all_e")
    + """, prior AS (
  SELECT a.vec_id,
         max(list_cosine_similarity(ea.embedding::DOUBLE[],
                                    eb.embedding::DOUBLE[])) AS mps
  FROM af a JOIN af b
    ON b.cl = a.cl
   AND (b.dist < a.dist OR (b.dist = a.dist AND b.vec_id < a.vec_id))
  JOIN all_e ea ON ea.vec_id = a.vec_id
  JOIN all_e eb ON eb.vec_id = b.vec_id
  GROUP BY a.vec_id
)
SELECT a.vec_id, a.cl AS cluster,
       (p.mps IS NULL OR p.mps <= 0.95) AS keep
FROM af a LEFT JOIN prior p USING (vec_id)
"""
)


def q_knn_ivf_fixed(sf_dir: str):
    """IVF approximate top-k whose coarse quantizer is the EXACT
    fixed-point k-means (stages/kmeans.py ivf_topk_fixed): 8 buckets,
    probe the 2 centroid-closest per query.  Unlike q_knn_ivf
    (sampled float centroids — rows-only), the approximation itself —
    including which true neighbors it misses — is deterministic
    integer arithmetic, so the approximate result is bit-mirrorable
    in SQL: the mirror reuses the kmeans CTE chain's distF table as
    the probe ranking (queries are corpus rows) and brute-forces
    cosine inside the probed buckets only."""
    from ..stages import kmeans

    return kmeans.ivf_topk_fixed(
        _emb(sf_dir), [0, 1, 2, 3, 4], k=10,
        n_buckets=8, n_iter=3, n_probe=2,
    )


SQL_KNN_IVF_FIXED = (
    "WITH " + _km_sql_core("embeddings") + """
, probes AS (
  SELECT vec_id AS query_id, cl
  FROM (SELECT vec_id, cl, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl)
                 AS rn
        FROM distF) WHERE rn <= 2 AND vec_id < 5
), qv AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, e.embedding
  FROM probes p JOIN af a ON a.cl = p.cl
  JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.vec_id != p.query_id
)
SELECT c.query_id, c.neighbor_id,
       row_number() OVER (
         PARTITION BY c.query_id
         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                         c.embedding::DOUBLE[]) DESC,
                  c.neighbor_id ASC) AS rank
FROM cand c JOIN qv q USING (query_id)
QUALIFY rank <= 10
"""
)


def q_pq_codes(sf_dir: str):
    """Product quantization (Jégou et al. 2011): train 4 independent
    16-dim sub-codebooks (k=4, 2 Lloyd iterations — the memory
    compression of billion-scale ANN: each 64-dim vector becomes 4
    two-bit codes) and encode the corpus.  ALL subspaces train in the
    SAME streaming pass per iteration (stages/pq.py fit_pq); exact
    int64 fixed-point throughout, so codebooks AND codes are
    bit-mirrorable in the unrolled SQL chain."""
    from ..stages import pq

    return pq.pq_codes(_emb(sf_dir), m=4, k=4, n_iter=2)


def _pq_sql_iter(prev: str, cur: str) -> str:
    """One unrolled per-subspace Lloyd iteration (exact int64 mirror
    of stages/pq.py — the kmeans _km_sql_iter contract applied with a
    (vec_id, s) grain: int distances, (dist, cl) argmin per
    subspace, floor-div centroid means via the explicit mod
    formula)."""
    return f""", pqd{cur} AS (
  SELECT q.vec_id, q.s, c.cl,
         SUM((q.v - c.v) * (q.v - c.v))::BIGINT AS dist
  FROM pqq q JOIN pc{prev} c ON c.s = q.s AND c.ds = q.ds
  GROUP BY q.vec_id, q.s, c.cl
), pqa{cur} AS (
  SELECT vec_id, s, cl FROM (
    SELECT vec_id, s, cl,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cl)
             AS rn
    FROM pqd{cur}) WHERE rn = 1
), pqu{cur} AS (
  SELECT a.s, a.cl, q.ds, SUM(q.v)::BIGINT AS sm, COUNT(*)::BIGINT AS n
  FROM pqa{cur} a JOIN pqq q ON q.vec_id = a.vec_id AND q.s = a.s
  GROUP BY a.s, a.cl, q.ds
), pc{cur} AS (
  SELECT p.s, p.cl, p.ds,
         CAST(COALESCE(
           (u.sm - (((u.sm % u.n) + u.n) % u.n)) // u.n, p.v
         ) AS BIGINT) AS v
  FROM pc{prev} p LEFT JOIN pqu{cur} u
    ON u.s = p.s AND u.cl = p.cl AND u.ds = p.ds
)"""


def _pq_sql_core(src: str, *, m: int = 4, dsub: int = 16,
                 k: int = 4) -> str:
    """The shared PQ CTE chain over source relation ``src`` (must
    expose vec_id, embedding): quantize -> subspace split -> init ->
    2 unrolled per-subspace Lloyd iterations -> final per-subspace
    assignment CTE ``pqaf(vec_id, s, cl)`` (codebooks live in
    ``pc2``)."""
    return (
        f"""pqfull AS (
  SELECT vec_id, CAST(d AS BIGINT) AS d,
         CAST(FLOOR(CAST(e AS DOUBLE) * 1048576) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS d
        FROM {src})
), pqq AS (
  SELECT vec_id, (d - 1) // {dsub} AS s, ((d - 1) % {dsub}) + 1 AS ds, v
  FROM pqfull
), pqinit AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM {src} ORDER BY vec_id LIMIT {k}
), pc0 AS (
  SELECT q.s, i.cl, q.ds, q.v FROM pqq q JOIN pqinit i USING (vec_id)
)"""
        + _pq_sql_iter("0", "1")
        + _pq_sql_iter("1", "2")
        + """, pqdF AS (
  SELECT q.vec_id, q.s, c.cl,
         SUM((q.v - c.v) * (q.v - c.v))::BIGINT AS dist
  FROM pqq q JOIN pc2 c ON c.s = q.s AND c.ds = q.ds
  GROUP BY q.vec_id, q.s, c.cl
), pqaf AS (
  SELECT vec_id, s, cl FROM (
    SELECT vec_id, s, cl,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cl)
             AS rn
    FROM pqdF) WHERE rn = 1
)"""
    )


SQL_PQ_CODES = (
    "WITH " + _pq_sql_core("embeddings") + """
SELECT vec_id,
       max(CASE WHEN s = 0 THEN cl END)::BIGINT AS c0,
       max(CASE WHEN s = 1 THEN cl END)::BIGINT AS c1,
       max(CASE WHEN s = 2 THEN cl END)::BIGINT AS c2,
       max(CASE WHEN s = 3 THEN cl END)::BIGINT AS c3,
       (max(CASE WHEN s = 0 THEN cl END) * 64
        + max(CASE WHEN s = 1 THEN cl END) * 16
        + max(CASE WHEN s = 2 THEN cl END) * 4
        + max(CASE WHEN s = 3 THEN cl END))::BIGINT AS code
FROM pqaf GROUP BY vec_id
"""
)


def q_pq_adc_topk(sf_dir: str):
    """PQ asymmetric-distance top-k (Jégou et al. 2011 §4.2): per
    query an exact (m x k) int64 distance table; every candidate's
    approximate distance is 4 integer table lookups — the search
    shape that makes billion-scale ANN affordable.  Deterministic
    integer arithmetic end to end, so the APPROXIMATE result itself
    (including which true neighbors it misses) is bit-checked against
    the SQL mirror."""
    from ..stages import pq

    return pq.pq_adc_topk(
        _emb(sf_dir), [0, 1, 2, 3, 4], k_neighbors=10,
        m=4, k=4, n_iter=2,
    )


SQL_PQ_ADC_TOPK = (
    "WITH " + _pq_sql_core("embeddings") + """
, pqqv AS (
  SELECT vec_id AS query_id, s, ds, v FROM pqq WHERE vec_id < 5
), pqdt AS (
  SELECT qv.query_id, c.s, c.cl,
         SUM((qv.v - c.v) * (qv.v - c.v))::BIGINT AS dd
  FROM pqqv qv JOIN pc2 c ON c.s = qv.s AND c.ds = qv.ds
  GROUP BY qv.query_id, c.s, c.cl
), pqadc AS (
  SELECT dt.query_id, a.vec_id AS neighbor_id,
         SUM(dt.dd)::BIGINT AS adc_dist_fp
  FROM pqaf a JOIN pqdt dt ON dt.s = a.s AND dt.cl = a.cl
  WHERE a.vec_id != dt.query_id
  GROUP BY dt.query_id, a.vec_id
)
SELECT query_id, neighbor_id, adc_dist_fp,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY adc_dist_fp, neighbor_id
       ) AS BIGINT) AS rank
FROM pqadc QUALIFY rank <= 10
"""
)


def q_train_shuffle(sf_dir: str):
    """Deterministic global training shuffle — the shuffle-before-
    sequence-packing step: every doc gets a pseudorandom but
    reproducible position (rank of md5(doc_id), ties by doc_id; salt
    the key to derive a fresh epoch permutation).  ONE narrow
    (shuffle_key, doc_id) range-partition shuffle via
    rank.global_rank; the corpus text never moves."""
    from ..stages import rank

    base = _docs(sf_dir, columns=("doc_id",))

    def key(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column("doc_id"), pa.int64())
        # per-row md5 is the SQL-parity contract (DuckDB md5() mirror)
        ks = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            for i in ids.to_pylist()
        ]
        return pa.table({
            "doc_id": ids,
            "shuffle_key": pa.array(ks, pa.int64()),
        })

    narrow = base.map_batches(key, batch_format="pyarrow")
    return rank.global_rank(
        narrow, key_col="shuffle_key", id_col="doc_id", descending=False
    )


SQL_TRAIN_SHUFFLE = """
SELECT doc_id,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
         AS shuffle_key,
       (row_number() OVER (
          ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                   doc_id) - 1)::BIGINT AS rank
FROM documents
"""


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink exactness: documents → JSON-lines shards
    (one file per block, the Dolma/RedPajama interchange shape) →
    read back.  The oracle is the original table — the roundtrip must
    be bit-exact through the text boundary (unicode escapes, int64,
    nulls)."""
    import tempfile

    from ..sources import jsonl

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    jsonl.write_jsonl(ds, out)
    back = jsonl.read_jsonl(out)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    return back.map_batches(
        lambda b: b.select(cols), batch_format="pyarrow"
    )


SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_csv_roundtrip(sf_dir: str):
    """CSV source/sink exactness: documents → quoted CSV shards →
    read back.  Same identity-oracle contract as `jsonl_roundtrip`;
    the quoting scheme keeps null and empty string distinct."""
    import tempfile

    from ..sources import csvio

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="csv_rt_", dir="/tmp")
    csvio.write_csv(ds, out)
    back = csvio.read_csv(out)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    return back.map_batches(
        lambda b: b.select(cols), batch_format="pyarrow"
    )


SQL_CSV_ROUNDTRIP = SQL_JSONL_ROUNDTRIP


def q_warc_roundtrip(sf_dir: str):
    """WARC source/sink exactness (ISO 28500, the CommonCrawl crawl
    interchange): documents → record-gzip WARC shards (one gzip member
    per record, CommonCrawl's actual layout) → streaming record parse
    back.  text crosses as the byte-exact payload (Content-Length
    framing, no escaping), doc_id / lang / source / n_chars as
    WARC-X- extension headers.  Identity oracle like the JSONL/CSV
    contracts."""
    import tempfile

    from ..sources import warc

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet")

    def to_warc_shape(b: pa.Table) -> pa.Table:
        did = pc.cast(b.column("doc_id"), pa.string())
        rec_id = pc.binary_join_element_wise(
            "<urn:gocrd:doc:", did, ">", "")
        return pa.table({
            "rec_id": rec_id,
            "url": pc.binary_join_element_wise(
                "http://", b.column("source"), "/", did, ""),
            "warc_ts": pa.array(
                [1767225600000000] * len(b), pa.int64()
            ).cast(pa.timestamp("us")),  # 2026-01-01T00:00:00Z
            "payload": pc.cast(b.column("text"), pa.binary()),
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "source": b.column("source"),
            "n_chars": b.column("n_chars"),
        })

    out = tempfile.mkdtemp(prefix="warc_rt_", dir="/tmp")
    warc.write_warc(
        ds.map_batches(to_warc_shape, batch_format="pyarrow"), out,
        x_cols=("doc_id", "lang", "source", "n_chars"),
        compression="record-gzip")
    back = warc.read_warc(
        out, x_cols={"doc_id": "int64", "lang": "string",
                     "source": "string", "n_chars": "int64"})

    def from_warc_shape(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.cast(b.column("payload"), pa.string()),
            "lang": b.column("lang"),
            "source": b.column("source"),
            "n_chars": b.column("n_chars"),
        })

    return back.map_batches(from_warc_shape, batch_format="pyarrow")


SQL_WARC_ROUNDTRIP = SQL_JSONL_ROUNDTRIP


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer-merge training (Sennrich 2016): the
    corpus-scale work is ONE narrow (word, n) partial-count groupby +
    an exact top-50k type cut; the 8 merge iterations run driver-local
    on the bounded word-type table — the production-trainer shape (a
    tokenizer learns merges from word frequencies, never the raw token
    stream).  Merge application follows the two-pass padded-replace
    contract (stages/bpe.py docstring) so the unrolled-CTE DuckDB
    mirror is bit-exact including argmax tie-breaks."""
    from ..stages import bpe

    return bpe.bpe_merges(
        _docs(sf_dir, columns=("text",)),
        n_merges=bpe.DEFAULT_MERGES,
        max_types=bpe.DEFAULT_MAX_TYPES,
    )


def _bpe_merge_ctes(k: int, max_types: int) -> list:
    """Unrolled K-iteration BPE merge CTEs (shared by the train and
    encode mirrors).  MATERIALIZED CTEs are load-bearing: DuckDB
    inlines plain CTEs, so a chained unroll otherwise re-expands the
    whole prefix at every step (exponential plan).  replace() in
    DuckDB is leftmost-nonoverlapping exactly like Python's
    str.replace — the contract stages/bpe.py pins."""
    s = "chr(31)"  # the SEP framing byte, U+001F
    ctes = [
        f"""t0 AS MATERIALIZED (
  SELECT word, n, array_to_string(regexp_extract_all(word, '(?s).'), {s}) AS sym
  FROM (
    SELECT t AS word, count(*)::BIGINT AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE t <> '' GROUP BY t
    QUALIFY row_number() OVER (ORDER BY n DESC, word ASC) <= {max_types}
  ))"""
    ]
    for i in range(1, k + 1):
        p = i - 1
        pat = f"{s}||(SELECT l FROM m{i})||{s}||(SELECT r FROM m{i})||{s}"
        rep = f"{s}||(SELECT l FROM m{i})||(SELECT r FROM m{i})||{s}"
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT pr[1] AS l, pr[2] AS r, sum(n)::BIGINT AS pn
  FROM (SELECT n, unnest(list_zip(arr[1:len(arr)-1], arr[2:len(arr)])) AS pr
        FROM (SELECT n, string_split(sym, {s}) AS arr FROM t{p})
        WHERE len(arr) > 1)
  GROUP BY pr[1], pr[2])"""
        )
        ctes.append(
            f"m{i} AS MATERIALIZED "
            f"(SELECT l, r, pn FROM c{i} ORDER BY pn DESC, l ASC, r ASC LIMIT 1)"
        )
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT word, n, substr(padded, 2, len(padded) - 2) AS sym
  FROM (SELECT word, n,
               replace(replace({s}||sym||{s}, {pat}, {rep}), {pat}, {rep})
                 AS padded
        FROM t{p}))"""
        )
    return ctes


def _bpe_sql(k: int, max_types: int) -> str:
    ctes = _bpe_merge_ctes(k, max_types)
    finals = " UNION ALL ".join(
        f'SELECT {i}::BIGINT AS step, l AS "left", r AS "right", pn AS pair_n '
        f"FROM m{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({finals}) ORDER BY step"
    )


def _bpe_encode_sql(k: int, max_types: int) -> str:
    """Encode mirror: re-derives the K merges via the shared CTE chain,
    then applies them to every doc with the same framed two-pass
    replace contract and reads the token count off the separator-count
    identity (stages/bpe.token_counts_from_framed docstring)."""
    s = "chr(31)"
    ctes = _bpe_merge_ctes(k, max_types)
    ctes.append(
        f"""enc0 AS MATERIALIZED (
  SELECT doc_id,
         {s} || replace(
           regexp_replace(
             trim(regexp_replace(coalesce(text, ''), ' +', ' ', 'g'), ' '),
             '(?s)(.)', '\\1' || {s}, 'g'),
           {s}||' '||{s}, {s}||{s}) AS x
  FROM documents)"""
    )
    for i in range(1, k + 1):
        pat = f"{s}||(SELECT l FROM m{i})||{s}||(SELECT r FROM m{i})||{s}"
        rep = f"{s}||(SELECT l FROM m{i})||(SELECT r FROM m{i})||{s}"
        ctes.append(
            f"""enc{i} AS MATERIALIZED (
  SELECT doc_id, replace(replace(x, {pat}, {rep}), {pat}, {rep}) AS x
  FROM enc{i - 1})"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT doc_id,
       ((len(x) - len(replace(x, {s}, '')))
        - (len(x) - len(replace(x, {s}||{s}, ''))) / 2
        - 1)::BIGINT AS n_tokens
FROM enc{k}"""
    )


SQL_BPE_MERGES = _bpe_sql(8, 50_000)
SQL_BPE_TOKEN_COUNTS = _bpe_encode_sql(8, 50_000)


def q_bpe_token_counts(sf_dir: str):
    """Per-doc token counts under the corpus-learned BPE merges — the
    token-budget pass of a training-mix pipeline.  Train = bpe_merges
    (one narrow groupby + driver-local loop on the bounded type
    table); encode = a pure streaming map (two vectorized Arrow
    literal-replace passes per merge on the framed string, no
    shuffle), with the count read off the separator-count identity."""
    from ..stages import bpe

    merges = bpe.bpe_merges(
        _docs(sf_dir, columns=("text",)),
        n_merges=bpe.DEFAULT_MERGES,
        max_types=bpe.DEFAULT_MAX_TYPES,
    )
    return bpe.encode_token_counts(_docs(sf_dir), merges)


def q_token_entropy(sf_dir: str):
    """Per-document unigram Shannon entropy (token-diversity /
    repetition quality signal) as order-free int64 fixed point — pure
    streaming map, zero shuffle (stages/text_stats.py entropy_batch)."""
    from ..stages import text_stats

    return text_stats.token_entropy(_docs(sf_dir))


SQL_TOKEN_ENTROPY = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), agg AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_types,
         sum(c * CAST(floor(1e7 * ln(c)) AS BIGINT))::BIGINT AS sum_clnc
  FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types,
       (n_tokens * CAST(floor(1e7 * ln(n_tokens)) AS BIGINT)
        - sum_clnc)::BIGINT AS entropy_fp,
       (n_tokens * CAST(floor(1e7 * ln(n_tokens)) AS BIGINT)
        - sum_clnc) / (1e7 * n_tokens) AS entropy
FROM agg
"""


# The curated sources standing in for the positive (high-quality)
# class of the GPT-3-style NB quality classifier — must stay in sync
# with the IN lists of SQL_NB_QUALITY.
NB_POS_SOURCES = ("src0", "src5", "src10", "src15")


def q_nb_quality(sf_dir: str):
    """GPT-3-style curated-vs-crawl quality classifier (Brown et al.
    2020 §A): Naive-Bayes log-odds over hashed unigram buckets, scored
    corpus-wide, with the paper's Pareto(9) randomized keep rule made
    deterministic per doc_id — see stages/nbq.py for the exactness
    contract (integer-ln terms, softsign calibration, pow-free Pareto
    comparison) and the zero-shuffle scale shape."""
    from ..stages import nbq

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def src_filter(positive: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.is_in(
                b.column("source"), value_set=pa.array(NB_POS_SOURCES)
            )
            return b.filter(m if positive else pc.invert(m))

        return f

    pos = docs.map_batches(src_filter(True), batch_format="pyarrow")
    neg = docs.map_batches(src_filter(False), batch_format="pyarrow")
    return nbq.nb_quality_filter(docs, pos, neg)


_NB_POS_IN = ", ".join(f"'{s}'" for s in NB_POS_SOURCES)

SQL_NB_QUALITY = f"""
WITH feats AS (
  SELECT doc_id, source, substr(md5(tok), 1, 3) AS b
  FROM (SELECT doc_id, source,
               unnest(string_split(COALESCE(text, ''), ' ')) AS tok
        FROM documents)
), pch AS (
  SELECT b, count(*) AS n FROM feats
  WHERE source IN ({_NB_POS_IN}) GROUP BY b
), nch AS (
  SELECT b, count(*) AS n FROM feats
  WHERE source NOT IN ({_NB_POS_IN}) GROUP BY b
), tot AS (
  SELECT (SELECT COALESCE(sum(n), 0) FROM pch) AS np,
         (SELECT COALESCE(sum(n), 0) FROM nch) AS nn
), dc AS (
  SELECT (SELECT count(*) FROM documents
          WHERE source IN ({_NB_POS_IN})) AS dp,
         (SELECT count(*) FROM documents
          WHERE source NOT IN ({_NB_POS_IN})) AS dn
), term AS (
  SELECT COALESCE(p.b, q.b) AS b,
         CAST(floor(1e7 * ln(COALESCE(p.n, 0) + 1)) AS BIGINT)
         - CAST(floor(1e7 * ln(COALESCE(q.n, 0) + 1)) AS BIGINT)
         - (CAST(floor(1e7 * ln(np + 4096)) AS BIGINT)
            - CAST(floor(1e7 * ln(nn + 4096)) AS BIGINT)) AS t
  FROM pch p FULL JOIN nch q ON p.b = q.b, tot
), df AS (
  SELECT doc_id, b, count(*) AS c FROM feats GROUP BY doc_id, b
), agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, sum(c * t)::BIGINT AS sfp
  FROM df JOIN term USING (b) GROUP BY doc_id
), sc AS (
  SELECT doc_id, n_tokens,
         (sfp + CAST(floor(1e7 * ln(dp)) AS BIGINT)
              - CAST(floor(1e7 * ln(dn)) AS BIGINT))::BIGINT AS score_fp
  FROM agg, dc
), k1 AS (
  SELECT doc_id, n_tokens, score_fp,
         score_fp / (1e7 * n_tokens) AS a
  FROM sc
), k2 AS (SELECT *, 0.5 + a / (2.0 * (1.0 + abs(a))) AS s FROM k1
), k3 AS (SELECT *, 2.0 - s AS t FROM k2
), k4 AS (SELECT *, t * t AS t2 FROM k3
), k5 AS (SELECT *, t2 * t2 AS t4 FROM k4
), k6 AS (SELECT *, t4 * t4 AS t8 FROM k5
), k7 AS (
  SELECT *, (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)
            / 4294967296.0 AS u
  FROM k6
)
SELECT doc_id, n_tokens, score_fp, (u * (t * t8) < 1.0) AS keep FROM k7
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail per-language perplexity terciles (Wenzek
    et al. 2020 §4.4) — the highest-quality-third cut CCNet ships.
    Exact quantile_disc boundaries from a histogram-refine scheme
    (zero shuffle; see stages/ccnet.py)."""
    from ..stages import ccnet

    return ccnet.ccnet_buckets(
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
    )


SQL_CCNET_BUCKETS = """
WITH train AS (
  SELECT string_split(COALESCE(text, ''), ' ') AS l FROM documents
  WHERE substr(md5(doc_id::VARCHAR), 1, 8) < '28f5c28f'
), uni AS (
  SELECT tok, count(*) AS c1
  FROM (SELECT unnest(l) AS tok FROM train) GROUP BY tok
), vsize AS (
  SELECT count(*) AS v FROM uni
), big AS (
  SELECT bg, count(*) AS c12
  FROM (
    SELECT l[s] || chr(31) || l[s + 1] AS bg
    FROM (SELECT l, unnest(range(1, len(l))) AS s
          FROM train WHERE len(l) >= 2)
  ) GROUP BY bg
), dbig AS (
  SELECT doc_id, l[s] AS w1, l[s] || chr(31) || l[s + 1] AS bg
  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS s
        FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l
              FROM documents)
        WHERE len(l) >= 2)
), terms AS (
  SELECT doc_id,
    CAST(floor(1e7 * ln(COALESCE(b.c12, 0) + 1)) AS BIGINT)
    - CAST(floor(1e7 * ln(COALESCE(u.c1, 0) + (SELECT v FROM vsize)))
           AS BIGINT) AS t
  FROM dbig LEFT JOIN big b USING (bg) LEFT JOIN uni u ON dbig.w1 = u.tok
), lmagg AS (
  SELECT doc_id, count(*) AS n, sum(t) AS s FROM terms GROUP BY doc_id
), keyed AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN a.n IS NULL THEN 0
              ELSE ((-a.s * 1000)
                    - ((((-a.s * 1000) % a.n) + a.n) % a.n)) // a.n
         END::BIGINT AS ppl_key
  FROM documents d LEFT JOIN lmagg a USING (doc_id)
), nl AS (
  SELECT lang, count(*) AS n FROM keyed GROUP BY lang
), ranked AS (
  SELECT lang, ppl_key,
         row_number() OVER (PARTITION BY lang ORDER BY ppl_key, doc_id)
           AS rn
  FROM keyed
), cut AS (
  SELECT r.lang,
         max(CASE WHEN rn = CAST(ceil((1.0 / 3.0) * n) AS BIGINT)
                  THEN ppl_key END) AS v1,
         max(CASE WHEN rn = CAST(ceil((2.0 / 3.0) * n) AS BIGINT)
                  THEN ppl_key END) AS v2
  FROM ranked r JOIN nl USING (lang) GROUP BY r.lang
)
SELECT k.doc_id, k.lang, k.ppl_key,
       CASE WHEN k.ppl_key <= c.v1 THEN 'head'
            WHEN k.ppl_key <= c.v2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM keyed k JOIN cut c USING (lang)
"""


def q_host_components(sf_dir: str):
    """Site-level clustering of the web HOST graph (connected
    components over link edges) — the web-graph analysis behind
    mirror-site / link-farm detection in crawl curation.  Edges are a
    deterministic sparse projection of the corpus: the doc on host
    ``doc_id % 50`` links to host ``decade(src) + (src%10 + 1 +
    doc_id%4) % 10`` — links stay inside each decade of hosts, so the
    graph has exactly five components regardless of corpus size.
    Components run on the DISTRIBUTED pointer-doubling labels
    (stages/dedup.py connected_components_distributed — dataset-
    resident label table, O(log diameter) rounds); the driver never
    sees a node list."""
    import numpy as np

    from ..stages import dedup as _dedup

    base = _docs(sf_dir, columns=("doc_id",))

    def edges(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        src = ids % 50
        dst = src - (src % 10) + ((src % 10) + 1 + (ids % 4)) % 10
        # block-local dedupe (no shuffle): the host graph is tiny next
        # to the corpus, and components are duplicate-edge-tolerant,
        # so collapsing repeats here shrinks every CC join round
        uniq = np.unique(src * np.int64(64) + dst)
        return pa.table({
            "id_a": pa.array((uniq // 64).astype(np.int64), pa.int64()),
            "id_b": pa.array((uniq % 64).astype(np.int64), pa.int64()),
        })

    labels = _dedup.connected_components_distributed(
        base.map_batches(edges, batch_format="pyarrow")
    )

    def fmt(b: pa.Table) -> pa.Table:
        import numpy as np

        h = b.column("doc_id").to_numpy(zero_copy_only=False)
        c = b.column("cluster_id").to_numpy(zero_copy_only=False)
        lab = np.char.add("h", np.char.zfill(h.astype("U2"), 2))
        comp = np.char.add("h", np.char.zfill(c.astype("U2"), 2))
        return pa.table({
            "host": pa.array(lab.tolist(), pa.string()),
            "component": pa.array(comp.tolist(), pa.string()),
        })

    return labels.map_batches(fmt, batch_format="pyarrow")


SQL_HOST_COMPONENTS = """
WITH RECURSIVE e AS (
  SELECT DISTINCT (doc_id % 50) AS a,
         (doc_id % 50) - ((doc_id % 50) % 10)
         + (((doc_id % 50) % 10) + 1 + (doc_id % 4)) % 10 AS b
  FROM documents
), sym AS (
  SELECT a, b FROM e UNION SELECT b, a FROM e
), cc(node, lbl) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, c.lbl FROM sym s JOIN cc c ON c.node = s.b
)
SELECT 'h' || lpad(node::VARCHAR, 2, '0') AS host,
       'h' || lpad(min(lbl)::VARCHAR, 2, '0') AS component
FROM cc GROUP BY node
"""


def q_dedup_media(sf_dir: str):
    """Exact byte-level media deduplication — the content-hash image
    dedup step of multimodal crawl pipelines (LAION-style): every
    media row is assigned the canonical (min) id of its payload-digest
    group.  Shape: one digest pass (md5 over the binary payload,
    hashed per block), ONE narrow (digest, id) groupby for the
    canonical map, and a bucketed hash join attaching the canonical id
    back to each row (both sides shuffle only 32-byte digests + ids —
    payloads never move).  The synthetic corpus reuses the image_meta
    generator, whose payload is an injective function of
    ``doc_id % 256`` — which is what lets the oracle mirror the digest
    GROUPS without reconstructing binary payloads in SQL."""
    import hashlib as _hl

    import numpy as np

    from ..stages.join import partitioned_hash_join
    from ..stages import multimodal as mm

    docs = _docs(sf_dir, columns=("doc_id",))

    def gen(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            w, h = 16 + i % 32, 16 + i % 16
            color = (i % 256, (i * 7) % 256, (i * 13) % 256)
            arr = np.full((h, w, 3), color, dtype=np.uint8)
            payloads.append(
                mm.encode_ppm(arr) if i % 2 == 0 else mm.encode_bmp(arr)
            )
        return pa.table(
            {
                "media_num": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    def digest(b: pa.Table) -> pa.Table:
        d = [
            _hl.md5(p).hexdigest()
            for p in b.column("payload").to_pylist()
        ]
        return pa.table({
            "digest": pa.array(d, pa.string()),
            "media_num": b.column("media_num"),
        })

    hashed = docs.map_batches(gen, batch_format="pyarrow").map_batches(
        digest, batch_format="pyarrow"
    ).materialize()  # consumed twice: canonical map + join-back

    canon = hashed.groupby("digest").min("media_num").map_batches(
        lambda b: b.rename_columns(["digest_r", "canonical_num"]),
        batch_format="pyarrow",
    )
    joined = partitioned_hash_join(
        hashed, canon, left_key="digest", right_key="digest_r",
        n_buckets=8,
    )

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": pc.cast(b.column("media_num"), pa.string()),
            "canonical": pc.cast(b.column("canonical_num"), pa.string()),
        })

    return joined.map_batches(fmt, batch_format="pyarrow")


SQL_DEDUP_MEDIA = """
WITH g AS (
  SELECT doc_id, doc_id % 256 AS grp FROM documents
), canon AS (
  SELECT grp, min(doc_id) AS canonical FROM g GROUP BY grp
)
SELECT g.doc_id::VARCHAR AS media_id, c.canonical::VARCHAR AS canonical
FROM g JOIN canon c USING (grp)
"""


def q_best_per_host(sf_dir: str):
    """Canonical-page selection: keep ONE best document per host (the
    curation step after URL/host clustering — 'of this site's pages,
    keep the most substantial one').  Best = max n_chars, ties to the
    lowest doc_id.  Scale shape: per-block vectorized argmax partials
    (<= n_hosts narrow rows per block, the heavyhitters pattern), then
    ONE tiny host-keyed groupby over partials — the corpus text never
    shuffles."""
    import numpy as np

    base = _docs(sf_dir, columns=("doc_id", "n_chars"))

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({
                "host_num": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
            })
        hosts = ids % 50
        # block-local best per host: order by (host, -n_chars, doc_id),
        # keep the first row of each host run
        order = np.lexsort((ids, -nch, hosts))
        h_sorted = hosts[order]
        first = np.concatenate(([True], h_sorted[1:] != h_sorted[:-1]))
        keep = order[first]
        return pa.table({
            "host_num": pa.array(hosts[keep].astype(np.int64), pa.int64()),
            "doc_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
            "n_chars": pa.array(nch[keep].astype(np.int64), pa.int64()),
        })

    parts = base.map_batches(partial, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (-r["n_chars"], r["doc_id"]))
        r = rows[0]
        return pa.table({
            "host": pa.array([f"h{r['host_num']:02d}"], pa.string()),
            "doc_id": pa.array([r["doc_id"]], pa.int64()),
            "n_chars": pa.array([r["n_chars"]], pa.int64()),
        })

    return parts.groupby("host_num").map_groups(
        merge, batch_format="pyarrow"
    )


SQL_BEST_PER_HOST = """
SELECT 'h' || lpad((doc_id % 50)::VARCHAR, 2, '0') AS host,
       doc_id, n_chars
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY doc_id % 50 ORDER BY n_chars DESC, doc_id
) = 1
"""


def q_table_profile(sf_dir: str):
    """Data profiling (the Deequ/ingest-audit shape): per column of
    the documents table — null count, EXACT distinct count, min and
    max (as strings for a uniform schema).  Scale shape: nulls and
    min/max come from per-block partials (one narrow row per block,
    driver-reduced); each exact distinct is ONE narrow
    single-column-projection shuffle — the honest cost of exact
    ndv (the sketch path is distinct_tokens_sketch's HLL)."""
    cols = ["doc_id", "lang", "source", "n_chars"]
    base = _docs(sf_dir, columns=tuple(cols))

    def partials(b: pa.Table) -> pa.Table:
        out = {"col": [], "n_null": [], "min_v": [], "max_v": []}
        for c in cols:
            col = b.column(c)
            out["col"].append(c)
            out["n_null"].append(col.null_count)
            valid = col.drop_null()
            if len(valid) == 0:
                out["min_v"].append(None)
                out["max_v"].append(None)
            else:
                mm = pc.min_max(valid).as_py()
                out["min_v"].append(str(mm["min"]))
                out["max_v"].append(str(mm["max"]))
        return pa.table({
            "col": pa.array(out["col"], pa.string()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "min_v": pa.array(out["min_v"], pa.string()),
            "max_v": pa.array(out["max_v"], pa.string()),
        })

    # integer columns must merge numerically, not lexicographically
    # ('95' > '499' as strings): key the min/max compare on the real
    # column type from the schema
    schema = base.schema()
    types = dict(zip(schema.names, schema.types))
    keyfn = {
        c: (int if pa.types.is_integer(types[c]) else str)
        for c in cols
    }

    rows = []
    agg = {}
    for r in base.map_batches(
        partials, batch_format="pyarrow"
    ).take_all():  # bounded: len(cols) rows per block
        cur = agg.setdefault(r["col"], {
            "n_null": 0, "min_v": None, "max_v": None,
        })
        cur["n_null"] += r["n_null"]
        key = keyfn[r["col"]]
        for k, fn in (("min_v", min), ("max_v", max)):
            if r[k] is not None:
                cur[k] = (
                    r[k] if cur[k] is None
                    else fn(cur[k], r[k], key=key)
                )

    for c in cols:
        # exact distinct: ONE narrow single-column shuffle per column;
        # nulls drop first (SQL DISTINCT excludes them, and Ray's
        # groupby cannot sort a null key)
        nd = (
            _docs(sf_dir, columns=(c,))
            .map_batches(
                lambda b, c=c: pa.table({c: b.column(c).drop_null()}),
                batch_format="pyarrow",
            )
            .groupby(c).count()
            .count()
        )
        rows.append({
            "col": c, "n_null": agg[c]["n_null"], "n_distinct": nd,
            "min_v": agg[c]["min_v"], "max_v": agg[c]["max_v"],
        })
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("col", pa.string()), ("n_null", pa.int64()),
        ("n_distinct", pa.int64()), ("min_v", pa.string()),
        ("max_v", pa.string()),
    ]))


SQL_TABLE_PROFILE = """
SELECT 'doc_id' AS col, count(*) - count(doc_id) AS n_null,
       count(DISTINCT doc_id) AS n_distinct,
       min(doc_id)::VARCHAR AS min_v, max(doc_id)::VARCHAR AS max_v
FROM documents
UNION ALL
SELECT 'lang', count(*) - count(lang), count(DISTINCT lang),
       min(lang), max(lang) FROM documents
UNION ALL
SELECT 'source', count(*) - count(source), count(DISTINCT source),
       min(source), max(source) FROM documents
UNION ALL
SELECT 'n_chars', count(*) - count(n_chars), count(DISTINCT n_chars),
       min(n_chars)::VARCHAR, max(n_chars)::VARCHAR FROM documents
"""


def q_soft_dedup(sf_dir: str):
    """Soft (weighted) exact dedup — SoftDeDup family (He et al. 2024,
    arXiv:2401.00838): duplicates are DOWN-WEIGHTED (weight =
    1/n_copies of the md5(text) group), not removed — the trainer
    samples by weight so duplicated content carries one document's
    worth of expected mass. Dup-injected corpus (doc_id<40 re-tagged
    +1000000 — q_dedup_incremental's pattern) so n_copies>1 paths
    exercise at every sf. Scale shape: stages/dedup.soft_dedup_weights
    — only (digest, id) rows shuffle, one Python callback per 256-way
    digest shard, vectorized run-length count inside."""

    def with_dups(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.less(b.column("doc_id"), 40))
        dup = pa.table(
            {
                "doc_id": pc.add(sel.column("doc_id"), 1000000),
                "text": sel.column("text"),
            }
        )
        base = pa.table(
            {"doc_id": b.column("doc_id"), "text": b.column("text")}
        )
        return pa.concat_tables([base, dup])

    corpus = _docs(sf_dir).map_batches(with_dups, batch_format="pyarrow")
    return dedup.soft_dedup_weights(corpus)


SQL_SOFT_DEDUP = """
WITH d AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
  WHERE doc_id < 40 AND text IS NOT NULL
)
SELECT doc_id,
       count(*) OVER (PARTITION BY md5(text)) AS n_copies,
       CAST(1 AS DOUBLE) / count(*) OVER (PARTITION BY md5(text)) AS weight
FROM d
"""


def q_badwords_filter(sf_dir: str):
    """C4 §2.2 bad-word document filter (Raffel et al. 2020): drop any
    page whose lowercase whitespace tokens intersect the blocklist —
    the piece of the C4 recipe `c4_clean` (line rules) doesn't cover.
    Pure streaming map, zero shuffle (stages/quality.badwords_filter);
    word set is a deterministic stand-in ('dup' exists in the corpus
    vocabulary → the drop path exercises at every sf)."""
    from ..stages import quality

    return quality.badwords_filter(_docs(sf_dir))


SQL_BADWORDS_FILTER = (
    """
SELECT doc_id, text FROM documents
WHERE text IS NOT NULL
  AND NOT list_has_any(string_split(lower(text), ' '),
                       ["""
    + ", ".join(f"'{w}'" for w in sorted(("dup", "darknet", "lorem")))
    + """])
"""
)


#: blocked registrable domains for q_domain_blocklist — suffix
#: semantics: each entry blocks itself AND every subdomain.
DOMAIN_BLOCKLIST = ("h03.example.com", "h11.example.com", "h27.example.com")


def q_domain_blocklist(sf_dir: str):
    """Domain-suffix blocklist filter (UT1 / Pi-hole semantics): a
    blocked registrable domain kills the apex host AND every
    subdomain. Hosts are synthesized at two depths (every 4th doc gets
    a cdnK. prefix) so the suffix rule — not exact matching — decides
    the cdn rows. Vectorized suffix expansion: strip-one-label RE2
    passes + is_in (functions/scalars.domain_suffix_hits); pure
    streaming map, zero shuffle."""
    import numpy as np

    from ..functions import scalars

    base = _docs(sf_dir, columns=("doc_id",))

    def host_col(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        root = np.char.add(
            np.char.add("h", np.char.zfill((ids % 50).astype("U2"), 2)),
            ".example.com",
        )
        cdn = np.char.add(
            np.char.add("cdn", (ids % 3).astype("U1")),
            np.char.add(".", root),
        )
        host = np.where(ids % 4 == 0, cdn, root)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "host": pa.array(host.tolist(), pa.string()),
            }
        )

    with_host = base.map_batches(host_col, batch_format="pyarrow")
    return scalars.suffix_blocklist_filter(with_host, set(DOMAIN_BLOCKLIST))


SQL_DOMAIN_BLOCKLIST = (
    """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN 'cdn' || (doc_id % 3)::VARCHAR || '.h'
                   || lpad((doc_id % 50)::VARCHAR, 2, '0')
                   || '.example.com'
              ELSE 'h' || lpad((doc_id % 50)::VARCHAR, 2, '0')
                   || '.example.com'
         END AS host
  FROM documents
)
SELECT doc_id, host FROM d
WHERE NOT ("""
    + "\n        OR ".join(
        f"host = '{b}' OR host LIKE '%.{b}'" for b in DOMAIN_BLOCKLIST
    )
    + """)
"""
)


def q_bitext_mine(sf_dir: str):
    """Bitext mining / cross-corpus alignment (CCMatrix family,
    Schwenk et al. 2021): the odd-vec_id shard plays the "foreign"
    corpus, the even shard the "target"; every foreign vector gets
    its best same-cluster target by exact int64 fixed-point L2
    (ties: lowest target id). This is the LARGE × LARGE similarity
    join the broadcast kNN stages can't serve — NEITHER side
    broadcasts; the exact k-means quantizer (fit over the union)
    co-partitions both sides, ONE cluster-keyed shuffle
    (stages/kmeans.bitext_match). The n_probe=1 approximation is
    itself deterministic integer arithmetic, so the approximate
    result — including any cluster-boundary misses — is
    bit-mirrorable in SQL."""
    import numpy as np

    from ..stages import kmeans

    def add_side(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "side", pa.array((ids % 2).astype(np.int64), pa.int64())
        )

    corpus = _emb(sf_dir).map_batches(add_side, batch_format="pyarrow")
    return kmeans.bitext_match(corpus, k=8, n_iter=3)


SQL_BITEXT_MINE = (
    "WITH " + _km_sql_core("embeddings") + """
, pd AS (
  SELECT b.vec_id AS query_id, a.vec_id AS match_id,
         SUM((qb.v - qa.v) * (qb.v - qa.v))::BIGINT AS dist_fp
  FROM af b JOIN af a ON a.cl = b.cl
  JOIN q qb ON qb.vec_id = b.vec_id
  JOIN q qa ON qa.vec_id = a.vec_id AND qa.d = qb.d
  WHERE b.vec_id % 2 = 1 AND a.vec_id % 2 = 0
  GROUP BY b.vec_id, a.vec_id
)
SELECT query_id, match_id, dist_fp FROM (
  SELECT query_id, match_id, dist_fp,
         row_number() OVER (
           PARTITION BY query_id ORDER BY dist_fp, match_id) AS rn
  FROM pd) WHERE rn = 1
"""
)


def q_crawl_diff(sf_dir: str):
    """Cross-snapshot crawl diff — the crawl-ops operator behind
    re-crawl scheduling and index maintenance: classify every url key
    as same / changed / gone / added between two crawl snapshots by
    comparing content digests through a FULL OUTER co-partitioned
    hash join (stages/join.partitioned_hash_join,
    join_type='full outer') — the outer-join mode of the §2.6 J3
    family. Both snapshots are corpus-scale; only (key, 32-hex
    digest) rows shuffle, never text. Snapshots are simulated
    deterministically: new drops doc_id%3==0 (gone), edits text for
    doc_id%5==0 (changed), and adds doc_id<30 re-tagged +1000000
    (added)."""
    docs = _docs(sf_dir)

    def old_side(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        digs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in b.column("text").to_pylist()
        ]
        return pa.table(
            {
                "okey": pc.cast(b.column("doc_id"), pa.int64()),
                "old_dig": pa.array(digs, pa.string()),
            }
        )

    def new_side(b: pa.Table) -> pa.Table:
        import numpy as np

        b = b.filter(pc.is_valid(b.column("text")))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        texts = b.column("text").to_pylist()
        keys: list[int] = []
        digs: list[str] = []
        for i, t in zip(ids, texts):
            if i % 3 != 0:
                t2 = t + " v2" if i % 5 == 0 else t
                keys.append(int(i))
                digs.append(hashlib.md5(t2.encode("utf-8")).hexdigest())
            if i < 30:
                keys.append(int(i) + 1000000)
                digs.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "nkey": pa.array(keys, pa.int64()),
                "new_dig": pa.array(digs, pa.string()),
            }
        )

    old = docs.map_batches(old_side, batch_format="pyarrow")
    new = docs.map_batches(new_side, batch_format="pyarrow")
    joined = join.partitioned_hash_join(
        old, new, left_key="okey", right_key="nkey", join_type="full outer"
    )  # pyarrow coalesces the full-outer key pair into the LEFT name

    def classify(b: pa.Table) -> pa.Table:
        import numpy as np

        has_old = pc.is_valid(b.column("old_dig")).to_numpy(
            zero_copy_only=False
        )
        has_new = pc.is_valid(b.column("new_dig")).to_numpy(
            zero_copy_only=False
        )
        same = pc.fill_null(
            pc.equal(b.column("old_dig"), b.column("new_dig")), False
        ).to_numpy(zero_copy_only=False)
        status = np.where(
            ~has_new, "gone",
            np.where(~has_old, "added", np.where(same, "same", "changed")),
        )
        return pa.table(
            {
                "doc_id": pc.cast(b.column("okey"), pa.int64()),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


SQL_CRAWL_DIFF = """
WITH old AS (
  SELECT doc_id AS key, md5(text) AS old_dig
  FROM documents WHERE text IS NOT NULL
), new AS (
  SELECT doc_id AS key,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
           AS new_dig
  FROM documents WHERE text IS NOT NULL AND doc_id % 3 != 0
  UNION ALL
  SELECT doc_id + 1000000, md5(text) FROM documents
  WHERE doc_id < 30 AND text IS NOT NULL
)
SELECT COALESCE(o.key, n.key) AS doc_id,
       CASE WHEN n.new_dig IS NULL THEN 'gone'
            WHEN o.old_dig IS NULL THEN 'added'
            WHEN o.old_dig = n.new_dig THEN 'same'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.key = n.key
"""


def q_ngram_counts(sf_dir: str):
    """Distributed bigram count table (the KenLM / CCNet n-gram-LM
    count build): per-block distinct partial counts, ONE narrow (gram,
    n) groupby, HAVING-style min-count prune after the global sum."""
    from ..stages import text_stats

    return text_stats.bigram_counts(
        _docs(sf_dir, columns=("doc_id", "text")), min_count=4
    )


SQL_NGRAM_COUNTS = """
SELECT gram, count(*)::BIGINT AS n FROM (
  SELECT unnest([l[i] || ' ' || l[i + 1] for i in range(1, len(l))]) AS gram
  FROM (SELECT string_split(text, ' ') AS l FROM documents)
) GROUP BY gram HAVING count(*) >= 4
"""


def q_temperature_sample(sf_dir: str):
    """mT5-style temperature (alpha=0.5) language rebalancing with
    EXACT per-language keep counts k_l = floor(sqrt(n_l * n_min)) in
    deterministic md5 order — one rank shuffle, text never moves."""
    from ..stages import mix

    return mix.temperature_sample(_docs(sf_dir, columns=("doc_id", "lang")))


SQL_TEMPERATURE_SAMPLE = """
WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS nmin FROM c),
k AS (SELECT lang, CAST(floor(sqrt((n * nmin)::DOUBLE)) AS BIGINT) AS k
      FROM c, m),
r AS (SELECT doc_id, lang,
        row_number() OVER (
          PARTITION BY lang
          ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT,
                   doc_id) AS rk
      FROM documents)
SELECT r.doc_id, r.lang FROM r JOIN k USING (lang) WHERE r.rk <= k.k
"""


def q_anchor_texts(sf_dir: str):
    """Anchor-text aggregation per link target over the generated HTML
    corpus (the web-graph "how others describe this page" signal):
    inlink count, anchor vocabulary size, majority anchor."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = docs.map_batches(
        pagegen.html_pages_batch_from_documents, batch_format="pyarrow"
    )
    return boilerplate.anchor_stats(pages)


SQL_ANCHOR_TEXTS = """
WITH l AS (SELECT doc_id, unnest(range(8)) AS s FROM documents),
a AS (
  SELECT CASE WHEN s = 0 THEN '/' WHEN s = 1 THEN '/about'
              ELSE '/cat/' || doc_id::VARCHAR || '/' || (s - 2)::VARCHAR
         END AS target,
         CASE WHEN s = 0 THEN 'Home' WHEN s = 1 THEN 'About'
              ELSE 'category link number ' || (s - 2)::VARCHAR
         END AS anchor
  FROM l),
c AS (SELECT target, anchor, count(*)::BIGINT AS n FROM a GROUP BY 1, 2)
SELECT target, n_inlinks, n_anchors, anchor AS top_anchor FROM (
  SELECT target, anchor,
         CAST(sum(n) OVER (PARTITION BY target) AS BIGINT) AS n_inlinks,
         CAST(count(*) OVER (PARTITION BY target) AS BIGINT) AS n_anchors,
         row_number() OVER (
           PARTITION BY target ORDER BY n DESC, anchor ASC) AS rk
  FROM c)
WHERE rk = 1
"""


def q_event_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel: users reaching each step
    strictly after their first prior-step event. One user shuffle; the
    result is a 3-row table."""
    from ..stages import window

    return window.event_funnel(
        _events(sf_dir, columns=("user_id", "ts", "event_type"))
    )


SQL_EVENT_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT 1::BIGINT AS step, 'view' AS step_name,
       (SELECT count(*) FROM s1)::BIGINT AS n_users
UNION ALL SELECT 2::BIGINT, 'click', (SELECT count(*) FROM s2)::BIGINT
UNION ALL SELECT 3::BIGINT, 'purchase', (SELECT count(*) FROM s3)::BIGINT
"""


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention matrix over the events table: cohort =
    week of first event, cell = cohort users active at each week
    offset."""
    from ..stages import window

    return window.cohort_retention(
        _events(sf_dir, columns=("user_id", "ts"))
    )


SQL_COHORT_RETENTION = """
WITH a AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
), f AS (
  SELECT user_id, min(wk) AS cohort FROM a GROUP BY user_id
), d AS (
  SELECT DISTINCT a.user_id, f.cohort, a.wk - f.cohort AS off
  FROM a JOIN f USING (user_id)
)
SELECT cohort::BIGINT AS cohort_week, off::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM d GROUP BY 1, 2
"""


_MOJIBAKE_SUFFIX = " — café №"


def q_fix_encoding(sf_dir: str):
    """Encoding-hygiene repair: rows deterministically corrupted with
    UTF-8-read-as-Latin-1 mojibake (doc_id % 4 == 1, non-ASCII suffix
    attached first so the repair is observable) must come back
    bit-identical to the clean text; untouched rows pass through. The
    oracle reconstructs the expected post-repair corpus directly."""
    from ..stages import text_stats

    docs = _docs(sf_dir, columns=("doc_id", "text"))

    def corrupt(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        txt = b.column("text").to_pylist()
        out = [
            (t + _MOJIBAKE_SUFFIX).encode("utf-8").decode("latin-1")
            if (t is not None and i % 4 == 1) else t
            for i, t in zip(ids, txt)
        ]
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "text": pa.array(out, pa.string()),
        })

    return text_stats.fix_mojibake(
        docs.map_batches(corrupt, batch_format="pyarrow")
    )


SQL_FIX_ENCODING = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 1 THEN text || ' — café №'
            ELSE text END AS text
FROM documents
"""


# Registry order is deliberate: the driver samples the FIRST 50 entries
# per round for its DuckDB side-by-side, so the window leads with
#   (a) the 25 queries that had never received a driver oracle row
#       through round 3 (the LLM hygiene/quality suite and the composed
#       pipelines),
#   (b) the 3 whose exact SQL was added after their last driver check
#       (langid / fingerprint / neardup_cosine — r01 rows-only),
#   (c) the 13 last checked in r01/r02 (rotated out of the r03 window),
#   (d) 9 r03-green queries whose code paths change in round 4 (Bloom
#       bit-build sharding, candidate-prefilter bounding, substring
#       dedup) and therefore need re-verification.
# Positions 51+ hold only queries green in CORRECTNESS_r03.json whose
# code is untouched this round; the per-query evidence mapping is
# written out in BASELINE.md.
QUERIES = {
    # ============ positions 1-50: the round-5 driver window =========
    # --- (a) code paths CHANGED in round 5 (rotation discipline: the
    # hot-bucket star/cap emission in dedup._bucket_pairs +
    # simhash_candidate_pairs + similarity.cosine_neardup_pairs_lsh,
    # the verified_jaccard_pairs prefilter reorder + saturation guard,
    # and the bloom.py null-handling / one-pass filter rework) --------
    "dedup_verified": (q_dedup_verified, SQL_DEDUP_VERIFIED),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_fuzzy_corpus": (q_dedup_fuzzy_corpus, SQL_DEDUP_FUZZY_CORPUS),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "dedup_incremental_fuzzy": (
        q_dedup_incremental_fuzzy, SQL_DEDUP_INCREMENTAL_FUZZY
    ),
    "bloom_blocklist": (q_bloom_blocklist, SQL_BLOOM_BLOCKLIST),
    "neardup_cosine": (q_neardup_cosine, SQL_NEARDUP_COSINE),
    # rows-only candidate forms whose emission code changed (each has
    # an exact-checked sibling above; star/cap behavior pinned in
    # tests/test_hot_buckets.py)
    "dedup_minhash": (q_dedup_minhash, None),
    "simhash_pairs": (q_simhash_pairs, None),
    # --- (a2) NEW in round 5 (first driver check this round): DSIR
    # importance resampling + RefinedWeb line-level boilerplate
    # removal ------------------------------------------------------
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "dsir_select": (q_dsir_select, SQL_DSIR_SELECT),
    "line_dedup_clean": (q_line_dedup_clean, SQL_LINE_DEDUP_CLEAN),
    "host_pagerank": (q_host_pagerank, SQL_HOST_PAGERANK),
    "pagerank_gate": (q_pagerank_gate, SQL_PAGERANK_GATE),
    "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
    "train_shuffle": (q_train_shuffle, SQL_TRAIN_SHUFFLE),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "bpe_token_counts": (q_bpe_token_counts, SQL_BPE_TOKEN_COUNTS),
    "kmeans_clusters": (q_kmeans_clusters, SQL_KMEANS_CLUSTERS),
    "semantic_dedup_kmeans": (
        q_semantic_dedup_kmeans, SQL_SEMANTIC_DEDUP_KMEANS
    ),
    "knn_ivf_fixed": (q_knn_ivf_fixed, SQL_KNN_IVF_FIXED),
    "token_entropy": (q_token_entropy, SQL_TOKEN_ENTROPY),
    "nb_quality": (q_nb_quality, SQL_NB_QUALITY),
    "ccnet_buckets": (q_ccnet_buckets, SQL_CCNET_BUCKETS),
    "host_components": (q_host_components, SQL_HOST_COMPONENTS),
    "dedup_media": (q_dedup_media, SQL_DEDUP_MEDIA),
    "pq_codes": (q_pq_codes, SQL_PQ_CODES),
    "pq_adc_topk": (q_pq_adc_topk, SQL_PQ_ADC_TOPK),
    "events_range_join": (q_events_range_join, SQL_EVENTS_RANGE_JOIN),
    "best_per_host": (q_best_per_host, SQL_BEST_PER_HOST),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "soft_dedup": (q_soft_dedup, SQL_SOFT_DEDUP),
    "badwords_filter": (q_badwords_filter, SQL_BADWORDS_FILTER),
    "domain_blocklist": (q_domain_blocklist, SQL_DOMAIN_BLOCKLIST),
    "bitext_mine": (q_bitext_mine, SQL_BITEXT_MINE),
    "crawl_diff": (q_crawl_diff, SQL_CRAWL_DIFF),
    "ngram_counts": (q_ngram_counts, SQL_NGRAM_COUNTS),
    "temperature_sample": (q_temperature_sample, SQL_TEMPERATURE_SAMPLE),
    "anchor_texts": (q_anchor_texts, SQL_ANCHOR_TEXTS),
    "event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "fix_encoding": (q_fix_encoding, SQL_FIX_ENCODING),
    # --- (b) oldest evidence: last driver-checked in r03 ------------
    "extract_text": (q_extract_text, SQL_EXTRACT_TEXT),
    "html_main_text": (q_html_main_text, SQL_HTML_MAIN_TEXT),
    "extract_links": (q_extract_links, SQL_EXTRACT_LINKS),
    "regions_flat": (q_regions_flat, SQL_REGIONS_FLAT),
    "lines_flat": (q_lines_flat, SQL_LINES_FLAT),
    "words_flat": (q_words_flat, SQL_WORDS_FLAT),
    "doc_spans": (q_doc_spans, SQL_DOC_SPANS),
    "region_word_counts": (q_region_word_counts, SQL_REGION_WORD_COUNTS),
    "match_line": (q_match_line, SQL_MATCH_LINE),
    "match_word": (q_match_word, SQL_MATCH_WORD),
    "find_first_region": (q_find_first_region, SQL_FIND_FIRST_REGION),
    "per_host_stats": (q_per_host_stats, SQL_PER_HOST_STATS),
    "corpus_stats": (q_corpus_stats, SQL_CORPUS_STATS),
    "filtered_read": (q_filtered_read, SQL_FILTERED_READ),
    "lineitem_agg": (q_lineitem_agg, SQL_LINEITEM_AGG),
    "distinct_priorities": (q_distinct_priorities, SQL_DISTINCT_PRIORITIES),
    "pipeline_e2e": (q_pipeline_e2e, SQL_PIPELINE_E2E),
    "top_hosts": (q_top_hosts, SQL_TOP_HOSTS),
    "manifest_find": (q_manifest_find, SQL_MANIFEST_FIND),
    "dedup_url": (q_dedup_url, SQL_DEDUP_URL),
    "dedup_url_latest": (q_dedup_url_latest, SQL_DEDUP_URL_LATEST),
    "lang_counts": (q_lang_counts, SQL_LANG_COUNTS),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "orders_enriched": (q_orders_enriched, SQL_ORDERS_ENRICHED),
    "orders_hash_join": (q_orders_hash_join, SQL_ORDERS_HASH_JOIN),
    "orders_native_join": (q_orders_native_join, SQL_ORDERS_NATIVE_JOIN),
    "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "quality_score": (q_quality, SQL_QUALITY),
    "regex_tokens": (q_regex_tokens, SQL_REGEX_TOKENS),
    "knn_cosine": (q_knn_cosine, SQL_KNN_COSINE),
    "events_window": (q_events_window, SQL_EVENTS_WINDOW),
    "user_totals_stateful": (q_user_totals_stateful, SQL_USER_TOTALS),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "event_quantiles": (q_event_quantiles, SQL_EVENT_QUANTILES),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "top_tokens_per_lang": (q_top_tokens_per_lang, SQL_TOP_TOKENS_PER_LANG),
    "dedup_paragraphs": (q_dedup_paragraphs, SQL_DEDUP_PARAGRAPHS),
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    # --- (c) one high-value composed-chain re-check (r04-green) -----
    "pipeline_pretrain": (q_pipeline_pretrain, SQL_PIPELINE_PRETRAIN),
    # ===== position 51+ : r04-green, code untouched in round 5 ======
    "lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
    "gopher_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "c4_clean": (q_c4_clean, SQL_C4_CLEAN),
    "mix_sample": (q_mix_sample, SQL_MIX_SAMPLE),
    "semantic_dedup_grid": (q_semantic_dedup_grid, SQL_SEMANTIC_DEDUP_GRID),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "tfidf_topterms": (q_tfidf_topterms, SQL_TFIDF_TOPTERMS),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "normalize_text": (q_normalize_text, SQL_NORMALIZE_TEXT),
    "token_rank": (q_token_rank, SQL_TOKEN_RANK),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "top_tokens_bounded": (q_top_tokens_bounded, SQL_TOP_TOKENS),
    "pipeline_hygiene": (q_pipeline_hygiene, SQL_PIPELINE_HYGIENE),
    "pipeline_pack_train": (q_pipeline_pack_train, SQL_PIPELINE_PACK_TRAIN),
    "quality_gate": (q_quality_gate, SQL_QUALITY_GATE),
    "repetition_stats": (q_repetition, SQL_REPETITION),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "host_cap": (q_host_cap, SQL_HOST_CAP),
    "chunk_stride": (q_chunk_stride, SQL_CHUNK_STRIDE),
    "distinct_tokens_exact": (
        q_distinct_tokens_exact, SQL_DISTINCT_TOKENS_EXACT
    ),
    "knn_ivf_exact": (q_knn_ivf_exact, SQL_KNN_COSINE),
    "length_quantiles": (q_length_quantiles, SQL_LENGTH_QUANTILES),
    "semantic_dedup": (q_semantic_dedup, None),  # rows-only by design
    "langid": (q_langid, SQL_LANGID),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "url_canon": (q_url_canon, SQL_URL_CANON),
    "events_preceding": (q_events_preceding, SQL_EVENTS_PRECEDING),
    "image_meta": (q_image_meta, SQL_IMAGE_META),
    "audio_meta": (q_audio_meta, SQL_AUDIO_META),
    "common_tokens": (q_common_tokens, SQL_COMMON_TOKENS),
    "pdf_text": (q_pdf_text, SQL_PDF_TEXT),
    "pack_chunks": (q_pack_chunks, SQL_PACK_CHUNKS),
    "top_tokens": (q_top_tokens, SQL_TOP_TOKENS),
    # rows-only sketches (non-SQL hashes; each pinned behaviorally in
    # tests/test_rowsonly_validation.py with an exact-checked sibling)
    "distinct_tokens_sketch": (q_distinct_tokens, None),
    "dedup_simhash": (q_dedup_simhash, None),
    "knn_ivf": (q_knn_ivf, None),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "blocklist_filter": (q_blocklist_filter, SQL_BLOCKLIST_FILTER),
    "repeated_substrings": (q_repeated_substrings, SQL_REPEATED_SUBSTRINGS),
    "repeated_substrings_bucketed": (
        q_repeated_substrings_bucketed, SQL_REPEATED_SUBSTRINGS
    ),
    "substring_clean": (q_substring_clean, SQL_SUBSTRING_CLEAN),
}
