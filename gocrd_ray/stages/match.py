"""Match-predicate lookups over the flattened views — the reference's
query language (page.Match, SURVEY.md §2.3) as Arrow filters.

The reference compiles ``Match{RegionID, LineID, WordID}`` (empty string
= wildcard) into one of several asymmetric XPath shapes
(page/page.go:90-108). On the flattened model those shapes become
conjunctive-equality filters with reachability rules:

* region-only → *via ReadingOrder* (page/page.go:103): only rows with a
  non-null ``ro_pos`` match — an orphan region is not findable alone
  (page_test.go:23), but IS findable through its lines/words because…
* compound region+line(+word) → direct ``/TextRegion[@id]/…`` path
  (page/page.go:96-102): requires ``region_tag == 'TextRegion'`` but not
  reading-order membership;
* line-only / word-only → depth-exact wildcards (``/Page/*/TextLine``,
  ``/Page/*/*/Word``): any container element qualifies.

``find_first`` reproduces the reference's first-document-order-match
rule (page/page.go:110-127); the reference itself assumes IDs are unique
per document (page/page.go:133-134).

Stray words (Word elements under a non-TextLine region child — outside
the PAGE schema but reachable by the reference's ``/Page/*/*/Word``
wildcard) ARE captured: the hierarchy keeps them in ``stray_lines`` and
the words view exposes them with their container's ``line_tag``, so a
word-only wildcard finds them while a ``/TextLine[@id]/Word`` path does
not. Their line_seq sorts after real lines (approximate document order;
only observable for duplicate word ids straddling container kinds).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.dataset as pads

from ..oracle import Match  # same predicate object as the oracle

_ = Match  # re-exported


def match_level(m: Match) -> str:
    """Deepest requested level — what find() returns (page/page.go:117-125)."""
    if m.word_id:
        return "word"
    if m.line_id:
        return "line"
    if m.region_id:
        return "region"
    return "none"


def match_filter(m: Match):
    """Arrow dataset filter expression for the flat view of match_level(m).

    Returns (level, expr); expr is None for the empty match (matches
    nothing, like the reference's empty xpath shape).
    """
    level = match_level(m)
    f = pads.field
    if level == "none":
        return level, None
    if level == "region":
        # via ReadingOrder: /Page/ReadingOrder/*/RegionRefIndexed[@regionRef]
        # every RO entry with the ref is an XPath hit, including malformed
        # ones — first-match resolution happens in find_first/resolve_first,
        # where a malformed first hit means "not found"
        # (page/page.go:110-127,214-231)
        return level, (f("region_id") == m.region_id) & ~f("ro_pos").is_null()
    expr = None

    def conj(e):
        nonlocal expr
        expr = e if expr is None else (expr & e)

    if m.region_id:
        # direct /TextRegion[@id] path: tag must be TextRegion
        conj(f("region_id") == m.region_id)
        conj(f("region_tag") == "TextRegion")
    if m.line_id:
        conj(f("line_id") == m.line_id)
        if level == "word":
            # /TextLine[@id]/Word requires the line step's tag; a
            # word-only wildcard (/Page/*/*/Word) does not
            conj(f("line_tag") == "TextLine")
    if level == "word":
        conj(f("word_id") == m.word_id)
    return level, expr


def match_rows(full_ds, m: Match, **kwargs):
    """All rows matching m, from the appropriate flattened view."""
    from . import explode

    level, expr = match_filter(m)
    if level == "none":
        import ray.data

        return ray.data.from_arrow(
            explode.explode_words(_empty_full_batch())
        )
    view = {
        "region": explode.regions_flat,
        "line": explode.lines_flat,
        "word": explode.words_flat,
    }[level](full_ds, **kwargs)
    # pyarrow expressions filter per-batch (zero-copy); Ray's filter(expr=)
    # only takes string expressions, so apply the Arrow expression directly.
    return view.map_batches(
        lambda t, e=expr: t.filter(e), batch_format="pyarrow"
    )


def _empty_full_batch():
    import pyarrow as pa

    from ..model import EXTRACT_FULL_SCHEMA

    return EXTRACT_FULL_SCHEMA.empty_table().cast(EXTRACT_FULL_SCHEMA)


def find_first(full_ds, m: Match, **kwargs):
    """Per-url first match in document order — the reference's
    ``Page.Find`` applied to every document of the corpus at once.

    Document order keys: region-only matches follow reading order
    (region_seq); deeper levels follow element order (doc_order /
    line_seq / word_seq). Returns a Dataset with one row per url that
    has a match.
    """
    level, expr = match_filter(m)
    rows = match_rows(full_ds, m, **kwargs)
    if level == "none":
        return rows
    def first(group):
        import pyarrow as pa

        row, found = resolve_first(group, m)
        if not found:
            return group.slice(0, 0)
        return pa.Table.from_pylist([row], schema=group.schema)

    # groupby url: one first-match per document. At scale this is a hash
    # shuffle on url; in the common case rows-per-url is tiny (IDs are
    # unique by assumption) so groups are small and skew-free.
    return rows.groupby("url").map_groups(first, batch_format="pyarrow")


def resolve_first(flat_table, m: Match):
    """Batch-level Page.Find over ONE document's flat view slice.

    Returns (row dict | None, found) with the reference's first-match +
    construction-failure semantics.
    """
    import pyarrow.compute as pc

    level, expr = match_filter(m)
    if level == "none" or flat_table.num_rows == 0:
        return None, False
    hits = flat_table.filter(expr)
    if hits.num_rows == 0:
        return None, False
    order = {
        "region": ("ro_pos",),
        "line": ("doc_order", "line_seq"),
        "word": ("doc_order", "line_seq", "word_seq"),
    }[level]
    idx = pc.sort_indices(hits, sort_keys=[(k, "ascending") for k in order])
    row = hits.take(idx[:1]).to_pylist()[0]
    if level == "region" and row["ro_malformed"]:
        return None, False
    return row, True
