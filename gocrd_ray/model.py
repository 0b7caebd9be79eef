"""Arrow schemas and constants for the engine.

The data model maps the reference's document hierarchy onto fixed,
declared Arrow types (SURVEY.md §1.3): one page document per row,
nested list/struct columns for the region/line/word hierarchy, plain
columns for the serialized text + spans. Nothing is schema-inferred.
"""

from __future__ import annotations

import pyarrow as pa

# -- input: Common-Crawl-style pages table (BASELINE.json input_hint) -------

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # ground-truth extracted text (when known)
        ("lang", pa.string()),
    ]
)

# -- geometry ---------------------------------------------------------------

POINT = pa.struct([("x", pa.int32()), ("y", pa.int32())])
COORDS = pa.list_(POINT)
BBOX = pa.struct(
    [("x0", pa.int32()), ("y0", pa.int32()), ("x1", pa.int32()), ("y1", pa.int32())]
)

# -- nested hierarchy (full extraction mode) --------------------------------

WORD = pa.struct(
    [
        ("word_id", pa.string()),
        ("text", pa.string()),  # null = no TextEquiv/Unicode (reference: ok=false)
        ("alt_texts", pa.list_(pa.string())),  # TextEquiv[1:]/Unicode values —
        # TextEquivUnicodeAt(pos>0) (page/page.go:35-37); null entry = a
        # TextEquiv with no Unicode child
        ("coords", COORDS),  # null = missing/malformed Coords
        ("bbox", BBOX),
    ]
)

LINE = pa.struct(
    [
        ("line_id", pa.string()),
        ("tag", pa.string()),  # "TextLine" normally; the container's tag
        # for stray_lines entries (non-TextLine children carrying Words)
        ("text", pa.string()),
        ("alt_texts", pa.list_(pa.string())),
        ("coords", COORDS),
        ("bbox", BBOX),
        ("baseline", COORDS),
        ("words", pa.list_(WORD)),
    ]
)

REGION = pa.struct(
    [
        ("region_id", pa.string()),
        ("tag", pa.string()),  # element local name (TextRegion, SeparatorRegion…)
        ("rtype", pa.string()),  # TextRegion @type
        ("ro_index", pa.int32()),  # reading-order index; null = orphan element
        # (present in the DOM but absent from ReadingOrder — invisible to
        # Regions()/doc_text, reachable via compound/wildcard Match,
        # page/page.go:96-108 + page_test.go:23) or malformed RO entry
        ("ro_pos", pa.int32()),  # document position of the RegionRefIndexed
        # entry (first-match region lookup goes by THIS, page/page.go:103,111)
        ("ro_malformed", pa.bool_()),  # RO entry with bad @index/@regionRef:
        # skipped by Regions() but still the first XPath hit for a
        # region-only Find, which then fails construction → not found
        # (page/page.go:110-127,214-231)
        ("doc_order", pa.int32()),  # element position among Page children; null
        # = RO ref with no matching element (first-match semantics need it)
        ("text", pa.string()),
        ("alt_texts", pa.list_(pa.string())),
        ("n_alt_texts", pa.int32()),  # extra TextEquiv entries beyond the first
        ("coords", COORDS),
        ("bbox", BBOX),
        ("missing_element", pa.bool_()),  # RO ref with no TextRegion element
        ("lines", pa.list_(LINE)),  # TextLine children, document order
        ("stray_lines", pa.list_(LINE)),  # non-TextLine children that carry
        # Word elements — reachable by the reference's /Page/*/*/Word
        # wildcard (page/page.go:104-106) but invisible to line-level
        # paths; excluded from n_lines/n_words/doc_text
    ]
)

SPAN = pa.struct(
    [("region_id", pa.string()), ("start", pa.int64()), ("end", pa.int64())]
)

# -- extraction outputs -----------------------------------------------------

# mode="text": the lean flagship output
EXTRACT_TEXT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),  # doc_text; null on parse error
        ("spans", pa.list_(SPAN)),
        ("n_regions", pa.int32()),
        ("n_lines", pa.int32()),
        ("n_words", pa.int32()),
        ("html_bytes", pa.int64()),
        ("error", pa.string()),  # null = ok
    ]
)

# mode="full": adds the nested hierarchy
EXTRACT_FULL_SCHEMA = EXTRACT_TEXT_SCHEMA.append(pa.field("regions", pa.list_(REGION)))

# -- flattened views --------------------------------------------------------

REGIONS_FLAT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("region_id", pa.string()),
        ("tag", pa.string()),
        ("rtype", pa.string()),
        ("ro_index", pa.int32()),  # null = orphan (not in reading order)
        ("ro_pos", pa.int32()),
        ("ro_malformed", pa.bool_()),
        ("doc_order", pa.int32()),
        ("region_seq", pa.int32()),  # position in the regions list, 0-based
        ("text", pa.string()),
        ("n_lines", pa.int32()),
        ("x0", pa.int32()),
        ("y0", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
    ]
)

LINES_FLAT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("region_id", pa.string()),
        ("region_tag", pa.string()),
        ("ro_index", pa.int32()),
        ("doc_order", pa.int32()),
        ("region_seq", pa.int32()),
        ("line_id", pa.string()),
        ("line_seq", pa.int32()),  # document order within region, 0-based
        ("text", pa.string()),
        ("n_words", pa.int32()),
        ("x0", pa.int32()),
        ("y0", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
    ]
)

WORDS_FLAT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("region_id", pa.string()),
        ("region_tag", pa.string()),
        ("ro_index", pa.int32()),
        ("doc_order", pa.int32()),
        ("region_seq", pa.int32()),
        ("line_id", pa.string()),
        ("line_tag", pa.string()),
        ("line_seq", pa.int32()),
        ("word_id", pa.string()),
        ("word_seq", pa.int32()),
        ("text", pa.string()),
        ("x0", pa.int32()),
        ("y0", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
    ]
)

# -- manifest table (METS analog, SURVEY.md §2.1 S2/S3) ---------------------

MANIFEST_SCHEMA = pa.schema(
    [
        ("use", pa.string()),
        ("file_id", pa.string()),
        ("mime_type", pa.string()),
        ("loc_type", pa.string()),
        ("href", pa.string()),
    ]
)
