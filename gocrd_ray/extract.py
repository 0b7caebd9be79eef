"""Single-pass PAGE-XML document extraction — the engine's hot path.

Reproduces the oracle's (and therefore the reference's) semantics in one
pass over the parsed document instead of the reference's lazy re-query
model (gocrd re-runs absolute XPaths per accessor, page/page.go:39-45;
we parse once per row and emit columnar results — SURVEY.md §4).

``extract_doc`` is the per-row kernel; ``extract_batch`` is the
``map_batches`` body (Arrow in / Arrow out). Per-row failures are
captured in the ``error`` column so one poison document never kills a
task (SURVEY.md §7 hard part d).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any, Optional

import pyarrow as pa

from .model import EXTRACT_FULL_SCHEMA, EXTRACT_TEXT_SCHEMA


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if tag.startswith("{") else tag


class _LocalMemo(dict):
    """tag → local-name memo. ElementTree interns tag strings per parser,
    so after the first few documents every lookup is a dict hit — this
    removes ~180 rsplit/startswith calls per document from the hot path."""

    def __missing__(self, tag):
        v = self[tag] = _local(tag)
        return v


_LOCAL = _LocalMemo()


def _attr(elem: ET.Element, name: str) -> Optional[str]:
    a = elem.attrib
    v = a.get(name)
    if v is not None:
        return v
    for k, v in a.items():
        if k.endswith("}" + name):
            return v
    return None


# Pinned engine semantic (diverges from the reference, deliberately):
# integers outside int32 are treated as MALFORMED. Go's strconv.Atoi
# accepts up to int64, but our declared Arrow schema stores coords and
# reading-order indexes as int32 (model.py: POINT/BBOX/ro_index) — at CC
# scale a single hostile doc with a 3e9 coordinate must become a null
# bbox / skipped RO entry, never an ArrowInvalid that kills the batch
# (the poison-row guarantee). Real PAGE-XML coordinates are pixel
# offsets and never approach 2^31.
_INT32_MIN = -(2**31)
_INT32_MAX = 2**31 - 1


def _atoi(s: str) -> int:
    t = s[1:] if s[:1] in "+-" else s
    if not t or not t.isascii() or not t.isdigit():
        raise ValueError(f"invalid integer {s!r}")
    v = int(s, 10)
    if v < _INT32_MIN or v > _INT32_MAX:
        raise ValueError(f"integer out of int32 range {s!r}")
    return v


# whole-attribute validation in one C regex: >=2 "x,y" int pairs joined
# by single spaces, Go-strconv-Atoi integer syntax ([+-]?ascii digits) —
# exactly the acceptance set of the token-at-a-time reference parser
# (page/page.go:324-351). After a match, int() per token is safe and fast
# (coordinate parsing was 40% of full-mode kernel time token-by-token).
import re as _re

_POINTS_RE = _re.compile(r"[+-]?[0-9]+,[+-]?[0-9]+( [+-]?[0-9]+,[+-]?[0-9]+)+\Z")


def _parse_points(s: Optional[str]) -> Optional[list[dict]]:
    """Coords/@points → [{'x','y'}...] or None on any malformation
    (reference error semantics, page/page.go:324-351)."""
    if s is None or _POINTS_RE.match(s) is None:
        return None
    pts = []
    for p in s.split(" "):
        x, _, y = p.partition(",")
        xi = int(x)
        yi = int(y)
        if (
            xi < _INT32_MIN or xi > _INT32_MAX
            or yi < _INT32_MIN or yi > _INT32_MAX
        ):
            return None  # out-of-int32 coordinate = malformed (pinned)
        pts.append({"x": xi, "y": yi})
    return pts


def _bbox(pts: Optional[list[dict]]) -> Optional[dict]:
    if not pts:
        return None
    xs = [p["x"] for p in pts]
    ys = [p["y"] for p in pts]
    return {"x0": min(xs), "y0": min(ys), "x1": max(xs), "y1": max(ys)}


def _bbox_of_str(s: Optional[str]) -> Optional[dict]:
    """points string → bbox dict directly, skipping point-dict
    construction (the dominant full-mode cost: ~500 dicts/doc)."""
    if s is None or _POINTS_RE.match(s) is None:
        return None
    xs: list[int] = []
    ys: list[int] = []
    for p in s.split(" "):
        x, _, y = p.partition(",")
        xs.append(int(x))
        ys.append(int(y))
    x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
    if x0 < _INT32_MIN or y0 < _INT32_MIN or x1 > _INT32_MAX or y1 > _INT32_MAX:
        return None  # out-of-int32 coordinate = malformed (pinned)
    return {"x0": x0, "y0": y0, "x1": x1, "y1": y1}


def _first_text_equiv(elem: ET.Element) -> tuple[Optional[str], int]:
    """(first TextEquiv/Unicode string value or None, count of TextEquivs).

    None == the reference's ("", false): no TextEquiv or no Unicode child.
    """
    n = 0
    text = None
    for c in elem:
        if _LOCAL[c.tag] == "TextEquiv":
            n += 1
            if n == 1:
                for u in c:
                    if _LOCAL[u.tag] == "Unicode":
                        text = "".join(u.itertext())
                        break
    return text, n


def _all_text_equivs(elem: ET.Element) -> list[Optional[str]]:
    """Every ./TextEquiv/Unicode string value in order — the full
    TextEquivUnicodeAt(pos) surface (page/page.go:35-37,197-204); a
    TextEquiv without a Unicode child contributes None (= ok:false)."""
    out: list[Optional[str]] = []
    for c in elem:
        if _LOCAL[c.tag] == "TextEquiv":
            text = None
            for u in c:
                if _LOCAL[u.tag] == "Unicode":
                    text = "".join(u.itertext())
                    break
            out.append(text)
    return out


def _coords_of(elem: ET.Element, name: str = "Coords") -> Optional[list[dict]]:
    for c in elem:
        if _LOCAL[c.tag] == name:
            return _parse_points(_attr(c, "points"))
    return None


def _coords_str_of(elem: ET.Element, name: str = "Coords") -> Optional[str]:
    for c in elem:
        if _LOCAL[c.tag] == name:
            return _attr(c, "points")
    return None


def extract_doc(data: bytes, mode: str = "text") -> dict[str, Any]:
    """Extract one document.

    mode: "text" (lean — doc text/spans/counts only), "full" (+nested
    hierarchy with bboxes; polygon point lists omitted — 2x faster),
    or "geom" (full + polygon point lists, the complete Polygon()
    surface). Validity semantics are identical in full and geom: a bbox
    is null exactly when the reference's polygon parse would error.

    Returns a dict of the EXTRACT_*_SCHEMA fields (minus the passthrough
    url/warc_ts/lang/html_bytes, which the batch wrapper adds).
    """
    out: dict[str, Any] = {
        "text": None,
        "spans": None,
        "n_regions": 0,
        "n_lines": 0,
        "n_words": 0,
        "error": None,
    }
    if mode in ("full", "geom"):
        out["regions"] = None
    # entity-expansion guard: a hostile document can declare internal
    # entities that expand exponentially ("billion laughs") and OOM the
    # worker before ParseError capture can help. At CC scale every input
    # is untrusted, so DOCTYPEs with entity declarations are rejected as
    # poison rows up front. (Divergence from the reference, which would
    # try to expand them; real PAGE-XML never declares entities.)
    if b"<!ENTITY" in data[:4096]:
        out["error"] = "rejected: internal entity declarations"
        return out
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        out["error"] = f"parse: {e}"
        return out

    page = None
    if _LOCAL[root.tag] == "PcGts":
        for c in root:
            if isinstance(c.tag, str) and _LOCAL[c.tag] == "Page":
                page = c
                break

    # An unrecognized root or a PcGts without a Page has no regions:
    # doc_text is the empty join, matching the oracle.
    #
    # candidates = every element child of Page except ReadingOrder, in
    # document order — the reference's wildcard paths (/Page/*/TextLine,
    # /Page/*/*/Word, page/page.go:98,104-106) iterate ALL Page children,
    # including SeparatorRegion etc., so the full hierarchy keeps them.
    # region_elems = first TextRegion per id — the target of absolute
    # /PcGts/Page/TextRegion[@id=...] resolution (page/page.go:43-45).
    candidates: list[tuple[int, str, ET.Element]] = []  # (doc_order, tag, elem)
    region_elems: dict[str, tuple[int, ET.Element]] = {}
    ro_entries: list[tuple[int, str, int]] = []  # (index, rid, ro_pos)
    ro_malformed: list[tuple[int, str]] = []  # (ro_pos, rid-or-"")
    if page is not None:
        pos = 0
        ro_pos = 0
        for c in page:
            if not isinstance(c.tag, str):
                continue
            ln = _LOCAL[c.tag]
            if ln == "ReadingOrder":
                for group in c:
                    if not isinstance(group.tag, str):
                        continue
                    for rri in group:
                        if not isinstance(rri.tag, str):
                            continue
                        if _LOCAL[rri.tag] != "RegionRefIndexed":
                            continue
                        idx_s = _attr(rri, "index")
                        rid = _attr(rri, "regionRef")
                        try:
                            if idx_s is None or rid is None:
                                raise ValueError(idx_s)
                            ro_entries.append((_atoi(idx_s), rid, ro_pos))
                        except ValueError:
                            # silently skipped by Regions()
                            # (page/page.go:144-146) — but still an XPath
                            # hit for region-only Find (page/page.go:103),
                            # so full mode keeps it for first-match logic
                            ro_malformed.append((ro_pos, rid or ""))
                        ro_pos += 1
                continue
            candidates.append((pos, ln, c))
            if ln == "TextRegion":
                rid = _attr(c, "id")
                if rid is not None and rid not in region_elems:
                    region_elems[rid] = (pos, c)  # first match wins
            pos += 1
    ro_entries.sort(key=lambda t: t[0])

    parts: list[str] = []
    spans: list[dict] = []
    regions_out: list[dict] = []
    n_lines = 0
    n_words = 0
    off = 0
    full = mode in ("full", "geom")
    geom = mode == "geom"

    def region_body(elem: ET.Element):
        """Parse one TextRegion element's text + lines/words subtree.

        Returns (text, n_text_equivs, lines_out, n_lines, n_words);
        lines_out is only populated in full mode.
        """
        rtext, n_te = _first_text_equiv(elem)
        lines_out: list[dict] = []
        stray_out: list[dict] = []
        rl = rw = 0
        for lc in elem:
            if not isinstance(lc.tag, str):
                continue
            ltag = _LOCAL[lc.tag]
            if ltag != "TextLine":
                # the reference's /Page/*/*/Word wildcard reaches Word
                # children of ANY region child (page/page.go:104-106) —
                # capture word-bearing non-TextLine containers separately
                if full:
                    stray_words = []
                    for wc in lc:
                        if isinstance(wc.tag, str) and _LOCAL[wc.tag] == "Word":
                            wtext, _ = _first_text_equiv(wc)
                            w_pts = _coords_str_of(wc)
                            w_all = _all_text_equivs(wc)
                            stray_words.append(
                                {
                                    "word_id": _attr(wc, "id") or "",
                                    "text": wtext,
                                    "alt_texts": w_all[1:] if len(w_all) > 1 else [],
                                    "coords": _parse_points(w_pts) if geom else None,
                                    "bbox": _bbox_of_str(w_pts),
                                }
                            )
                    if stray_words:
                        stray_out.append(
                            {
                                "line_id": _attr(lc, "id") or "",
                                "tag": ltag,
                                "text": None,
                                "alt_texts": [],
                                "coords": None,
                                "bbox": None,
                                "baseline": None,
                                "words": stray_words,
                            }
                        )
                continue
            rl += 1
            words_out: list[dict] = []
            lw = 0
            for wc in lc:
                if _LOCAL[wc.tag] != "Word":
                    continue
                lw += 1
                if full:
                    wtext, _ = _first_text_equiv(wc)
                    w_pts = _coords_str_of(wc)
                    w_all = _all_text_equivs(wc)
                    words_out.append(
                        {
                            "word_id": _attr(wc, "id") or "",
                            "text": wtext,
                            "alt_texts": w_all[1:] if len(w_all) > 1 else [],
                            "coords": _parse_points(w_pts) if geom else None,
                            "bbox": _bbox_of_str(w_pts),
                        }
                    )
            rw += lw
            if full:
                ltext, _ = _first_text_equiv(lc)
                l_pts = _coords_str_of(lc)
                l_all = _all_text_equivs(lc)
                lines_out.append(
                    {
                        "line_id": _attr(lc, "id") or "",
                        "tag": "TextLine",
                        "text": ltext,
                        "alt_texts": l_all[1:] if len(l_all) > 1 else [],
                        "coords": _parse_points(l_pts) if geom else None,
                        "bbox": _bbox_of_str(l_pts),
                        "baseline": _coords_of(lc, "Baseline") if geom else None,
                        "words": words_out,
                    }
                )
        return rtext, n_te, lines_out, stray_out, rl, rw

    used_elems: set[int] = set()
    for seq, (ro_index, rid, ro_pos) in enumerate(ro_entries):
        hit = region_elems.get(rid)
        if hit is not None:
            used_elems.add(id(hit[1]))
        rtext: Optional[str] = None
        n_te = 0
        lines_out: list[dict] = []
        stray_out: list[dict] = []
        r_coords = None
        if hit is not None:
            _, elem = hit
            rtext, n_te, lines_out, stray_out, rl, rw = region_body(elem)
            n_lines += rl
            n_words += rw
            if full:
                r_coords = _coords_str_of(elem)
        t = rtext if rtext is not None else ""
        if seq > 0:
            off += 1  # "\n" separator
        spans.append({"region_id": rid, "start": off, "end": off + len(t)})
        off += len(t)
        parts.append(t)
        if full:
            regions_out.append(
                {
                    "region_id": rid,
                    "tag": "TextRegion" if hit is not None else None,
                    "rtype": _attr(hit[1], "type") if hit is not None else None,
                    "ro_index": ro_index,
                    "ro_pos": ro_pos,
                    "ro_malformed": False,
                    "doc_order": hit[0] if hit is not None else None,
                    "text": rtext,
                    "alt_texts": (
                        _all_text_equivs(hit[1])[1:] if hit is not None and n_te > 1 else []
                    ),
                    "n_alt_texts": max(0, n_te - 1),
                    "coords": _parse_points(r_coords) if geom else None,
                    "bbox": _bbox_of_str(r_coords),
                    "missing_element": hit is None,
                    "lines": lines_out,
                    "stray_lines": stray_out,
                }
            )

    if full:
        # Malformed ReadingOrder entries (bad @index / missing @regionRef):
        # invisible to Regions()/doc_text, but the first document-order
        # XPath hit for a region-only Find can be one of these — and then
        # construction fails and the Find is "not found" even if a valid
        # entry for the same ref follows (page/page.go:110-127,214-231).
        for ro_pos, rid in ro_malformed:
            regions_out.append(
                {
                    "region_id": rid,
                    "tag": None,
                    "rtype": None,
                    "ro_index": None,
                    "ro_pos": ro_pos,
                    "ro_malformed": True,
                    "doc_order": None,
                    "text": None,
                    "alt_texts": [],
                    "n_alt_texts": 0,
                    "coords": None,
                    "bbox": None,
                    "missing_element": rid not in region_elems,
                    "lines": [],
                    "stray_lines": [],
                }
            )
        # Orphan elements: Page children not claimed by a ReadingOrder
        # entry (TextRegions absent from RO, SeparatorRegions, duplicate-id
        # TextRegions shadowed by first-match resolution). They never
        # contribute to doc_text / n_* counts (page/page.go:139-153,
        # page_test.go:23) but wildcard / compound Match paths reach them
        # (page/page.go:96-108), so the hierarchy keeps them with a null
        # ro_index, appended in document order.
        for pos, tag, elem in candidates:
            if id(elem) in used_elems:
                continue
            rtext, n_te, lines_out, stray_out, _, _ = region_body(elem)
            r_coords = _coords_str_of(elem)
            regions_out.append(
                {
                    "region_id": _attr(elem, "id") or "",
                    "tag": tag,
                    "rtype": _attr(elem, "type"),
                    "ro_index": None,
                    "ro_pos": None,
                    "ro_malformed": False,
                    "doc_order": pos,
                    "text": rtext,
                    "alt_texts": _all_text_equivs(elem)[1:] if n_te > 1 else [],
                    "n_alt_texts": max(0, n_te - 1),
                    "coords": _parse_points(r_coords) if geom else None,
                    "bbox": _bbox_of_str(r_coords),
                    "missing_element": False,
                    "lines": lines_out,
                    "stray_lines": stray_out,
                }
            )

    out["text"] = "\n".join(parts)
    out["spans"] = spans
    out["n_regions"] = len(ro_entries)
    out["n_lines"] = n_lines
    out["n_words"] = n_words
    if full:
        out["regions"] = regions_out
    return out


def extract_batch(batch: pa.Table, mode: str = "text") -> pa.Table:
    """map_batches body: pages batch in → extraction batch out.

    Input columns used: url, html (and warc_ts / lang passed through
    when present). Output schema: EXTRACT_TEXT_SCHEMA / EXTRACT_FULL_SCHEMA.
    """
    schema = EXTRACT_FULL_SCHEMA if mode in ("full", "geom") else EXTRACT_TEXT_SCHEMA
    htmls = batch.column("html").to_pylist()
    n = len(htmls)
    rows = [extract_doc(h, mode) if h is not None else {"error": "null html"} for h in htmls]

    def col(name, default=None):
        return [r.get(name, default) for r in rows]

    arrays = {
        "url": batch.column("url"),
        "text": pa.array(col("text"), type=pa.string()),
        "spans": pa.array(col("spans"), type=schema.field("spans").type),
        "n_regions": pa.array(col("n_regions", 0), type=pa.int32()),
        "n_lines": pa.array(col("n_lines", 0), type=pa.int32()),
        "n_words": pa.array(col("n_words", 0), type=pa.int32()),
        "html_bytes": pa.array(
            [len(h) if h is not None else 0 for h in htmls], type=pa.int64()
        ),
        "error": pa.array(col("error"), type=pa.string()),
    }
    names = set(batch.schema.names)
    arrays["warc_ts"] = (
        batch.column("warc_ts")
        if "warc_ts" in names
        else pa.nulls(n, pa.timestamp("us"))
    )
    arrays["lang"] = (
        batch.column("lang") if "lang" in names else pa.nulls(n, pa.string())
    )
    if mode in ("full", "geom"):
        arrays["regions"] = pa.array(
            col("regions"), type=schema.field("regions").type
        )
    return pa.table({f.name: arrays[f.name] for f in schema})
