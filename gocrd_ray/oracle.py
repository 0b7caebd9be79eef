"""Pure-Python correctness oracle: a faithful re-implementation of the
reference gocrd semantics over a single XML document.

This module is deliberately row-at-a-time and Ray-free. It exists to pin
the semantics the distributed engine must reproduce byte-for-byte; the
ported reference test cases in ``tests/test_oracle_page.py`` /
``tests/test_oracle_mets.py`` run against it, and corpus tests compare
the Ray pipeline's output against it per url.

Reference semantics reproduced (citations into /root/reference):

* namespace-oblivious matching — the reference's xmlpath library matches
  elements/attributes by local name (the Kant fixture binds
  ``pc:ReadingOrder`` etc. to a namespace while ``TextRegion`` has none,
  and both are found; page/page.go:27 with
  page/testdata/kant_aufklaerung_1784_0020.xml:17-25);
* ``Regions()`` enumerates ``/PcGts/Page/ReadingOrder/*/RegionRefIndexed``
  only, silently skipping entries with a missing/non-integer ``@index``
  or missing ``@regionRef``, then sorts by index (page/page.go:139-153);
* region accessors resolve the region *element* by id on each use; a
  reading-order ref without a matching ``TextRegion`` element yields
  ``("", False)`` text and a polygon error (page/page.go:197-212);
* ``TextEquivUnicodeAt(pos)`` is zero-based over the node's TextEquiv
  children (1-based positional XPath inside, page/page.go:35-37); a
  TextEquiv without a Unicode child is "no match";
* ``Match`` lookup compiles to one of several asymmetric path shapes
  (page/page.go:90-108): region-only goes via ReadingOrder; compound
  matches go via ``/TextRegion[@id]/TextLine[@id]/Word[@id]`` directly;
  first document-order hit wins (page/page.go:110-127);
* polygons parse ``<Coords points="x,y x,y ...">`` with >=2 points and
  integer coordinates (page/page.go:324-351); bounding boxes are
  min/max reductions (page/page.go:301-322);
* METS ``Find`` matches ``/mets/fileSec/fileGrp[@USE]/file[@ID][@MIMETYPE]``
  with empty-string fields ignored, projecting ``File{MIMEType, ID,
  FLocat{Type, URL}}`` from the *first* FLocat child only
  (mets/mets.go:53-126). XML comments are not elements (the comment-only
  OCR-D-IMG group yields 0 files, mets/testdata/mets.xml:19-23).

Document text serialization (our engine's contract, SURVEY.md §2.12.10):
``doc_text = "\n".join(canonical region text in reading order)`` with a
missing region text contributing the empty string; spans are the
``[start, end)`` character offsets of each region's text in doc_text.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Iterator, Optional, Union


def _local(tag: str) -> str:
    """Local name of an ElementTree tag / attribute key."""
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[-1]
    return tag


def _attrs(elem: ET.Element) -> dict:
    """Attributes keyed by local name (xmlpath is namespace-oblivious)."""
    return {_local(k): v for k, v in elem.attrib.items()}


def _attr(elem: ET.Element, name: str) -> Optional[str]:
    for k, v in elem.attrib.items():
        if _local(k) == name:
            return v
    return None


def _children(elem: ET.Element, name: Optional[str] = None) -> Iterator[ET.Element]:
    for c in elem:
        if not isinstance(c.tag, str):  # comments / PIs are not elements
            continue
        if name is None or _local(c.tag) == name:
            yield c


def _string_value(elem: ET.Element) -> str:
    """XPath string-value: concatenated descendant text, verbatim."""
    return "".join(elem.itertext())


def _text_equiv_unicode_at(elem: ET.Element, pos: int) -> tuple[str, bool]:
    """./TextEquiv[pos+1]/Unicode string value (page/page.go:35-37)."""
    tes = list(_children(elem, "TextEquiv"))
    if pos < 0 or pos >= len(tes):
        return "", False
    unis = list(_children(tes[pos], "Unicode"))
    if not unis:
        return "", False
    return _string_value(unis[0]), True


class PolygonError(ValueError):
    pass


def parse_points(s: Optional[str]) -> list[tuple[int, int]]:
    """Parse a Coords/@points string (page/page.go:324-351).

    Raises PolygonError on: missing attr (pass None), fewer than 2
    points, a token that is not an "x,y" pair, or non-integer coords.
    Matches Go strconv.Atoi: optional sign, decimal digits only.
    """
    if s is None:
        raise PolygonError("invalid coordinates: missing")
    parts = s.split(" ")
    if len(parts) < 2:
        raise PolygonError(f"invalid coordinates: {s!r}")
    points = []
    for p in parts:
        pair = p.split(",")
        if len(pair) != 2:
            raise PolygonError(f"invalid coordinates: invalid point: {p!r}")
        try:
            x = _atoi(pair[0])
            y = _atoi(pair[1])
        except ValueError as e:
            raise PolygonError(str(e))
        points.append((x, y))
    return points


def _atoi(s: str) -> int:
    """Go strconv.Atoi syntax ([+-]?digits, no spaces/underscores) with
    the engine's pinned int32 range: values outside int32 raise, so an
    oversized coordinate is a polygon error and an oversized
    reading-order @index is a skipped entry. Deliberate divergence from
    the reference (Go Atoi accepts int64) — see extract._atoi for why;
    oracle and engine must agree."""
    t = s[1:] if s[:1] in "+-" else s
    if not t or not t.isascii() or not t.isdigit():
        raise ValueError(f"invalid integer {s!r}")
    v = int(s, 10)
    if v < -(2**31) or v > 2**31 - 1:
        raise ValueError(f"integer out of int32 range {s!r}")
    return v


def bbox(points: list[tuple[int, int]]) -> tuple[int, int, int, int]:
    """Axis-aligned bounding box (x0, y0, x1, y1) = min/max reduction
    (page/page.go:301-322; image.Rect canonicalizes corner order)."""
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return min(xs), min(ys), max(xs), max(ys)


def _elem_polygon(elem: ET.Element) -> list[tuple[int, int]]:
    coords = next(_children(elem, "Coords"), None)
    pts = _attr(coords, "points") if coords is not None else None
    return parse_points(pts)


_GO_ESC = {'"': '\\"', "\\": "\\\\", "\a": "\\a", "\b": "\\b",
           "\f": "\\f", "\n": "\\n", "\r": "\\r", "\t": "\\t", "\v": "\\v"}


def _go_quote(s: str) -> str:
    """Go strconv.Quote / %q semantics (the reference's Match.String
    formatting, page/page.go:129-131): double-quoted, named escapes for
    control characters, \\x/\\u/\\U for other non-printables, printable
    unicode kept verbatim. (Python isprintable stands in for Go
    unicode.IsPrint — they agree on the ID/text alphabets in scope.)"""
    out = ['"']
    for ch in s:
        if ch in _GO_ESC:
            out.append(_GO_ESC[ch])
        elif ch.isprintable() or ch == " ":
            out.append(ch)
        else:
            cp = ord(ch)
            if cp < 0x80:
                out.append(f"\\x{cp:02x}")
            elif cp <= 0xFFFF:
                out.append(f"\\u{cp:04x}")
            else:
                out.append(f"\\U{cp:08x}")
    out.append('"')
    return "".join(out)


@dataclass
class Match:
    """page.Match (page/page.go:83-88): empty string = ignore field."""

    region_id: str = ""
    line_id: str = ""
    word_id: str = ""

    def __str__(self) -> str:
        """Reference format {%q,%q,%q} (page/page.go:129-131)."""
        return (
            "{" + ",".join(
                _go_quote(s) for s in (self.region_id, self.line_id, self.word_id)
            ) + "}"
        )


class _Node:
    """Base for Region/Line/Word — the reference's TextRegion interface
    (page/page.go:55-61): ID(), TextEquivUnicodeAt(), Polygon()."""

    def id(self) -> str:
        raise NotImplementedError

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        raise NotImplementedError

    def polygon(self) -> list[tuple[int, int]]:
        raise NotImplementedError


class Word(_Node):
    def __init__(self, elem: ET.Element):
        self.elem = elem
        self._id = _attr(elem, "id") or ""

    def id(self) -> str:
        return self._id

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        return _text_equiv_unicode_at(self.elem, pos)

    def polygon(self) -> list[tuple[int, int]]:
        return _elem_polygon(self.elem)


class Line(_Node):
    def __init__(self, elem: ET.Element):
        self.elem = elem
        self._id = _attr(elem, "id") or ""

    def id(self) -> str:
        return self._id

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        return _text_equiv_unicode_at(self.elem, pos)

    def words(self) -> list["Word"]:
        return [Word(w) for w in _children(self.elem, "Word")]

    def find_word_by_id(self, wid: str) -> tuple[Optional["Word"], bool]:
        for w in self.words():
            if w.id() == wid:
                return w, True
        return None, False

    def polygon(self) -> list[tuple[int, int]]:
        return _elem_polygon(self.elem)


class Region(_Node):
    """Holds (id, index, page-root ref) like the reference Region
    (page/page.go:165-170); accessors re-resolve the element by id."""

    def __init__(self, page: "Page", rid: str, index: int):
        self.page = page
        self._id = rid
        self.index = index

    def id(self) -> str:
        return self._id

    def _elem(self) -> Optional[ET.Element]:
        return self.page._region_elem(self._id)

    def lines(self) -> list[Line]:
        e = self._elem()
        if e is None:
            return []
        return [Line(l) for l in _children(e, "TextLine")]

    def find_line_by_id(self, lid: str) -> tuple[Optional[Line], bool]:
        for l in self.lines():
            if l.id() == lid:
                return l, True
        return None, False

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        e = self._elem()
        if e is None:
            return "", False
        return _text_equiv_unicode_at(e, pos)

    def polygon(self) -> list[tuple[int, int]]:
        e = self._elem()
        if e is None:
            raise PolygonError(f"invalid region: {self._id}")
        return _elem_polygon(e)


class Page:
    """One parsed PAGE-XML document (reference page.Page)."""

    def __init__(self, root: ET.Element):
        if _local(root.tag) != "PcGts":
            # xmlpath paths all start /PcGts — a different root matches
            # nothing; keep the object but every query comes back empty.
            self.page_elem = None
        else:
            self.page_elem = next(_children(root, "Page"), None)
        self.root = root

    @classmethod
    def from_bytes(cls, data: bytes) -> "Page":
        return cls(ET.fromstring(data))

    @classmethod
    def open(cls, path: str) -> "Page":
        return cls(ET.parse(path).getroot())

    # -- element resolution ------------------------------------------------

    def _region_elem(self, rid: str) -> Optional[ET.Element]:
        """First /PcGts/Page/TextRegion[@id=rid] (page/page.go:43-45)."""
        if self.page_elem is None:
            return None
        for tr in _children(self.page_elem, "TextRegion"):
            if _attr(tr, "id") == rid:
                return tr
        return None

    # -- reading order -----------------------------------------------------

    def regions(self) -> list[Region]:
        """Reading-order resolution (page/page.go:139-153)."""
        out = []
        if self.page_elem is None:
            return out
        for ro in _children(self.page_elem, "ReadingOrder"):
            for group in _children(ro):
                for rri in _children(group, "RegionRefIndexed"):
                    idx_s = _attr(rri, "index")
                    rid = _attr(rri, "regionRef")
                    if idx_s is None or rid is None:
                        continue  # skip erroneous nodes (page/page.go:144-146)
                    try:
                        idx = _atoi(idx_s)
                    except ValueError:
                        continue
                    out.append(Region(self, rid, idx))
        out.sort(key=lambda r: r.index)
        return out

    def find_region_by_id(self, rid: str) -> tuple[Optional[Region], bool]:
        for r in self.regions():
            if r.id() == rid:
                return r, True
        return None, False

    # -- Match lookup (page/page.go:90-127) --------------------------------

    def find(self, m: Match) -> tuple[Optional[_Node], bool]:
        hits = self._match_iter(m)
        node = next(hits, None)
        if node is None:
            return None, False
        if m.word_id:
            return Word(node), True
        if m.line_id:
            return Line(node), True
        if m.region_id:
            # node is a RegionRefIndexed; newRegion validates index+ref
            idx_s = _attr(node, "index")
            rid = _attr(node, "regionRef")
            if idx_s is None or rid is None:
                return None, False
            try:
                idx = _atoi(idx_s)
            except ValueError:
                return None, False
            return Region(self, rid, idx), True
        return None, False

    def _match_iter(self, m: Match) -> Iterator[ET.Element]:
        """Yield elements in document order for the compiled path shape."""
        if self.page_elem is None:
            return
        page = self.page_elem
        rid, lid, wid = m.region_id, m.line_id, m.word_id

        if rid and not lid and not wid:
            # /Page/ReadingOrder/*/RegionRefIndexed[@regionRef=rid]
            for ro in _children(page, "ReadingOrder"):
                for group in _children(ro):
                    for rri in _children(group, "RegionRefIndexed"):
                        if _attr(rri, "regionRef") == rid:
                            yield rri
            return

        # level-1 step: TextRegion[@id=rid] or wildcard *
        if rid:
            level1 = (e for e in _children(page, "TextRegion") if _attr(e, "id") == rid)
        else:
            level1 = _children(page)

        for r in level1:
            # level-2 step: TextLine[@id=lid] or wildcard *
            if lid:
                level2 = (e for e in _children(r, "TextLine") if _attr(e, "id") == lid)
            else:
                level2 = _children(r)
            for l in level2:
                if wid:
                    for w in _children(l, "Word"):
                        if _attr(w, "id") == wid:
                            yield w
                elif lid:
                    yield l
        # line-only / word-only shapes are depth-exact wildcards
        # (/Page/*/TextLine[@id], /Page/*/*/Word[@id]) — handled above
        # because the wildcard levels iterate all children.

    # -- document text serialization (SURVEY.md §2.12.10) -------------------

    def doc_text_and_spans(self) -> tuple[str, list[tuple[str, int, int]]]:
        parts = []
        spans = []
        off = 0
        for i, r in enumerate(self.regions()):
            t, _ = r.text_equiv_unicode_at(0)
            if i > 0:
                off += 1  # the "\n" separator
            spans.append((r.id(), off, off + len(t)))
            off += len(t)
            parts.append(t)
        return "\n".join(parts), spans

    def doc_text(self) -> str:
        return self.doc_text_and_spans()[0]


# ---------------------------------------------------------------------------
# METS manifest oracle (reference mets package)
# ---------------------------------------------------------------------------


@dataclass
class MetsMatch:
    """mets.Match (mets/mets.go:61-65): empty string = ignore field."""

    use: str = ""
    file_id: str = ""
    mime_type: str = ""

    def __str__(self) -> str:
        """Reference format {%q,%q,%q} (mets/mets.go:67-69)."""
        return (
            "{" + ",".join(
                _go_quote(s) for s in (self.use, self.file_id, self.mime_type)
            ) + "}"
        )


@dataclass(frozen=True)
class FLocat:
    type: str = ""
    url: str = ""


@dataclass(frozen=True)
class File:
    mime_type: str = ""
    id: str = ""
    flocat: FLocat = FLocat()


class Mets:
    """One parsed METS manifest (reference mets.Mets)."""

    def __init__(self, root: ET.Element):
        self.root = root if _local(root.tag) == "mets" else None

    @classmethod
    def from_bytes(cls, data: bytes) -> "Mets":
        return cls(ET.fromstring(data))

    @classmethod
    def open(cls, path: str) -> "Mets":
        return cls(ET.parse(path).getroot())

    def find_file_grp(self, use: str) -> list[File]:
        return self.find(MetsMatch(use=use))

    def find(self, m: MetsMatch) -> list[File]:
        """All matches of /mets/fileSec/fileGrp[@USE]/file[@ID][@MIMETYPE]
        (mets/mets.go:71-83), projected via newFileFromNode
        (mets/mets.go:96-126)."""
        out = []
        if self.root is None:
            return out
        for filesec in _children(self.root, "fileSec"):
            for grp in _children(filesec, "fileGrp"):
                if m.use and _attr(grp, "USE") != m.use:
                    continue
                for f in _children(grp, "file"):
                    if m.file_id and _attr(f, "ID") != m.file_id:
                        continue
                    if m.mime_type and _attr(f, "MIMETYPE") != m.mime_type:
                        continue
                    out.append(self._file_from_node(f))
        return out

    @staticmethod
    def _file_from_node(f: ET.Element) -> File:
        floc = next(_children(f, "FLocat"), None)  # first FLocat only
        flocat = FLocat()
        if floc is not None:
            flocat = FLocat(
                type=_attr(floc, "LOCTYPE") or "",
                url=_attr(floc, "href") or "",
            )
        return File(
            mime_type=_attr(f, "MIMETYPE") or "",
            id=_attr(f, "ID") or "",
            flocat=flocat,
        )
