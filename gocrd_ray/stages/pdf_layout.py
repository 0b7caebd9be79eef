"""PDF / layout parsing stage (north_star: "PDF/layout parsers" hosted
in stateful actor pools).

``PdfTextParser`` is a REAL kernel for the classic PDF subset this
environment can handle without a PDF library: object scanning, content
streams stored raw or FlateDecode-compressed (zlib is stdlib), BT/ET
text blocks with Tf/Td/TD/Tm positioning, Tj/TJ/'/" show operators,
literal strings with escape/octal sequences and hex strings. Out of
scope (per-row error, never a crash): encrypted PDFs, CMap/Type0
composite fonts, DCT/JBIG2 filters. Page attribution uses content-
stream document order — exact for linearly-written PDFs (incl. our
generator), an approximation for manipulated files.

``FakePdfLayoutParser`` (deterministic pseudo-layout) and
``StrictPdfLayoutParser`` (raises where a pdfium call belongs) remain
for plumbing tests. All variants emit the SAME region/line hierarchy
vocabulary as the PAGE-XML path, so downstream operators (explode,
dedup, text stats) run unchanged on PDF-derived rows.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import pyarrow as pa
import pyarrow.compute as pc

PDF_BLOCK = pa.struct(
    [
        ("page_no", pa.int32()),
        ("block_idx", pa.int32()),
        ("text", pa.string()),
        ("x0", pa.float32()),
        ("y0", pa.float32()),
        ("x1", pa.float32()),
        ("y1", pa.float32()),
    ]
)

PDF_EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_pages", pa.int32()),
        ("text", pa.string()),  # blocks joined by "\n" in layout order
        ("blocks", pa.list_(PDF_BLOCK)),
        ("error", pa.string()),
    ]
)


# -- real minimal-PDF codec (stdlib only) -----------------------------------


def encode_simple_pdf(pages: list[list[tuple[float, float, str]]],
                      *, compress: bool = False, font_size: int = 12) -> bytes:
    """pages = [[(x, y, text), ...], ...] → a valid single-font PDF
    (Helvetica, one content stream per page, optional FlateDecode).
    Used to build deterministic PDF corpora for tests/queries."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1", errors="replace")

    n_pages = len(pages)
    font_obj = 3 + 2 * n_pages
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, blocks in enumerate(pages):
        page_obj = 3 + 2 * i
        content_obj = 4 + 2 * i
        objs[page_obj] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_obj} 0 R "
            f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>".encode()
        )
        stream = b"".join(
            b"BT /F1 %d Tf %g %g Td (" % (font_size, x, y) + esc(t) + b") Tj ET\n"
            for x, y, t in blocks
        )
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        objs[content_obj] = head + b"\nstream\n" + stream + b"\nendstream"
    objs[font_obj] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    n_objs = max(objs) + 1
    out += b"xref\n0 %d\n" % n_objs
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_objs, xref_pos)
    )
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"(<<.*?>>)\s*stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# content-stream tokens: strings, hex strings, arrays, numbers, operators
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"      # literal string (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|[\[\]]"
    rb"|[-+]?[0-9]*\.?[0-9]+"
    rb"|/[^\s/\[\]()<>{}]*"
    rb"|[A-Za-z'\"*]+",
)
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _pdf_string(tok: bytes) -> str:
    """Decode a PDF literal or hex string token to text."""
    if tok[:1] == b"<":
        hx = b"".join(tok[1:-1].split())
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\":
            nxt = body[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
            elif nxt.isdigit():
                oct_s = body[i + 1 : i + 4]
                j = 1
                while j < 3 and body[i + j : i + j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : i + 1 + j], 8) & 0xFF)
                i += 1 + j
            else:
                i += 1  # line continuation / unknown escape: drop backslash
        else:
            out += c
            i += 1
    return out.decode("latin-1")


def extract_content_text(stream: bytes) -> list[dict]:
    """One decoded content stream → text blocks with positions.

    Tracks the text cursor through Tf (font size), Td/TD (relative
    move), Tm (absolute matrix), T* (next line); every BT..ET block
    becomes one output block whose bbox is estimated from the cursor
    positions and font size (x1 from a Helvetica-ish 0.5em average
    advance — layout-grade, not glyph-exact).
    """
    blocks: list[dict] = []
    in_bt = False
    font_size = 12.0
    x = y = 0.0
    lx = ly = 0.0  # line start (Td is relative to line start)
    stack: list = []
    cur_texts: list[tuple[float, float, str]] = []

    def flush():
        nonlocal cur_texts
        if cur_texts:
            xs = [t[0] for t in cur_texts]
            ys = [t[1] for t in cur_texts]
            text = "\n".join(t[2] for t in cur_texts)
            widest = max(len(t[2]) for t in cur_texts)
            blocks.append(
                {
                    "text": text,
                    "x0": min(xs),
                    "y0": min(ys),
                    "x1": min(xs) + 0.5 * font_size * widest,
                    "y1": max(ys) + font_size,
                }
            )
        cur_texts = []

    for m in _TOKEN_RE.finditer(stream):
        tok = m.group(0)
        c = tok[:1]
        if c in b"(<":
            stack.append(tok)
        elif c in b"[]":
            continue  # TJ arrays: strings already on the stack
        elif c == b"/" or c.isdigit() or c in b"+-." or (
            len(tok) > 1 and tok[1:2].isdigit() and c in b"-+"
        ):
            stack.append(tok)
        else:
            op = tok
            if op == b"BT":
                in_bt = True
                x = y = lx = ly = 0.0
            elif op == b"ET":
                flush()
                in_bt = False
            elif op == b"Tf" and len(stack) >= 1:
                try:
                    font_size = float(stack[-1])
                except ValueError:
                    pass
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                try:
                    lx += float(stack[-2])
                    ly += float(stack[-1])
                    x, y = lx, ly
                except ValueError:
                    pass
            elif op == b"Tm" and len(stack) >= 6:
                try:
                    lx, ly = float(stack[-2]), float(stack[-1])
                    x, y = lx, ly
                except ValueError:
                    pass
            elif op == b"T*":
                ly -= 1.2 * font_size
                x, y = lx, ly
            elif op in (b"Tj", b"'", b'"') and in_bt:
                strs = [s for s in stack if s[:1] in b"(<"]
                if strs:
                    cur_texts.append((x, y, _pdf_string(strs[-1])))
            elif op == b"TJ" and in_bt:
                strs = [s for s in stack if s[:1] in b"(<"]
                if strs:
                    cur_texts.append(
                        (x, y, "".join(_pdf_string(s) for s in strs))
                    )
            stack = []
    flush()
    return blocks


class PdfTextParser:
    """REAL actor-pool PDF text/layout parser for the classic subset
    (see module docstring). Per-document failure → error row."""

    def __init__(self, max_pages: int = 1000):
        self.max_pages = max_pages

    def _parse(self, payload: bytes) -> tuple[int, list[dict]]:
        if not payload.startswith(b"%PDF"):
            raise ValueError("not a PDF")
        if b"/Encrypt" in payload:
            raise ValueError("encrypted PDF not supported")
        page_objs = 0
        streams: list[bytes] = []
        for m in _OBJ_RE.finditer(payload):
            body = m.group(2)
            sm = _STREAM_RE.search(body)
            if sm is None:
                if re.search(rb"/Type\s*/Page\b(?!s)", body):
                    page_objs += 1
                continue
            head, data = sm.group(1), sm.group(2)
            if b"/FlateDecode" in head:
                data = zlib.decompress(data)
            elif b"/Filter" in head:
                continue  # unsupported filter: skip stream, keep going
            streams.append(data)
        if page_objs == 0 and not streams:
            raise ValueError("no page objects or content streams found")
        if page_objs > self.max_pages:
            raise ValueError("page count exceeds max_pages guard")
        blocks_out: list[dict] = []
        for page_no, stream in enumerate(streams):
            for idx, b in enumerate(extract_content_text(stream)):
                blocks_out.append(
                    {
                        "page_no": page_no,
                        "block_idx": idx,
                        "text": b["text"],
                        "x0": b["x0"],
                        "y0": b["y0"],
                        "x1": b["x1"],
                        "y1": b["y1"],
                    }
                )
        n_pages = page_objs if page_objs else len(streams)
        return n_pages, blocks_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_pages, texts, blocks, errors = [], [], [], []
        for pl in payloads:
            try:
                np_, bl = self._parse(pl or b"")
                n_pages.append(np_)
                blocks.append(bl)
                texts.append("\n".join(b["text"] for b in bl))
                errors.append(None)
            except Exception as e:  # poison rows stay rows
                n_pages.append(0)
                blocks.append(None)
                texts.append(None)
                errors.append(str(e))
        return pa.table(
            {
                "url": batch.column("media_id")
                if "media_id" in batch.column_names
                else batch.column("url"),
                "n_pages": pa.array(n_pages, pa.int32()),
                "text": pa.array(texts, pa.string()),
                "blocks": pa.array(blocks, pa.list_(PDF_BLOCK)),
                "error": pa.array(errors, pa.string()),
            }
        ).cast(PDF_EXTRACT_SCHEMA)


class FakePdfLayoutParser:
    """Actor-pool stage: (url, payload) → PDF_EXTRACT_SCHEMA.

    __init__ is where a real parser loads fonts/codecs once per actor.
    The fake kernel derives a stable layout from the payload hash.
    """

    def __init__(self, max_pages: int = 50):
        self.max_pages = max_pages

    def _parse(self, payload: bytes) -> tuple[int, list[dict]]:
        # STUB — replace with pdfium/poppler bindings in a real deployment
        h = hashlib.sha256(payload or b"").digest()
        n_pages = 1 + h[0] % min(4, self.max_pages)
        blocks = []
        for p in range(n_pages):
            for b in range(1 + h[1 + p] % 3):
                seed = h[(2 + p * 3 + b) % 32]
                y = 72.0 + 96.0 * b
                blocks.append(
                    {
                        "page_no": p,
                        "block_idx": b,
                        "text": f"block {p}.{b} token{seed}",
                        "x0": 72.0,
                        "y0": y,
                        "x1": 540.0,
                        "y1": y + 80.0,
                    }
                )
        return n_pages, blocks

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_pages, texts, blocks, errors = [], [], [], []
        for pl in payloads:
            try:
                np_, bl = self._parse(pl)
                n_pages.append(np_)
                blocks.append(bl)
                texts.append("\n".join(b["text"] for b in bl))
                errors.append(None)
            except NotImplementedError:
                raise
            except Exception as e:  # poison rows stay rows
                n_pages.append(0)
                blocks.append(None)
                texts.append(None)
                errors.append(str(e))
        return pa.table(
            {
                "url": batch.column("media_id")
                if "media_id" in batch.column_names
                else batch.column("url"),
                "n_pages": pa.array(n_pages, pa.int32()),
                "text": pa.array(texts, pa.string()),
                "blocks": pa.array(blocks, pa.list_(PDF_BLOCK)),
                "error": pa.array(errors, pa.string()),
            }
        ).cast(PDF_EXTRACT_SCHEMA)


class StrictPdfLayoutParser(FakePdfLayoutParser):
    def _parse(self, payload: bytes):
        raise NotImplementedError(
            "PDF parsing requires pdfium/poppler, not present in this "
            "environment; use FakePdfLayoutParser for plumbing tests"
        )


def parse_pdfs(media_ds, *, batch_size: int = 8, concurrency=(1, 4),
               engine: str = "real"):
    """media Dataset (media_id|url, payload) → layout Dataset. Small
    batches: PDFs are MB-scale payloads. engine: "real"
    (PdfTextParser), "fake" (plumbing stub), "strict" (raises)."""
    cls = {
        "real": PdfTextParser,
        "fake": FakePdfLayoutParser,
        "strict": StrictPdfLayoutParser,
    }[engine]
    return media_ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
