"""PDF / layout parsing stage (north_star: "PDF/layout parsers" hosted
in stateful actor pools).

No PDF library exists in this container, so the PARSE KERNEL IS A STUB:
``FakePdfLayoutParser`` emits a deterministic pseudo-layout (pages →
text blocks with bboxes in PDF points) derived from the payload bytes,
and ``StrictPdfLayoutParser`` raises NotImplementedError where a real
pdfium/poppler call belongs. The surrounding engine shape is real: the
output reuses the SAME region/line hierarchy vocabulary as the PAGE-XML
path (a layout block is a region with a bbox and text), so downstream
operators (explode, dedup, text stats) run unchanged on PDF-derived
rows.
"""

from __future__ import annotations

import hashlib

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
               strict: bool = False):
    """media Dataset (media_id|url, payload) → layout Dataset. Small
    batches: PDFs are MB-scale payloads."""
    cls = StrictPdfLayoutParser if strict else FakePdfLayoutParser
    return media_ds.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
