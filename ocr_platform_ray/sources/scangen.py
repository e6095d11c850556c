"""Fixture writer for SCANNED (image-only) PDFs — the purely rasterized
book shape the reference handles through its OCR stage
(apps/queue/src/lib/ocr.ts): pages carry NO text operators at all, only
a full-page 8-bit grayscale image XObject whose pixels are the
rasterized article layout.

The pixels come from the SAME layout (`pdfgen.article_items`) and the
SAME renderer (`stages/raster.rasterize_boxes` + glyph atlas) the
extraction side owns, and the recognizer (`stages/ocr.py`) inverts that
renderer exactly — so a scanned article and its text twin
(`make_article_pdf` of the same items) extract byte-identically, with
zero flagged pages.  Text must be UPPERCASE (plus digits/punctuation):
the small-caps fixture font renders lowercase identically to uppercase,
so only uppercase text survives the pixel round-trip byte-exactly.
"""

from __future__ import annotations

import zlib

import numpy as np

from ..stages.raster import rasterize_boxes
from .pdfgen import _PdfBuilder, article_items


def make_scanned_pdf(
    pages_items: list[list[dict]],
    *,
    page_w: float = 612,
    page_h: float = 792,
    scale: float = 2.0,
) -> bytes:
    """Positioned text items (the `make_pdf` shape) -> an image-only PDF:
    per page one FlateDecode /DeviceGray image XObject painted over the
    full page box, no text operators anywhere."""
    b = _PdfBuilder()
    pages_root = b.reserve()
    kids = []
    for items in pages_items:
        boxes = [
            (
                float(it["x"]),
                float(it["y"]),
                float(it["x"]) + 0.5 * float(it.get("size", 12)) * len(it["text"]),
                float(it["y"]) + float(it.get("size", 12)),
                "",
                it["text"],
            )
            for it in items
        ]
        px = rasterize_boxes(boxes, page_w=page_w, page_h=page_h, scale=scale)
        h_px, w_px = px.shape
        img = b.stream_obj(
            b"/Type /XObject /Subtype /Image /Width "
            + str(w_px).encode()
            + b" /Height "
            + str(h_px).encode()
            + b" /ColorSpace /DeviceGray /BitsPerComponent 8 ",
            px.tobytes(),
            compress=True,
        )
        content = (
            b"q " + f"{page_w:g} 0 0 {page_h:g} 0 0".encode() + b" cm /Im1 Do Q"
        )
        cs = b.stream_obj(b"", content, compress=True)
        page = b.add(
            b"<< /Type /Page /Parent "
            + str(pages_root).encode()
            + b" 0 R /MediaBox [0 0 "
            + f"{page_w:g} {page_h:g}".encode()
            + b"] /Resources << /XObject << /Im1 "
            + str(img).encode()
            + b" 0 R >> >> /Contents "
            + str(cs).encode()
            + b" 0 R >>"
        )
        kids.append(page)
    b.set(
        pages_root,
        b"<< /Type /Pages /Kids ["
        + b" ".join(str(k).encode() + b" 0 R" for k in kids)
        + b"] /Count "
        + str(len(kids)).encode()
        + b" >>",
    )
    catalog = b.add(
        b"<< /Type /Catalog /Pages " + str(pages_root).encode() + b" 0 R >>"
    )
    return b.render(catalog)


def make_scanned_article(
    title: str,
    paragraphs: list[str],
    *,
    page_number: int | None = None,
    footnote: str | None = None,
    scale: float = 2.0,
) -> bytes:
    """Image-only twin of `make_article_pdf`: same layout, pixels instead
    of text operators.  Pass UPPERCASE content for exact round-trip (the
    small-caps font collapses case)."""
    items = article_items(
        title, paragraphs, page_number=page_number, footnote=footnote
    )
    return make_scanned_pdf([items], scale=scale)
