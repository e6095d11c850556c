"""Scanned (image-only) PDFs extract text through the deterministic
template-match recognizer (round-4 verdict item #6 — the reference's
OCR stage, apps/queue/src/lib/ocr.ts:77-122, made deterministic):
a scanned article and its text twin extract byte-identically, and the
corpus's scanned url class produces zero flagged pages."""

import numpy as np
import pytest
import ray.data as rd

from ocr_platform_ray.corpus import (
    is_scanned_url,
    make_pages_table,
    page_payload,
    url_for,
)
from ocr_platform_ray.sources.pdfgen import make_article_pdf
from ocr_platform_ray.sources.scangen import make_scanned_article
from ocr_platform_ray.stages.extract import extract_page
from ocr_platform_ray.stages.ocr import recognize_pixels
from ocr_platform_ray.stages.raster import rasterize_boxes


class TestRecognizer:
    def test_rasterize_recognize_round_trip(self):
        boxes = [
            (72.0, 60.0, 200.0, 81.0, "", "HEADING 42"),
            (72.0, 110.0, 400.0, 122.0, "", "THE QUICK BROWN FOX, 123!"),
            (72.0, 130.0, 400.0, 142.0, "", "SECOND LINE: (WITH) PUNCT?"),
        ]
        px = rasterize_boxes(boxes, scale=2.0)
        got = recognize_pixels(px, scale=2.0)
        assert [t for _, _, _, t in got] == [
            "HEADING 42",
            "THE QUICK BROWN FOX, 123!",
            "SECOND LINE: (WITH) PUNCT?",
        ]
        # geometry round-trips exactly: (x, top_y, size) in points
        assert [(x, y, s) for x, y, s, _ in got] == [
            (72.0, 60.0, 21.0),
            (72.0, 110.0, 12.0),
            (72.0, 130.0, 12.0),
        ]

    def test_interior_spaces_and_blank_page(self):
        boxes = [(72.0, 100.0, 300.0, 112.0, "", "A  B   C")]
        px = rasterize_boxes(boxes, scale=2.0)
        assert [t for *_, t in recognize_pixels(px, scale=2.0)] == ["A  B   C"]
        blank = np.full((200, 200), 255, dtype=np.uint8)
        assert recognize_pixels(blank, scale=2.0) == []


class TestScannedTwinParity:
    CASES = [
        dict(
            title="CHAPTER 3",
            paragraphs=[
                "THE QUICK BROWN FOX JUMPS OVER A LAZY DOG WHILE RIVERS OF "
                "TEXT FLOW THROUGH ANCIENT LIBRARIES WHERE SCHOLARS ANNOTATE "
                "EVERY MARGIN WITH CAREFUL NOTES",
                "ABOUT HISTORY LANGUAGE AND THE SLOW WORK OF MEMORY",
            ],
            page_number=3,
            footnote="1. CAREFUL NOTES ABOUT HISTORY",
        ),
        dict(title="A", paragraphs=["SINGLE SHORT LINE."], page_number=None, footnote=None),
    ]

    def test_scanned_extracts_byte_identical_to_text_twin(self):
        for case in self.CASES:
            scanned = make_scanned_article(
                case["title"],
                case["paragraphs"],
                page_number=case["page_number"],
                footnote=case["footnote"],
            )
            twin = make_article_pdf(
                case["title"],
                case["paragraphs"],
                page_number=case["page_number"],
                footnote=case["footnote"],
            )
            a, b = extract_page(scanned, ""), extract_page(twin, "")
            assert a["failed_stage"] is None and a["flags"] == []
            for k in ("header", "body", "footnotes", "page_number", "spans"):
                assert a[k] == b[k], (k, case["title"])

    def test_scanned_pdf_has_no_text_operators(self):
        pdf = make_scanned_article("CHAPTER 1", ["NO TEXT OPERATORS HERE."])
        assert b"Tj" not in pdf and b"TJ" not in pdf and b"/Font" not in pdf


@pytest.mark.usefixtures("ray_session")
class TestScannedCorpusClass:
    def test_scanned_urls_extract_clean(self):
        from ocr_platform_ray.pipelines.extraction import extraction_pipeline

        df = extraction_pipeline(rd.from_arrow(make_pages_table(60))).to_pandas()
        scanned = df[df.url.isin([url_for(u) for u in range(60) if is_scanned_url(u)])]
        assert len(scanned) == 5
        assert (scanned["n_failed_pages"] == 0).all()
        assert (scanned["total_words"] > 0).all()

    def test_scanned_payload_is_image_only_pdf(self):
        html, _prior, lang = page_payload(9, 0)
        assert html[:5] == b"%PDF-" and lang == "en"
        assert b"/Font" not in html and b"/Image" in html
