"""Extraction pipeline stages (SURVEY.md §2.2 M1-M8, §2.3 T1/T3).

The reference's per-page pipeline is OCR -> correct -> convert-to-html ->
segment (apps/queue/src/pipeline/index.ts:19-104), each stage an LLM call.
Here the same dataflow is deterministic code: ``extract.extract_page`` is
the fused M1+M2+M3 operator (the reference's own "final" fused stage,
pipeline/final.ts:78-137, fuses them identically), and ``ExtractPages`` is
the actor-pool ``map_batches`` wrapper holding compiled parser state.
"""

from .extract import ExtractPages, extract_page  # noqa: F401
from .raster import RasterizePdfPages, rasterize_pdf, rasterize_pdf_pages  # noqa: F401
from .reassemble import reassemble_docs  # noqa: F401
