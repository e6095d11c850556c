"""The flagship pipeline (SURVEY.md §3.1 rebuild shape):

    read_parquet(pages) -> map_batches(ExtractPages actor pool)
    -> groupby(url).map_groups(reassemble in warc_ts order)
    -> write_parquet(partitioned) + manifest

Mirrors the reference's book OCR path (POST /book/ocr -> book worker
fan-out -> per-page pipeline -> persist, apps/queue/src/routes/ocr.ts:18-46,
queues/book/worker.ts:11-47, queues/page/worker.ts:19-98) as one streaming
batch job.  Heavy per-row extraction runs BEFORE the url shuffle so the
shuffle payload is extracted text, not raw html bytes (SURVEY.md §4)."""

from __future__ import annotations

import ray.data as rd

from ..stages.extract import ExtractPages
from ..stages.reassemble import reassemble_docs

PAGE_COLUMNS = ["url", "warc_ts", "html", "text"]


def read_pages(path: str) -> rd.Dataset:
    """Column-pruned read of a pages-table parquet directory/file."""
    return rd.read_parquet(path, columns=PAGE_COLUMNS)


def extract_pages_ds(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
) -> rd.Dataset:
    """Per-page extraction stage.  ``batch_size`` is deliberately modest:
    rows carry whole-page html blobs, so batch bytes = batch_size x page
    size; oversized blobs are handled by Ray's dynamic block splitting plus
    the small batch size (SURVEY.md §7 hard-parts #3/#4).

    ``concurrency=None`` -> stateless tasks (fully elastic, the default for
    a pure function); an int/tuple -> actor pool (the T1/T3 warm-state
    pattern; state here is compiled regexes, cheap either way)."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        return pages.map_batches(ExtractPages, concurrency=concurrency, **kwargs)
    return pages.map_batches(ExtractPages(), **kwargs)


def extraction_pipeline(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
) -> rd.Dataset:
    """pages Dataset -> per-document Dataset with the byte-identical
    ``extracted_text`` per url (DOC_OUT_SCHEMA)."""
    extracted = extract_pages_ds(pages, concurrency=concurrency, batch_size=batch_size)
    return reassemble_docs(extracted)


def run_extraction(
    input_path: str,
    output_dir: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
    resume: bool = True,
) -> dict:
    """Materializing entry point with resumable partitioned output
    (checkpoint manifest, SURVEY.md §4): skips input fragments whose
    partition is already committed."""
    from ..state.manifest import run_with_manifest

    return run_with_manifest(
        input_path,
        output_dir,
        lambda ds: extraction_pipeline(ds, concurrency=concurrency),
        resume=resume,
    )
