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
from ..stages.reassemble import reassemble_docs, reassemble_docs_partitioned

PAGE_COLUMNS = ["url", "warc_ts", "html", "text"]


def read_pages(path: str, *, parallelism: int | None = None) -> rd.Dataset:
    """Column-pruned read of a pages-table parquet directory/file.

    ``parallelism`` overrides the block count: with fewer input files than
    CPUs, the default one-block-per-file read caps every downstream
    ``map_batches`` stage at n_files concurrent tasks — request at least
    2x the CPU count so the extract stage saturates the node."""
    if parallelism is None:
        import ray

        parallelism = max(2 * int(ray.cluster_resources().get("CPU", 8)), 16)
    return rd.read_parquet(path, columns=PAGE_COLUMNS, override_num_blocks=parallelism)


def read_pages_file_aligned(path: str) -> rd.Dataset:
    """Read a url-partitioned pages layout with EXACTLY one block per
    file — the read shape ``reassemble_docs_partitioned``'s precondition
    requires.  An unaligned read (Ray's default splits big files across
    blocks) silently assembles a block-straddling url into TWO doc rows;
    every consumer of ``partitioned_input=True`` must read through here
    (or run_with_manifest's file_aligned_blocks, which does the same)."""
    import os

    if os.path.isdir(path):
        n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    else:
        n_files = 1
    return rd.read_parquet(
        path, columns=PAGE_COLUMNS, override_num_blocks=max(n_files, 1)
    )


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
    partitioned_input: bool = False,
) -> rd.Dataset:
    """pages Dataset -> per-document Dataset with the byte-identical
    ``extracted_text`` per url (DOC_OUT_SCHEMA).

    ``partitioned_input=True`` selects the shuffle-free reassembly
    (reassemble_docs_partitioned) — valid only when every input block holds
    all pages of its urls (url-ranged shard layout, unsplit file reads).
    Both paths produce byte-identical output (asserted in tests)."""
    extracted = extract_pages_ds(pages, concurrency=concurrency, batch_size=batch_size)
    if partitioned_input:
        return reassemble_docs_partitioned(extracted)
    return reassemble_docs(extracted)


def run_extraction(
    input_path: str,
    output_dir: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
    resume: bool = True,
    fragments_per_part: int = 64,
    max_blob_bytes: int | None = None,
    partitioned_input: bool = False,
) -> dict:
    """Materializing entry point with resumable partitioned output
    (checkpoint manifest, SURVEY.md §4): skips input fragments whose
    partition is already committed.  ``max_blob_bytes`` enables the
    oversized-payload splitter pre-pass (stages.skew).

    ``partitioned_input=True``: the input layout is url-ranged/hash-sharded
    (corpus writer / ``partition_pages_by_url`` output) — reads stay
    file-aligned and reassembly is shuffle-free (~3x end-to-end, measured).
    Incompatible with ``max_blob_bytes`` splitting only in the sense that
    split chunks keep their url, so it composes fine."""
    from ..state.manifest import run_with_manifest

    def pipe(ds: rd.Dataset) -> rd.Dataset:
        if max_blob_bytes is not None:
            from ..stages.skew import explode_oversized

            ds = explode_oversized(ds, max_bytes=max_blob_bytes)
        return extraction_pipeline(
            ds, concurrency=concurrency, partitioned_input=partitioned_input
        )

    return run_with_manifest(
        input_path,
        output_dir,
        pipe,
        resume=resume,
        fragments_per_part=fragments_per_part,
        columns=PAGE_COLUMNS,
        file_aligned_blocks=partitioned_input,
    )
