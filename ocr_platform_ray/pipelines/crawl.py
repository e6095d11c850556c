"""Continuous crawl-corpus maintenance: WARC increments in, deduped
extracted documents out — the composition that runs the engine as the
reference's ingest loop does (per-book ingest -> process -> persist,
``apps/queue/src/queues/book/worker.ts:11-47``), but batch, resumable and
content-deduplicated across increments.

One increment = one crawl segment's ``.warc.gz`` files:

    read_warc (streaming per-file parse)
      -> extraction_pipeline (the flagship byte-identical extractor)
      -> incremental_{exact,minhash}_dedup vs the persisted bucket state
         (ops/incremental.py: committed-marker visibility, replay)
      -> per-ingest parquet partition under the corpus root

Idempotence contract: an increment whose dedup marker is committed AND
whose corpus partition directory exists is a NO-OP.  The partition is
published by ONE atomic directory rename (fragments write to
``ingest=<id>.tmp`` first), so a crash at ANY point leaves either no
partition (the rerun rewrites it from the committed dedup replay,
without re-extraction) or a complete one — a partially-written
partition can never be observed.  Each increment's output lives in its
own directory, so failed runs never corrupt earlier increments and
``read_corpus`` is a plain recursive parquet read.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..schemas import DOC_OUT_SCHEMA
from ..ops.boilerplate import extract_main_content
from ..ops.incremental import (
    committed_ingests,
    incremental_exact_dedup,
    incremental_minhash_dedup,
)
from ..sources.warc import read_warc
from .extraction import extraction_pipeline


def _main_content_docs(pages: rd.Dataset) -> rd.Dataset:
    """Raw-HTML crawl route: one WARC response = one single-page document
    (the Common-Crawl capture model); boilerplate drops via
    `ops/boilerplate.extract_main_content` and the result lands in the
    same DOC_OUT_SCHEMA as the flagship extractor, so dedup, the corpus
    layout and `read_corpus` are route-independent.  Multi-page urls
    belong to the flagship route (it reassembles by url)."""
    ext = extract_main_content(pages, html_col="html")

    def to_docs(b: pd.DataFrame) -> pd.DataFrame:
        txt = b["main_text"].fillna("")
        return pd.DataFrame(
            {
                "url": b["url"],
                "extracted_text": txt,
                "n_pages": np.int64(1),
                "total_words": txt.str.count(r"\S+").astype("int64"),
                "page_numbers": [[1]] * len(b),
                "n_failed_pages": np.int64(0),
                "page_offsets": [[0]] * len(b),
            }
        )

    return ext.map_batches(to_docs, batch_format="pandas")


def _ingest_out_dir(corpus_dir: str, ingest_id: str) -> str:
    return os.path.join(corpus_dir, f"ingest={ingest_id}")


def ingest_crawl_increment(
    warc_paths: list[str] | str,
    corpus_dir: str,
    state_dir: str,
    *,
    ingest_id: str,
    dedup: str = "exact",
    minhash_threshold: float = 0.8,
    extractor: str = "flagship",
) -> dict:
    """Process one crawl increment end to end; returns a summary dict
    ``{"ingest_id", "n_docs", "n_survivors", "out_dir", "replayed"}``.

    ``dedup="exact"`` drops documents whose extracted text already
    exists in ANY committed increment (or earlier in this one);
    ``"minhash"`` additionally blocks near-duplicates (banded MinHash
    vs the persisted band-bucket state).

    ``extractor="flagship"`` runs the byte-identical multi-page
    extraction pipeline (the engine's native page markup);
    ``"main_content"`` treats each response as one raw-HTML capture and
    extracts its main content through the jusText/boilerpipe block rule
    (`ops/boilerplate.py`) — the Common-Crawl-shaped route."""
    out_dir = _ingest_out_dir(corpus_dir, ingest_id)
    already = ingest_id in committed_ingests(state_dir)
    # the partition directory is published by ONE atomic rename below,
    # so its existence means the partition is COMPLETE — a fragment-count
    # check would wrongly accept a partially-written directory
    if already and os.path.isdir(out_dir):
        files = glob.glob(os.path.join(out_dir, "*.parquet"))
        n = rd.read_parquet(files).count() if files else 0
        return {
            "ingest_id": ingest_id,
            "n_docs": None,
            "n_survivors": int(n),
            "out_dir": out_dir,
            "replayed": True,
        }

    if dedup not in ("exact", "minhash"):
        raise ValueError(f"dedup must be 'exact' or 'minhash', got {dedup!r}")
    if extractor not in ("flagship", "main_content"):
        raise ValueError(
            f"extractor must be 'flagship' or 'main_content', got {extractor!r}"
        )
    if already:
        # crash hit between the dedup commit and the corpus write: the
        # dedup replay is a pure read of the committed survivors
        # (ops/incremental.py contract) — skip re-extraction entirely
        docs = rd.from_items([{"url": "", "extracted_text": ""}])
        n_docs = None
    else:
        if extractor == "flagship":
            docs = extraction_pipeline(read_warc(warc_paths))
        else:
            # revisit records carry no payload — the raw-HTML route
            # reads responses only
            docs = _main_content_docs(
                read_warc(warc_paths, record_types=("response",))
            )
        # consumed by dedup AND (via survivors) the write: pin once so
        # the WARC parse + extraction doesn't re-execute per consumer
        docs = docs.materialize()
        n_docs = int(docs.count())
    if dedup == "exact":
        survivors = incremental_exact_dedup(
            docs, "extracted_text", "url", state_dir, ingest_id=ingest_id
        )
    else:
        survivors = incremental_minhash_dedup(
            docs, "extracted_text", "url", state_dir,
            ingest_id=ingest_id, threshold=minhash_threshold,
        )

    tmp_dir = out_dir + ".tmp"
    for stale in (tmp_dir, out_dir):
        if os.path.isdir(stale):
            shutil.rmtree(stale)  # partial write from a crashed attempt

    def enforce_schema(b) -> "pa.Table":
        # pin every fragment to the declared doc schema: a block whose
        # list column is all-null would otherwise write Arrow `null`
        # type and poison the union read of the corpus; list cells
        # arrive as numpy objects (the dedup thaw), so the Arrow list
        # arrays are built explicitly (Ray's tensor-extension casting
        # rejects variable-length object columns)
        arrays, names = [], []
        for f in DOC_OUT_SCHEMA:
            col = b[f.name]
            if pa.types.is_list(f.type):
                vals = [None if v is None else list(v) for v in col]
                arrays.append(pa.array(vals, type=f.type))
            else:
                arrays.append(pa.array(col.tolist(), type=f.type))
            names.append(f.name)
        for extra in b.columns:
            if extra not in names:
                arrays.append(pa.array(b[extra].tolist()))
                names.append(extra)
        return pa.Table.from_arrays(arrays, names=names)

    survivors = survivors.map_batches(
        enforce_schema, batch_format="pandas"
    ).materialize()
    os.makedirs(tmp_dir, exist_ok=True)  # zero-survivor increments too
    survivors.write_parquet(tmp_dir)
    # atomic publish: a SIGKILL during write_parquet leaves only the tmp
    # dir, which the next run clears — out_dir can never be partial
    os.rename(tmp_dir, out_dir)
    return {
        "ingest_id": ingest_id,
        "n_docs": n_docs,
        "n_survivors": int(survivors.count()),
        "out_dir": out_dir,
        "replayed": already,
    }


def read_corpus(corpus_dir: str) -> rd.Dataset:
    """All committed increments as one Dataset (per-ingest partitions)."""
    files = sorted(glob.glob(os.path.join(corpus_dir, "ingest=*", "*.parquet")))
    if not files:
        raise ValueError(f"read_corpus: no increments under {corpus_dir}")
    return rd.read_parquet(files)
