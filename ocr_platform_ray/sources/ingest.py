"""Ingest jobs: raw files -> pages table, page-count probes, and the
url-hash repartition that establishes the partitioned layout invariant.

Reference parity (SURVEY.md §2.1):
  S1  PDF fetch+parse (ocr.ts:20-33)    -> ``ingest_raw_html``: bytes are a
      binary column from ``read_binary_files`` — no per-row fetch.
  S2  page-count probe (ocr.ts:35-38)   -> ``page_count_probe``: metadata
      aggregate (groupby(url).count with in-batch combiner).
  S7  row sink (page/worker.ts:68-97)   -> ``partition_pages_by_url``:
      write-once url-hash-partitioned shards.

``partition_pages_by_url`` is the north rule's "explicit repartitioning by
url hash": ONE all-to-all exchange that lays arbitrary input out so every
url's pages are colocated in exactly one shard.  After it, the shuffle-free
extraction path (reassemble_docs_partitioned) and partition-granular
resume/redo apply to any corpus, and every later stage reuses the same
partitioning key (SURVEY.md §4 "pick ONE partitioning key").
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

# module-top so pickle-by-value captures it for worker closures
from ..stages.pdf import pdf_page_count


def ingest_raw_html(paths: list[str] | str, *, default_lang: str = "") -> rd.Dataset:
    """Raw .html files on disk/object store -> pages-table rows.  The file
    mtime stands in for ``warc_ts`` (capture time); path is the url key."""
    import datetime

    ds = rd.read_binary_files(paths, include_paths=True)

    def to_pages(batch: pd.DataFrame) -> pd.DataFrame:
        mtimes = [
            datetime.datetime.utcfromtimestamp(int(os.stat(p).st_mtime)) for p in batch["path"]
        ]
        return pd.DataFrame(
            {
                "url": ["file://" + p for p in batch["path"]],
                "warc_ts": mtimes,
                "html": batch["bytes"],
                "text": ["" for _ in mtimes],
                "lang": [default_lang for _ in mtimes],
            }
        )

    return ds.map_batches(to_pages, batch_format="pandas")


def page_count_probe(pages: rd.Dataset) -> pd.DataFrame:
    """S2/A3: pages per url, pre-aggregated in-batch so the shuffle moves
    one partial row per (url, batch) — also the completeness check (M18)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("url", as_index=False).agg(n_pages=("url", "size"))

    partials = pages.map_batches(partial, batch_format="pandas").to_pandas()
    out = partials.groupby("url", as_index=False).agg(n_pages=("n_pages", "sum"))
    return out.sort_values("url").reset_index(drop=True)


# raw-file ingestion is payload-agnostic: extract_page sniffs %PDF- bytes
# vs HTML per row, so the same reader ingests mixed .html/.pdf trees
ingest_raw_files = ingest_raw_html


def read_dim_pandas(
    path: str, columns: list[str] | None = None, *, max_rows: int = 2_000_000
) -> pd.DataFrame | None:
    """Read a DIMENSION table straight to pandas when the parquet footer
    proves it small — zero Ray executions (vs one probe execution per
    consuming join).  Returns None above ``max_rows``: the caller falls
    back to its Dataset plan, so the scale path is never lost.  Only for
    dim-sided plans (T2/J5 broadcast rule); fact tables always stream."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    if f.metadata.num_rows > max_rows:
        return None
    return f.read(columns=columns).to_pandas()


def parquet_column_bounds(path: str, column: str):
    """Exact (min, max) of a parquet column from ROW-GROUP STATISTICS —
    O(row_groups) driver-side metadata reads, zero Ray executions and zero
    data pages touched.  The catalog-metadata source for operators that
    take a ``bounds=`` hint (interval_join, range partitioners): at corpus
    scale a dedicated min/max scan re-executes the reader lineage, while
    the footer already carries the answer.  Returns None when any row
    group lacks statistics for the column (caller falls back to a scan)."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    idx = {meta.schema.column(i).path: i for i in range(meta.num_columns)}
    if column not in idx:
        return None
    lo = hi = None
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(idx[column]).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def pdf_blob_page_counts(pages: rd.Dataset, *, payload_col: str = "html") -> rd.Dataset:
    """S2 for real PDF blobs (reference ocr.ts:35-38 ``getPageCount``):
    per-row internal page count probed from the byte stream (0 for non-PDF
    payloads).  Map-only; feeds the S3 oversized-blob explode decision."""

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        counts = []
        for payload in b[payload_col]:
            if isinstance(payload, (bytes, bytearray)) and payload[:5] == b"%PDF-":
                try:
                    counts.append(pdf_page_count(bytes(payload)))
                except Exception:
                    counts.append(0)
            else:
                counts.append(0)
        return pd.DataFrame({"url": b["url"], "n_pdf_pages": pd.array(counts, dtype="int64")})

    return pages.map_batches(probe, batch_format="pandas")


def partition_pages_by_url(
    pages: rd.Dataset,
    out_dir: str,
    *,
    n_shards: int = 64,
) -> list[str]:
    """The ONE ingest shuffle: hash(url) % n_shards -> one parquet shard per
    bucket, written atomically.  Guarantees every url's pages live in
    exactly one shard file, so downstream extraction runs shuffle-free and
    resume/redo operate at shard granularity.

    Skew note: a single url bigger than a worker's heap needs
    stages.skew.explode_oversized BEFORE this (its chunks share the url and
    still colocate); hot-url salting is not needed because the invariant is
    per-url locality, not shard balance — imbalance only costs shard-size
    variance, bounded by max-url-size."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["__shard"] = pd.util.hash_array(b["url"].to_numpy()) % n_shards
        return out

    bucketed = pages.map_batches(add_bucket, batch_format="pandas")

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["__shard"].iloc[0])
        g = g.drop(columns="__shard").sort_values(["url", "warc_ts"])
        path = os.path.join(out_dir, f"pages-{sid:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), path + ".tmp")
        os.replace(path + ".tmp", path)
        return pd.DataFrame({"path": [path], "rows": [len(g)]})

    manifest = (
        bucketed.groupby("__shard").map_groups(write_shard, batch_format="pandas").to_pandas()
    )
    return sorted(manifest["path"])




def _footer_stats_record(meta, columns: list[str]) -> dict:
    """One file's footer scan (pure function of the metadata object —
    unit-testable without parquet fixtures): {"n_rows", "ok", per-column
    min/max/nulls}.  ok=False on any stats gap: missing column,
    possibly-truncated string stats, absent min/max, or a writer that
    omitted null counts (legal per the spec) — the caller's contract is
    exact-or-None."""
    idx = {meta.schema.column(i).path: i for i in range(meta.num_columns)}
    rec: dict = {"n_rows": meta.num_rows, "ok": True}
    for c in columns:
        if c not in idx:
            rec["ok"] = False
            break
        phys = meta.schema.column(idx[c]).physical_type
        if phys == "BYTE_ARRAY" and "DECIMAL" not in str(
            meta.schema.column(idx[c]).logical_type
        ):
            rec["ok"] = False  # possibly-truncated string stats
            break
        lo = hi = None
        nulls = 0
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max or st.null_count is None:
                lo = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
            nulls += st.null_count
        if lo is None:
            rec["ok"] = False
            break
        rec[f"{c}_min"], rec[f"{c}_max"], rec[f"{c}_nulls"] = lo, hi, nulls
    return rec


def parquet_stats_agg(
    path: str | list[str], columns: list[str]
) -> pd.DataFrame | None:
    """COUNT / per-column MIN / MAX / null count answered from parquet
    FOOTERS ONLY — zero data pages read, the aggregate-pushdown
    optimization every lakehouse scan planner applies.  One Ray task per
    file batch reads metadata; the driver merges file-count-sized
    partials.  Returns one row (n_rows, {col}_min, {col}_max,
    {col}_nulls per column), or None when any row group lacks
    statistics for a requested column (caller falls back to a real
    scan).  String stats are REFUSED (footers may store truncated
    min/max for long strings — correct only for numeric / temporal /
    boolean columns)."""
    import pyarrow.parquet as pq_
    import ray.data as rd_

    if isinstance(path, str):
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
            )
        else:
            paths = [path]
    else:
        paths = list(path)
    if not paths:
        raise ValueError("parquet_stats_agg: no input files")

    def footer_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                _footer_stats_record(pq_.ParquetFile(p).metadata, columns)
                for p in b["path"]
            ]
        )

    parts = (
        rd_.from_items([{"path": p} for p in paths])
        .map_batches(footer_partial, batch_size=64, batch_format="pandas")
        .to_pandas()
    )
    if not bool(parts["ok"].all()):
        return None
    out = {"n_rows": int(parts["n_rows"].sum())}
    for c in columns:
        out[f"{c}_min"] = parts[f"{c}_min"].min()
        out[f"{c}_max"] = parts[f"{c}_max"].max()
        out[f"{c}_nulls"] = int(parts[f"{c}_nulls"].sum())
    return pd.DataFrame([out])


def read_parquet_salvage(
    paths: list[str] | str,
    *,
    columns: list[str] | None = None,
    quarantine_dir: str | None = None,
    **read_kwargs,
):
    """Resilient parquet read for 100k-file object-store inputs: probe
    every file's FOOTER driver-side (cheap — bytes at the tail, no data
    pages), read only the healthy ones, and REPORT the corrupt rest
    instead of letting one truncated upload kill an 80-hour job.  The
    reference's per-queue-item try/catch + flag pattern
    (apps/queue/src/pipeline/index.ts error handling) applied at the
    storage boundary.

    Returns ``(dataset, report)`` where report is a DataFrame
    ``(path, status, error)`` with status in {ok, corrupt}.  With
    ``quarantine_dir`` set, corrupt files are MOVED there (rename) so a
    rerun's directory listing is clean — the manifest/redo machinery can
    then reprocess the quarantine after a re-upload.  Raises only when
    NO file survives."""
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data as _rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                _glob.glob(os.path.join(paths, "**", "*.parquet"),
                           recursive=True)
            )
        else:
            files = [paths]
    else:
        files = sorted(paths)
    if not files:
        raise ValueError("read_parquet_salvage: no input files")
    rows = []
    good = []
    for f in files:
        try:
            _pq.read_metadata(f)
            good.append(f)
            rows.append({"path": f, "status": "ok", "error": None})
        except Exception as e:  # corrupt footer / truncation / not parquet
            err = f"{type(e).__name__}: {e}"
            if quarantine_dir is not None:
                os.makedirs(quarantine_dir, exist_ok=True)
                dest = os.path.join(quarantine_dir, os.path.basename(f))
                os.replace(f, dest)
                err += f" (quarantined -> {dest})"
            rows.append({"path": f, "status": "corrupt", "error": err})
    report = pd.DataFrame(rows)
    if not good:
        raise ValueError(
            f"read_parquet_salvage: all {len(files)} files corrupt; "
            "see the report"
        )
    return _rd.read_parquet(good, columns=columns, **read_kwargs), report
