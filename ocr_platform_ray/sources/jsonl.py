"""JSONL (newline-delimited JSON) source + sink — the lingua franca of
LLM training-data interchange (The Pile, RedPajama, Dolma and C4 all
ship as compressed JSONL shards), next to the parquet and WARC/WET
sources.

Read: `ray.data.read_json` (pyarrow's streaming NDJSON parser; gzip
inferred per file extension by Ray's file datasource).  JSON has no
byte-level column projection — every byte parses regardless, the
format's cost vs parquet — so ``columns=`` prunes immediately AFTER
parse inside the read tasks and nothing wider enters the object store.

Write: one file per input block (the WET sink shape — no driver
funnel), content-keyed deterministic names so reruns overwrite
identically (idempotent resumable sink), tmp + ``os.replace`` atomic
publish.  Rows serialize with pandas' C JSON emitter (records/lines
mode, UTF-8, ISO dates), so a write task never iterates Python rows.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pandas as pd
import ray.data as rd


def read_jsonl(
    paths: list[str] | str,
    *,
    columns: list[str] | None = None,
    **read_kwargs,
) -> rd.Dataset:
    """Read newline-delimited JSON files (``.jsonl`` / ``.jsonl.gz``)
    into a Dataset.  ``columns`` projects right after parse (JSON must
    parse every byte either way; the projection keeps the object store
    narrow).  Extra kwargs pass through to ``ray.data.read_json``."""
    if isinstance(paths, str):
        paths = [paths]
    ds = rd.read_json(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl_dataset(
    ds: rd.Dataset,
    out_dir: str,
    *,
    compress: bool = False,
    force_ascii: bool = False,
) -> list[str]:
    """Dataset -> JSONL shard files, one per input block (each task
    writes its own file — partitioned, no driver funnel).  Names are
    keyed by the serialized content's sha1, so a rerun of the same
    input overwrites the same files byte-identically (idempotent sink);
    publish is atomic (tmp + ``os.replace``).  Returns the file list.

    Two directory-consistency guarantees on top of the per-file ones:
    byte-identical input BLOCKS would silently collapse into one shard
    (rows lost on a directory read) — detected and raised with a
    repartition hint; and shards from a previous run over DIFFERENT
    input are removed after this run's files are all published, so a
    directory read sees exactly this run's rows (stale-mixed-with-fresh
    is otherwise unobservable)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object)})
        payload = b.to_json(
            orient="records",
            lines=True,
            force_ascii=force_ascii,
            date_format="iso",
        ).encode("utf-8")
        key = hashlib.sha1(payload).hexdigest()[:16]
        path = os.path.join(
            out_dir, f"part-{key}.jsonl" + (".gz" if compress else "")
        )
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as out:
            out.write(gzip.compress(payload, mtime=0) if compress else payload)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path]})

    out = ds.map_batches(write_block, batch_format="pandas")
    paths = [
        p for b in out.iter_batches(batch_format="pandas") for p in b["path"]
    ]
    if len(paths) != len(set(paths)):
        raise ValueError(
            "write_jsonl_dataset: two byte-identical input blocks mapped to "
            "the same content-keyed shard (rows would be lost on a directory "
            "read) — repartition the input or add a distinguishing column"
        )
    keep = set(os.path.basename(p) for p in paths)
    for f in os.listdir(out_dir):  # stale shards from a previous run
        if f.startswith("part-") and (f.endswith(".jsonl") or f.endswith(".jsonl.gz")) and f not in keep:
            os.unlink(os.path.join(out_dir, f))
    return sorted(paths)
