"""Arrow IPC (Feather v2) + ORC source/sink — the two remaining
columnar interchange formats next to parquet / JSONL / CSV / WARC.
IPC is the zero-conversion Arrow wire format (what `ray.data` blocks
already are — a read is a buffer map, not a decode); ORC is the other
big columnar lake format.  Both are SEEKABLE column stores, so unlike
JSONL the ``columns=`` projection happens AT the read (only the
selected columns' buffers/streams leave storage — the parquet
contract, kept for every columnar source).

Read: one task per file (the file is the format's natural partition
unit), `pyarrow.feather.read_table(path, columns=...)` /
`pyarrow.orc.ORCFile.read(columns=...)` inside the task — paths must
be worker-visible (shared store), the same contract as
``read_parquet`` everywhere else in the engine.

Write: one file per input block (the JSONL/WET sink shape — no driver
funnel), content-keyed deterministic names so reruns land on the same
files (idempotent resumable sink), tmp + ``os.replace`` atomic
publish, stale-shard cleanup after publish.  The content key is the
sha1 of the block's Arrow IPC serialization for BOTH formats — IPC
bytes are a pure function of the data, while ORC's container may
differ byte-wise between writer runs, so keying on the payload (not
the container) keeps the names stable either way.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.orc as orc
import ray.data as rd


def _file_list(paths: list[str] | str, exts: tuple[str, ...]) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f)
                for f in os.listdir(paths)
                if f.endswith(exts)
            )
        else:
            paths = [paths]
    if not paths:
        raise ValueError("columnar read: no input files")
    return list(paths)


def read_ipc(
    paths: list[str] | str, *, columns: list[str] | None = None
) -> rd.Dataset:
    """Arrow IPC / Feather-v2 files -> Dataset.  One read task per file;
    ``columns`` projects at the read (IPC is seekable — unselected
    columns' buffers are never touched)."""
    files = _file_list(paths, (".arrow", ".feather", ".ipc"))

    def load(batch):
        for p in batch["path"]:
            yield feather.read_table(p, columns=columns)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        load, batch_size=1, batch_format="pandas"
    )


def read_orc(
    paths: list[str] | str, *, columns: list[str] | None = None
) -> rd.Dataset:
    """ORC files -> Dataset.  One read task per file; ``columns``
    projects at the read (only the selected columns' stripe streams
    decode)."""
    files = _file_list(paths, (".orc",))

    def load(batch):
        for p in batch["path"]:
            yield orc.ORCFile(p).read(columns=columns)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        load, batch_size=1, batch_format="pandas"
    )


def _content_key(t: pa.Table) -> str:
    """sha1 of the table's IPC serialization — a pure function of the
    data (schema + values), independent of the output container."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return hashlib.sha1(sink.getvalue().to_pybytes()).hexdigest()[:16]


def _write_blocks(
    ds: rd.Dataset, out_dir: str, ext: str, emit, *, label: str
) -> list[str]:
    """Shared per-block sink: content-keyed name, atomic publish, stale
    cleanup.  ``emit(table, tmp_path)`` writes one file."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string())})
        path = os.path.join(out_dir, f"part-{_content_key(t)}{ext}")
        tmp = path + f".tmp-{os.getpid()}"
        emit(t, tmp)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], type=pa.string())})

    out = ds.map_batches(write_block, batch_format="pyarrow")
    paths = [
        p
        for b in out.iter_batches(batch_format="pyarrow")
        for p in b.column("path").to_pylist()
    ]
    if len(paths) != len(set(paths)):
        raise ValueError(
            f"{label}: two byte-identical input blocks mapped to the same "
            "content-keyed shard (rows would be lost on a directory read) — "
            "repartition the input or add a distinguishing column"
        )
    keep = {os.path.basename(p) for p in paths}
    for f in os.listdir(out_dir):  # stale shards from a previous run
        if f.startswith("part-") and f.endswith(ext) and f not in keep:
            os.unlink(os.path.join(out_dir, f))
    return sorted(paths)


def write_ipc_dataset(
    ds: rd.Dataset, out_dir: str, *, compression: str = "zstd"
) -> list[str]:
    """Dataset -> Feather-v2 (Arrow IPC file) shards, one per input
    block.  Returns the published file list."""

    def emit(t: pa.Table, tmp: str) -> None:
        feather.write_feather(t, tmp, compression=compression)

    return _write_blocks(ds, out_dir, ".arrow", emit, label="write_ipc_dataset")


def write_orc_dataset(
    ds: rd.Dataset, out_dir: str, *, compression: str = "ZSTD"
) -> list[str]:
    """Dataset -> ORC shards, one per input block.  Returns the
    published file list."""

    def emit(t: pa.Table, tmp: str) -> None:
        orc.write_table(t, tmp, compression=compression)

    return _write_blocks(ds, out_dir, ".orc", emit, label="write_orc_dataset")
