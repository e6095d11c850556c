"""Format-dispatching read/write — ONE entry point over every
interchange format the engine speaks (parquet, JSONL, CSV, Arrow IPC,
ORC, WARC/WET), keyed by file extension the way every lakehouse CLI
does it.  Powers the ``convert`` CLI subcommand; library callers who
know their format should call the typed readers directly (they expose
the format-specific knobs).

Formats and their extensions:

    parquet   .parquet
    jsonl     .jsonl  .jsonl.gz
    csv       .csv
    ipc       .arrow  .feather  .ipc
    orc       .orc
    tfrecord  .tfrecord  .tfrecord.gz  .tfrecords
    avro      .avro
    sqlite    .sqlite  .db
    xml       .xml  .xml.gz
    warc      .warc  .warc.gz   (read-only here; pages-table schema)
    wet       .wet   .wet.gz    (read: conversion records)

Reads accept a file or a directory (the directory's extension majority
decides); ``columns=`` pushes projection into every columnar reader.
Writes are the engine's idempotent per-block sinks where one exists
(jsonl/ipc/orc), Ray's native writers for parquet/csv.
"""

from __future__ import annotations

import os

import ray.data as rd

from .avro import read_avro, write_avro_dataset
from .columnar import read_ipc, read_orc, write_ipc_dataset, write_orc_dataset
from .jsonl import read_jsonl, write_jsonl_dataset
from .sqlite_io import read_sqlite, write_sqlite_dataset
from .tfrecord import read_tfrecord, write_tfrecord_dataset
from .warc import read_warc, read_wet
from .xml_io import read_xml, write_xml_dataset

_EXT_FORMAT = [
    ((".parquet",), "parquet"),
    ((".jsonl", ".jsonl.gz"), "jsonl"),
    ((".csv",), "csv"),
    ((".arrow", ".feather", ".ipc"), "ipc"),
    ((".orc",), "orc"),
    ((".tfrecord", ".tfrecord.gz", ".tfrecords"), "tfrecord"),
    ((".avro",), "avro"),
    ((".sqlite", ".db"), "sqlite"),
    ((".xml", ".xml.gz"), "xml"),
    ((".warc", ".warc.gz"), "warc"),
    ((".wet", ".wet.gz"), "wet"),
]

READ_FORMATS = tuple(f for _, f in _EXT_FORMAT)
WRITE_FORMATS = (
    "parquet", "jsonl", "csv", "ipc", "orc", "tfrecord", "avro", "sqlite",
    "xml",
)


def detect_format(path: str) -> str:
    """Format name for a file or directory (majority extension wins in a
    directory; ties break by the _EXT_FORMAT order).  Raises on a path
    with no recognized data files."""
    names = (
        sorted(os.listdir(path)) if os.path.isdir(path) else [os.path.basename(path)]
    )
    counts: dict[str, int] = {}
    for name in names:
        low = name.lower()
        for exts, fmt in _EXT_FORMAT:
            if low.endswith(exts):
                counts[fmt] = counts.get(fmt, 0) + 1
                break
    if not counts:
        raise ValueError(f"detect_format: no recognized data files under {path!r}")
    return max(counts, key=lambda f: (counts[f], -READ_FORMATS.index(f)))


def read_auto(
    path: str, *, fmt: str | None = None, columns: list[str] | None = None
) -> rd.Dataset:
    """Read a file/directory into a Dataset, dispatching on extension
    (or an explicit ``fmt``).  ``columns`` projects in every columnar
    reader (parquet/ipc/orc at the read; jsonl/csv right after parse)."""
    fmt = fmt or detect_format(path)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt == "jsonl":
        return read_jsonl(path if os.path.isdir(path) else [path], columns=columns)
    if fmt == "csv":
        ds = rd.read_csv(path)
        return ds.select_columns(columns) if columns else ds
    if fmt == "ipc":
        return read_ipc(path, columns=columns)
    if fmt == "orc":
        return read_orc(path, columns=columns)
    if fmt == "tfrecord":
        return read_tfrecord(path, columns=columns)
    if fmt == "avro":
        return read_avro(path, columns=columns)
    if fmt == "sqlite":
        return read_sqlite(path, columns=columns)
    if fmt == "xml":
        return read_xml(path, columns=columns)
    if fmt in ("warc", "wet"):
        ds = read_warc(path) if fmt == "warc" else read_wet(path)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"read_auto: unknown format {fmt!r} (have {READ_FORMATS})")


def write_auto(ds: rd.Dataset, out_dir: str, fmt: str) -> int:
    """Write a Dataset to ``out_dir`` in ``fmt``; returns the file count
    (idempotent per-block sinks where the engine has one)."""
    if fmt == "parquet":
        ds.write_parquet(out_dir)
        return len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    if fmt == "jsonl":
        return len(write_jsonl_dataset(ds, out_dir))
    if fmt == "csv":
        ds.write_csv(out_dir)
        return len(os.listdir(out_dir))
    if fmt == "ipc":
        return len(write_ipc_dataset(ds, out_dir))
    if fmt == "orc":
        return len(write_orc_dataset(ds, out_dir))
    if fmt == "tfrecord":
        return len(write_tfrecord_dataset(ds, out_dir))
    if fmt == "avro":
        return len(write_avro_dataset(ds, out_dir))
    if fmt == "sqlite":
        return len(write_sqlite_dataset(ds, out_dir))
    if fmt == "xml":
        return len(write_xml_dataset(ds, out_dir))
    raise ValueError(f"write_auto: unknown format {fmt!r} (have {WRITE_FORMATS})")
