"""Avro Object Container File source + sink — the row-oriented
interchange format of the Hadoop/Kafka data-lake world, implemented
entirely from the public Apache Avro 1.11 specification (§"Object
Container Files" + §"Binary Encoding"):

* header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker;
* data blocks: record count (zigzag long), byte size, codec-compressed
  record bytes, sync marker — a reader can split on sync markers, which
  is exactly why the format suits distributed scans;
* binary encoding: zigzag varints for int/long, length-prefixed UTF-8
  strings/bytes, 8-byte LE IEEE doubles, unions as a zigzag branch
  index + value, arrays as count-prefixed blocks with a 0 terminator;
* codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951, no header per
  the spec).

Schema mapping (write): every field is the nullable union
``["null", T]`` with T = long / double / string / bytes / {"type":
"array","items": long|double|string|bytes} from the column dtype +
first non-null value — nulls encode as branch 0 at zero data bytes,
the Avro idiom.  Read handles any record schema over those primitives
(plain or union-wrapped), skipping nothing silently: an unsupported
type raises.

Encode/decode is per-record Python by nature (Avro is row-framed — the
WARC/TFRecord sink precedent) but touches each byte O(1) times.  Sink
mirrors the house contract: one file per input block, content-keyed
deterministic names (the sync marker derives from the record bytes'
sha1, so reruns are byte-identical), tmp + ``os.replace`` atomic
publish, identical-block collision error, stale-shard cleanup.  Read
is one streaming task per file with bounded yielded batches; the sync
marker is verified per block.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

import numpy as np
import pandas as pd
import ray.data as rd

from ._infer import infer_column_plan

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# binary primitives (Avro spec §Binary Encoding)
# --------------------------------------------------------------------------
def _zigzag(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    u &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint overflow (corrupt file)")


def _enc_bytes(v: bytes) -> bytes:
    return _zigzag(len(v)) + v


def _enc_str(v: str) -> bytes:
    return _enc_bytes(v.encode("utf-8"))


# --------------------------------------------------------------------------
# schema <-> column plan
# --------------------------------------------------------------------------
_PRIMS = {"long", "double", "string", "bytes"}


def _column_plan(b: pd.DataFrame) -> list[tuple[str, str, bool]]:
    """[(column, avro primitive, is_list)] — the shared sink inference
    (`sources/_infer.py`) mapped onto Avro primitives: int -> long,
    float -> double, str -> string, bytes -> bytes."""
    kind_map = {"int": "long", "float": "double", "str": "string", "bytes": "bytes"}
    try:
        return [
            (col, kind_map[kind], is_list)
            for col, kind, is_list in infer_column_plan(b)
        ]
    except ValueError as e:
        raise ValueError(f"write_avro: {e}") from None


def _schema_json(plan: list[tuple[str, str, bool]]) -> str:
    fields = []
    for col, prim, is_array in plan:
        t: object = {"type": "array", "items": prim} if is_array else prim
        fields.append({"name": col, "type": ["null", t]})
    return json.dumps(
        {"type": "record", "name": "Row", "fields": fields}, sort_keys=True
    )


def _enc_value(prim: str, v) -> bytes:
    if prim == "long":
        return _zigzag(int(v))
    if prim == "double":
        return struct.pack("<d", float(v))
    if prim == "string":
        return _enc_str(v) if isinstance(v, str) else _enc_bytes(bytes(v))
    return _enc_bytes(bytes(v))


def _encode_rows(b: pd.DataFrame, plan: list[tuple[str, str, bool]]) -> list[bytes]:
    cols = {c: b[c].to_numpy() for c, _, _ in plan}
    nulls = {c: b[c].isna().to_numpy() for c, _, _ in plan}
    records: list[bytes] = []
    for i in range(len(b)):
        parts: list[bytes] = []
        for col, prim, is_array in plan:
            if nulls[col][i]:
                parts.append(b"\x00")  # union branch 0 = null
                continue
            parts.append(b"\x02")  # union branch 1 (zigzag(1))
            v = cols[col][i]
            if is_array:
                if len(v):
                    parts.append(_zigzag(len(v)))
                    for x in v:
                        parts.append(_enc_value(prim, x))
                parts.append(b"\x00")  # array terminator
            else:
                parts.append(_enc_value(prim, v))
        records.append(b"".join(parts))
    return records


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------
def _parse_schema(meta_schema: bytes) -> list[tuple[str, str, bool, bool]]:
    """-> [(name, primitive, is_array, nullable)] for a record of the
    supported shapes; anything else raises loudly."""
    sch = json.loads(meta_schema.decode("utf-8"))
    if not (isinstance(sch, dict) and sch.get("type") == "record"):
        raise ValueError("read_avro: only record schemas are supported")
    plan = []
    for f in sch["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):  # union
            branches = [x for x in t if x != "null"]
            if len(branches) != 1 or len(branches) == len(t):
                raise ValueError(
                    f"read_avro: unsupported union {t!r} on field {f['name']!r}"
                )
            nullable = True
            t = branches[0]
        if isinstance(t, dict) and t.get("type") == "array":
            items = t["items"]
            if items not in _PRIMS and items != "int" and items != "float":
                raise ValueError(
                    f"read_avro: unsupported array items {items!r} on {f['name']!r}"
                )
            plan.append((f["name"], str(items), True, nullable))
        elif t in _PRIMS or t in ("int", "float", "boolean"):
            plan.append((f["name"], str(t), False, nullable))
        else:
            raise ValueError(
                f"read_avro: unsupported type {t!r} on field {f['name']!r}"
            )
    return plan


def _dec_value(prim: str, buf: bytes, pos: int):
    if prim in ("long", "int"):
        return _read_zigzag(buf, pos)
    if prim == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if prim == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if prim == "boolean":
        return bool(buf[pos]), pos + 1
    ln, pos = _read_zigzag(buf, pos)
    raw = buf[pos : pos + ln]
    return (raw.decode("utf-8") if prim == "string" else raw), pos + ln


def _decode_records(
    buf: bytes, n: int, plan: list[tuple[str, str, bool, bool]]
) -> list[dict]:
    pos = 0
    rows: list[dict] = []
    for _ in range(n):
        row: dict = {}
        for name, prim, is_array, nullable in plan:
            if nullable:
                branch, pos = _read_zigzag(buf, pos)
                if branch == 0:
                    row[name] = None
                    continue
            if is_array:
                vals: list = []
                while True:
                    cnt, pos = _read_zigzag(buf, pos)
                    if cnt == 0:
                        break
                    if cnt < 0:  # block with byte size (spec-allowed)
                        cnt = -cnt
                        _, pos = _read_zigzag(buf, pos)
                    for _i in range(cnt):
                        v, pos = _dec_value(prim, buf, pos)
                        vals.append(v)
                row[name] = vals
            else:
                row[name], pos = _dec_value(prim, buf, pos)
        rows.append(row)
    if pos != len(buf):
        raise ValueError(
            f"avro: data block decoded {pos} of {len(buf)} bytes — schema drift"
        )
    return rows


# --------------------------------------------------------------------------
# container file
# --------------------------------------------------------------------------
def _enc_meta_map(meta: dict[str, bytes]) -> bytes:
    parts = [_zigzag(len(meta))]
    for k in sorted(meta):
        parts.append(_enc_str(k))
        parts.append(_enc_bytes(meta[k]))
    parts.append(b"\x00")
    return b"".join(parts)


def build_container(
    records: list[bytes], schema_json: str, *, codec: str = "null"
) -> bytes:
    """Records + schema -> one Avro OCF byte string.  The sync marker
    derives from the record bytes (md5 of payload) so identical input
    produces identical files — the idempotent-sink requirement; the spec
    only asks for 16 unique-ish bytes."""
    payload = b"".join(records)
    sync = hashlib.md5(schema_json.encode() + payload).digest()
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("ascii"),
    }
    if codec == "deflate":
        blockbytes = zlib.compress(payload, 6)[2:-4]  # raw RFC1951 per spec
    elif codec == "null":
        blockbytes = payload
    else:
        raise ValueError(f"avro: unsupported codec {codec!r}")
    out = [_MAGIC, _enc_meta_map(meta), sync]
    if records:
        out += [_zigzag(len(records)), _zigzag(len(blockbytes)), blockbytes, sync]
    return b"".join(out)


def parse_container(buf: bytes, *, path: str = "?"):
    """Yield (records_bytes, count, plan) per data block after verifying
    magic and sync markers."""
    if buf[:4] != _MAGIC:
        raise ValueError(f"avro: bad magic in {path}")
    pos = 4
    nkeys, pos = _read_zigzag(buf, pos)
    meta: dict[str, bytes] = {}
    while nkeys != 0:
        if nkeys < 0:
            _, pos = _read_zigzag(buf, pos)  # block byte size
            nkeys = -nkeys
        for _ in range(nkeys):
            klen, pos = _read_zigzag(buf, pos)
            k = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _read_zigzag(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen
        nkeys, pos = _read_zigzag(buf, pos)
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r} in {path}")
    plan = _parse_schema(meta["avro.schema"])
    sync = buf[pos : pos + 16]
    pos += 16
    while pos < len(buf):
        cnt, pos = _read_zigzag(buf, pos)
        size, pos = _read_zigzag(buf, pos)
        raw = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError(f"avro: sync-marker mismatch in {path}")
        pos += 16
        if codec == "deflate":
            raw = zlib.decompress(raw, -15)
        yield raw, cnt, plan


# --------------------------------------------------------------------------
# Dataset sink / source
# --------------------------------------------------------------------------
def write_avro_dataset(
    ds: rd.Dataset,
    out_dir: str,
    *,
    codec: str = "null",
) -> list[str]:
    """Dataset -> Avro OCF shards, one per input block (no driver
    funnel), content-keyed sha1 names (idempotent byte-identical
    reruns — the sync marker itself is content-derived), atomic
    publish, collision error, stale-shard cleanup: the JSONL/TFRecord
    house contract.  ``codec``: "null" or "deflate"."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object)})
        plan = _column_plan(b)
        payload = build_container(
            _encode_rows(b, plan), _schema_json(plan), codec=codec
        )
        key = hashlib.sha1(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.avro")
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as out:
            out.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path]})

    out = ds.map_batches(write_block, batch_format="pandas")
    paths = [p for b in out.iter_batches(batch_format="pandas") for p in b["path"]]
    if len(paths) != len(set(paths)):
        raise ValueError(
            "write_avro_dataset: two byte-identical input blocks mapped to the "
            "same content-keyed shard (rows would be lost on a directory read) "
            "— repartition the input or add a distinguishing column"
        )
    keep = set(os.path.basename(p) for p in paths)
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".avro") and f not in keep:
            os.unlink(os.path.join(out_dir, f))
    return sorted(paths)


def read_avro(
    paths: list[str] | str,
    *,
    columns: list[str] | None = None,
    batch_rows: int = 256,
) -> rd.Dataset:
    """Read Avro Object Container Files into a Dataset — one streaming
    task per file (the WARC/TFRecord source shape), bounded
    ``batch_rows`` yields.  Avro is row-framed, so every byte decodes;
    ``columns`` prunes right after decode to keep the object store
    narrow."""
    if isinstance(paths, str):
        paths = (
            sorted(
                os.path.join(paths, f)
                for f in os.listdir(paths)
                if f.endswith(".avro")
            )
            if os.path.isdir(paths)
            else [paths]
        )
    if not paths:
        raise ValueError("read_avro: no .avro files to read")

    def parse(batch: pd.DataFrame):
        for path in batch["path"]:
            with open(path, "rb") as fh:
                buf = fh.read()
            pending: list[dict] = []
            names: list[str] | None = None
            for raw, cnt, plan in parse_container(buf, path=path):
                if names is None:
                    names = [n for n, _, _, _ in plan]
                    if columns is not None:
                        names = [n for n in names if n in set(columns)]
                pending.extend(_decode_records(raw, cnt, plan))
                while len(pending) >= batch_rows:
                    chunk, pending = pending[:batch_rows], pending[batch_rows:]
                    yield pd.DataFrame(chunk, columns=names)
            if pending and names is not None:
                yield pd.DataFrame(pending, columns=names)

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(parse, batch_size=1, batch_format="pandas")
