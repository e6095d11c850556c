"""Incremental dedup against PERSISTED state — the continuous-ingestion
pattern: each new increment (a day's crawl, one queue drain) is deduped
against everything ever accepted, and the accepted hashes become state
for the next increment.  The reference ingests continuously through its
queue (apps/queue/src/pipeline); this is that lifecycle for the dedup
family, composed with the manifest commit discipline
(``state/manifest.py``).

Semantics: a row survives iff its content hash is UNSEEN by every prior
committed ingest AND it is the min-``id_col`` occurrence within its own
increment (arrival-order precedence across ingests, deterministic
min-id within one — the production rule: old data wins).

Scale shape:
- content hashes bucket by ``h % n_buckets``; the increment's rows move
  through ONE hash-shard exchange, and each bucket task reads ONLY its
  own bucket's state files (hash-only, one file per prior ingest) —
  state reads scale with |state|/n_buckets per task, never corpus-wide.
- state appends are (hash)-only parquet, one file per (bucket, ingest),
  written idempotently (same filename, deterministic content) from the
  bucket tasks; VISIBILITY is gated by the driver-committed ingest
  marker written last, so a SIGKILLed ingest never contaminates the
  next attempt (its torn files are excluded and overwritten).
- the survivors themselves are committed under the ingest id: re-running
  a committed ingest returns the identical result without recomputing
  or re-appending (idempotent replay, the ``run_with_manifest`` rule).

Compaction of the per-ingest bucket files (many small ingests -> merge
a bucket's files into one) is deliberately out of scope here; buckets
stay correct regardless, only read fan-in grows with ingest count.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .dedup import _sha64
from .relational import freeze_list_columns, thaw_list_columns


def _bucket_dir(state_dir: str, b: int) -> str:
    return os.path.join(state_dir, "buckets", f"b{b:03d}")


def _marker_path(state_dir: str, ingest_id: str) -> str:
    return os.path.join(state_dir, "ingests", ingest_id + ".json")


def _survivors_dir(state_dir: str, ingest_id: str) -> str:
    return os.path.join(state_dir, "ingests", ingest_id)


def committed_ingests(state_dir: str) -> list[str]:
    """Ingest ids with a committed marker, in commit order."""
    pat = os.path.join(state_dir, "ingests", "*.json")
    out = []
    for p in sorted(glob.glob(pat)):
        try:
            with open(p) as f:
                m = json.load(f)
            out.append((m.get("seq", 0), os.path.basename(p)[: -len(".json")]))
        except (json.JSONDecodeError, OSError):
            continue  # torn marker = uncommitted
    return [name for _, name in sorted(out)]


def incremental_exact_dedup(
    ds: rd.Dataset,
    content_col: str,
    id_col: str,
    state_dir: str,
    *,
    ingest_id: str,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Dedup one increment against the committed state (see module
    docstring), append the survivors' hashes, commit, and return the
    survivors (full input schema + ``n_dups`` = in-increment duplicate
    count).  Replaying a committed ``ingest_id`` is a read."""
    if "/" in ingest_id or not ingest_id:
        raise ValueError(f"ingest_id must be a non-empty path segment: {ingest_id!r}")

    marker = _marker_path(state_dir, ingest_id)
    sdir = _survivors_dir(state_dir, ingest_id)
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        spec = {c: np.dtype(t) for c, t in m.get("spec", {}).items()}
        return thaw_list_columns(rd.read_parquet(sdir), spec)

    committed = set(committed_ingests(state_dir))
    # bucket layout is part of the state's identity: a different
    # n_buckets would route hashes past their recorded bucket and
    # silently re-admit known content
    for prior in committed:
        with open(_marker_path(state_dir, prior)) as f:
            nb = json.load(f).get("n_buckets")
        if nb != n_buckets:
            raise ValueError(
                f"state {state_dir!r} was built with n_buckets={nb}; "
                f"got {n_buckets}"
            )
        break

    # in-batch combiner (the exact_dedup pattern): hash, collapse
    # duplicates early, carry partial counts
    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["__h"] = _sha64(b[content_col].to_numpy()).astype("int64")
        out["n_dups"] = 1
        agg = {c: "first" for c in out.columns if c not in (id_col, "n_dups", "__h")}
        agg[id_col] = "min"
        agg["n_dups"] = "sum"
        out = out.sort_values(id_col).groupby("__h", as_index=False).agg(agg)
        out["__b"] = (out["__h"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)).astype(
            "int64"
        )
        return out

    frozen, spec = freeze_list_columns(ds)
    hashed = frozen.map_batches(add_hash, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        # finish the in-increment combine: all rows of a hash are here
        agg = {c: "first" for c in g.columns if c not in (id_col, "n_dups", "__h", "__b")}
        agg[id_col] = "min"
        agg["n_dups"] = "sum"
        g = g.sort_values(id_col).groupby("__h", as_index=False).agg(agg)
        # state lookup: ONLY this bucket's files from COMMITTED ingests
        # (a torn prior attempt of any uncommitted ingest — including
        # this one — is invisible and gets overwritten)
        bdir = _bucket_dir(os.path.dirname(os.path.dirname(marker)), b)
        known: list[np.ndarray] = []
        for p in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
            if os.path.basename(p)[: -len(".parquet")] in committed:
                known.append(pq.read_table(p, columns=["h"])["h"].to_numpy())
        if known:
            seen = np.concatenate(known)
            keep = ~np.isin(g["__h"].to_numpy(), seen)
            g = g[keep]
        # idempotent state append: fixed filename, deterministic content,
        # atomic tmp+rename; invisible until the driver commits the marker
        os.makedirs(bdir, exist_ok=True)
        new_h = np.sort(g["__h"].to_numpy())
        tmp = os.path.join(bdir, f".{ingest_id}.tmp")
        pq.write_table(pa.table({"h": pa.array(new_h, pa.int64())}), tmp)
        os.replace(tmp, os.path.join(bdir, f"{ingest_id}.parquet"))
        return g.drop(columns=["__h"])

    survivors = hashed.groupby("__b").map_groups(per_bucket, batch_format="pandas")

    # durable survivors + commit marker LAST (the checkpoint_dataset
    # discipline): a kill anywhere above leaves no committed trace
    os.makedirs(os.path.join(state_dir, "ingests"), exist_ok=True)
    tmp = sdir + ".tmp"
    for p in (tmp, sdir):
        if os.path.exists(p):
            shutil.rmtree(p)
    survivors.write_parquet(tmp)
    os.replace(tmp, sdir)
    mtmp = marker + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(
            {
                "seq": len(committed),
                "n_buckets": n_buckets,
                "spec": {c: t.name for c, t in spec.items()},
            },
            f,
        )
    os.replace(mtmp, marker)
    return thaw_list_columns(rd.read_parquet(sdir), spec)
