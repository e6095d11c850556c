"""Leakage-free train/val/test splitting — every near-duplicate CLUSTER
lands wholly on one side of the split, the published train/test
contamination treatment (Lee et al. 2021 "Deduplicating Training Data
Makes Language Models Better" §6 measures exactly this leak; eval
decontamination in GPT-3/PaLM reports is its one-sided special case).
A plain per-document hash split leaks: a near-copy of a test document
in train inflates eval.  Splitting by CLUSTER id closes it — and the
split stays deterministic, so re-running over a grown corpus keeps all
old members of a cluster on the same side as long as the cluster's min
id is stable.

Scale shape (the ``dedup_keep_representatives`` routing): near-dup
pairs come from any pair source (MinHash default; simhash / n-gram /
embedding-cosine pair frames compose); cluster resolution routes
size-aware — driver union-find with a pair-sized broadcast dict below
the probe threshold, ``dup_clusters_distributed(as_dataset=True)`` +
one bucketed LEFT join past it (labels never land on the driver).  The
split draw itself is map-only arithmetic on the cluster id (the
``shuffle_hash`` seeded mix over a 64-bit content hash, so string ids
split identically to ints) — block-structure independent by
construction, identical across both cluster routes (same cluster ids
-> same draw).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..state.broadcast import cached_get
from .dedup import (
    _sha64,
    dup_clusters,
    dup_clusters_distributed,
    minhash_lsh_duplicates,
)
from .relational import auto_join, probe_head
from .shuffle import shuffle_hash

_MOD32 = np.uint64(1) << np.uint64(32)


def _split_from_cluster(cluster_ids, fractions: dict, seed: int) -> np.ndarray:
    """Deterministic split label per cluster id (any dtype): 64-bit
    content hash -> 32-bit seeded bijective mix -> cumulative-fraction
    bucket.  Pure per-value arithmetic."""
    h = (_sha64(np.asarray(cluster_ids, dtype=object)) % _MOD32).astype("int64")
    u = shuffle_hash(h, seed).astype(np.float64) / float(_MOD32)
    names = list(fractions)
    bounds = np.cumsum([fractions[s] for s in names])
    bounds[-1] = 1.0 + 1e-12  # u < 1 always lands in the last bucket
    idx = np.searchsorted(bounds, u, side="right")
    return np.asarray(names, dtype=object)[idx]


def leakage_free_split(
    docs: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    fractions: dict | None = None,
    seed: int = 0,
    pairs: pd.DataFrame | rd.Dataset | None = None,
    split_col: str = "split",
    clusters: str = "auto",
    driver_threshold_rows: int = 2_000_000,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> rd.Dataset:
    """Append ``split_col`` so that near-duplicate documents always share
    a split.  ``fractions`` (default train .9 / val .05 / test .05) must
    sum to 1; ``pairs`` overrides the built-in MinHash pair source with
    any (id_a, id_b) frame/Dataset (simhash, n-gram, cosine).

    ``clusters``: "driver" broadcasts a pair-sized {id: cluster} dict;
    "distributed" keeps labels a Dataset and LEFT-joins them onto the
    corpus (the corpus-scale route); "auto" probes the pair list.
    Unpaired documents are their own singleton cluster (cluster id =
    own id), so for them this degrades to an ordinary hash split."""
    fractions = fractions or {"train": 0.90, "val": 0.05, "test": 0.05}
    if len(fractions) < 2:
        raise ValueError("leakage_free_split: need >= 2 splits")
    if any(f <= 0 for f in fractions.values()) or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(
            f"leakage_free_split: fractions must be positive and sum to 1, got {fractions}"
        )
    if clusters not in ("auto", "driver", "distributed"):
        raise ValueError(f"leakage_free_split: unknown clusters route {clusters!r}")

    if pairs is None:
        pairs = minhash_lsh_duplicates(
            docs,
            text_col,
            id_col,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
            # a pandas return would decide the route BEFORE the probe —
            # auto must see a Dataset to be able to stay distributed
            as_dataset=clusters != "driver",
        )

    if clusters == "auto":
        if isinstance(pairs, pd.DataFrame):
            clusters = "driver"
        else:
            head = probe_head(pairs, driver_threshold_rows)
            if head is not None:
                pairs, clusters = head, "driver"
            else:
                clusters = "distributed"

    if clusters == "distributed" and isinstance(pairs, pd.DataFrame):
        # caller-supplied pandas pair frames route like any other source
        if len(pairs):
            pairs = rd.from_pandas(pairs)

    if clusters == "distributed" and isinstance(pairs, rd.Dataset):
        # materialize before the emptiness check so the LSH lineage runs
        # once, not once for the count and again for the label exchange
        pairs = pairs.materialize()

    if clusters == "distributed" and (
        isinstance(pairs, pd.DataFrame) or pairs.count() == 0
    ):
        # zero near-dups: a map-derived empty Dataset has no schema for
        # the label exchange to plan over — degrade to the documented
        # singleton-cluster hash split (identical output by definition)
        clusters, pairs = "driver", pd.DataFrame({"id_a": [], "id_b": []})

    if clusters == "driver":
        if not isinstance(pairs, pd.DataFrame):
            pairs = pairs.to_pandas()
        if pairs.shape[1] == 0 or len(pairs) == 0:
            # a no-dup probe lands here COLUMNLESS (an empty Dataset
            # to_pandas()-es without columns — the probe_head house rule)
            pairs = pd.DataFrame({"id_a": [], "id_b": []})
        lab = dup_clusters(pairs)
        ref = ray.put(dict(zip(lab["id"], lab["cluster_id"])))

        def assign(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            lut = cached_get(ref)
            ids = b[id_col]
            mapped = ids.map(lut)
            cl = mapped.where(mapped.notna(), ids)
            # Series.map leaves NaN for unpaired ids, upcasting int
            # labels to float — restore the id dtype so both cluster
            # routes hash IDENTICAL values
            if pd.api.types.is_integer_dtype(ids.dtype) and not (
                pd.api.types.is_integer_dtype(cl.dtype)
            ):
                cl = cl.astype(ids.dtype)
            out[split_col] = _split_from_cluster(
                cl.to_numpy(dtype=object), fractions, seed
            )
            return out

        return docs.map_batches(assign, batch_format="pandas")

    if "__lf_cluster_id" in docs.schema().names:
        raise ValueError("leakage_free_split: __lf_cluster_id column is reserved")
    labels = dup_clusters_distributed(pairs, as_dataset=True).map_batches(
        lambda b: b.rename(columns={"id": id_col, "cluster_id": "__lf_cluster_id"}),
        batch_format="pandas",
    )
    joined = auto_join(docs, labels, id_col, how="left", right_prefix="__lf_")
    cl_col = "__lf_cluster_id"

    def assign_joined(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        cl = out[cl_col].where(out[cl_col].notna(), out[id_col])
        # the left join upcasts int labels to float for the null rows —
        # restore the id dtype so both cluster routes hash IDENTICAL
        # values (118 and 118.0 hash differently)
        if pd.api.types.is_integer_dtype(out[id_col].dtype) and not (
            pd.api.types.is_integer_dtype(cl.dtype)
        ):
            cl = cl.astype(out[id_col].dtype)
        out[split_col] = _split_from_cluster(cl.to_numpy(dtype=object), fractions, seed)
        return out.drop(columns=[c for c in out.columns if c.startswith("__lf_")])

    return joined.map_batches(assign_joined, batch_format="pandas")
