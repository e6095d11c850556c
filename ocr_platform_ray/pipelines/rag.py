"""Retrieval-ingestion pipeline — the standard two-stage RAG corpus
build as ONE composition of engine operators:

1. overlapping passage chunking (`ops/chunks.sliding_token_windows`);
2. deterministic hashed-n-gram passage embeddings
   (`ops/embed.hashed_ngram_embed`; swap in a model embedding column
   upstream and the rest is unchanged);
3. persisted IVF-PQ index with partition-pruned cell reads
   (`ops/similarity.build_ivf_pq_index` / `knn_ivf_pq`) for the
   CANDIDATE stage;
4. a vec-id-hash-partitioned passage-text sidecar for the RERANK +
   RETURN stage — searches read only the shards holding their
   candidates (partition-pruned point lookups), recompute those few
   candidates' embeddings exactly, and rerank by exact cosine.  The
   sidecar is not overhead: a RAG index must return passage text
   anyway, and exact reranking over ANN candidates is the published
   two-stage retrieval shape (ADC-quantized scores pick the pool, full
   precision picks the order — Jégou 2011 §IV.E's re-ranking variant).

Scale shape: chunking/embedding map-only; index build is the IVF-PQ
one-pass assign+encode; sidecar writes one shard per hash partition;
a search touches n_probe cells + the candidate shards only.  The
featurizer params ride ``rag_meta.json`` (atomic publish) so searches
are self-describing.

Passage identity: ``vec_id = "<doc_id>#<win_idx>"`` strings (works for
int and string document ids alike); searches split the id back into
(doc_id, win_idx) provenance.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..ops.chunks import sliding_token_windows
from ..ops.dedup import _sha64
from ..ops.embed import hashed_ngram_embed
from ..ops.similarity import (
    build_ivf_pq_index,
    knn_ivf_pq,
    train_ivf_centroids,
    train_pq,
)

_META = "rag_meta.json"
_TEXT_DIR = "passages"


def build_passage_index(
    docs: rd.Dataset,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 16,
    dim: int = 256,
    n: int = 4,
    seed: int = 1,
    n_cells: int = 8,
    m: int = 16,
    n_text_shards: int = 32,
) -> int:
    """Chunk -> embed -> persisted IVF-PQ index + passage-text sidecar
    under ``out_dir``.  Returns the passage count.  Featurizer and
    layout params persist in ``rag_meta.json`` (atomic, written LAST =
    commit marker) for self-describing searches."""
    passages = sliding_token_windows(
        docs, text_col, id_col, size=window, stride=stride
    ).map_batches(
        lambda b: b.assign(
            vec_id=b[id_col].astype(str) + "#" + b["win_idx"].astype(str)
        ),
        batch_format="pandas",
    ).materialize()  # consumed twice: vectors + sidecar

    emb = hashed_ngram_embed(
        passages, "win_text", dim=dim, n=n, seed=seed, out_col="embedding"
    )
    vecs = emb.map_batches(
        lambda b: b[["vec_id", "embedding"]], batch_format="pandas"
    ).materialize()  # consumed by the sample pass, count, and encode
    # train quantizers on a bounded CONTENT-KEYED sample in CANONICAL
    # row order: codebook quality saturates well below the corpus size
    # (train_pq's per-subspace k-means is single-core numpy — the
    # default 20k sample measured 26 s where ~4k trains in ~3 s with
    # identical retrieval), and hash-draw + vec_id sort makes the
    # trained codebooks a pure function of the corpus — Ray's block
    # delivery order can't perturb k-means initialization
    n_passages = vecs.count()
    keep_frac = min(1.0, 4096 / max(n_passages, 1))
    take_all = keep_frac >= 1.0
    cut = np.uint64(0) if take_all else np.uint64(keep_frac * 2.0**64)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        if take_all:
            return b
        h = _sha64(b["vec_id"].to_numpy(dtype=object))
        return b[h <= cut]

    sample = (
        vecs.map_batches(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sample_ds = rd.from_pandas(sample)
    big = 1 << 62  # never re-sample: the draw above is the sample
    centroids = train_ivf_centroids(
        sample_ds, emb_col="embedding", n_cells=n_cells, sample_limit=big
    )
    codebooks = train_pq(sample_ds, emb_col="embedding", m=m, sample_limit=big)
    build_ivf_pq_index(
        vecs,
        out_dir,
        emb_col="embedding",
        id_col="vec_id",
        n_cells=n_cells,
        m=m,
        centroids=centroids,
        codebooks=codebooks,
    )

    def shard(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["vec_id", "win_text"]].copy()
        out["shard"] = (
            _sha64(out["vec_id"].to_numpy(dtype=object))
            % np.uint64(n_text_shards)
        ).astype("int64")
        return out

    passages.map_batches(shard, batch_format="pandas").write_parquet(
        os.path.join(out_dir, _TEXT_DIR), partition_cols=["shard"]
    )
    n_passages = passages.count()
    meta = {
        "window": window,
        "stride": stride,
        "dim": dim,
        "n": n,
        "seed": seed,
        "n_cells": n_cells,
        "m": m,
        "n_text_shards": n_text_shards,
        "n_passages": n_passages,
    }
    tmp = os.path.join(out_dir, _META + f".tmp-{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _META))
    return n_passages


def search_passages(
    index_dir: str,
    query_texts: list[str],
    *,
    k: int = 5,
    n_probe: int = 4,
    candidates_per_query: int = 32,
    rerank: bool = True,
) -> pd.DataFrame:
    """Two-stage top-k passages per query text: IVF-PQ ADC picks
    ``candidates_per_query`` per query from the probed cells, then the
    candidates' texts load from ONLY their sidecar shards, re-embed with
    the build-time featurizer params, and exact cosine picks the final
    order (``rerank=False`` returns the raw ADC order).  Results carry
    (query_idx, rank, score, doc_id, win_idx, win_text)."""
    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)

    def embed_texts(texts: list[str]) -> np.ndarray:
        df = hashed_ngram_embed(
            rd.from_pandas(pd.DataFrame({"text": texts})),
            "text",
            dim=meta["dim"],
            n=meta["n"],
            seed=meta["seed"],
            out_col="embedding",
        ).to_pandas()
        return np.stack(df["embedding"].to_numpy())

    q = embed_texts(list(query_texts))
    cand = knn_ivf_pq(
        index_dir,
        q,
        id_col="vec_id",
        k=max(k, candidates_per_query if rerank else k),
        n_probe=min(n_probe, meta["n_cells"]),
    ).rename(columns={"adc_ip": "score"})

    if rerank and len(cand):
        ids = cand["vec_id"].unique()
        shards = np.unique(
            (_sha64(ids.astype(object)) % np.uint64(meta["n_text_shards"])).astype(
                "int64"
            )
        )
        # partition-pruned point lookups: only the candidate shards open
        # (expand to files — read_parquet takes dirs singly, not in lists)
        paths = [
            os.path.join(index_dir, _TEXT_DIR, f"shard={s}", f)
            for s in shards
            for f in sorted(
                os.listdir(os.path.join(index_dir, _TEXT_DIR, f"shard={s}"))
            )
            if f.endswith(".parquet")
        ]
        texts = rd.read_parquet(paths, columns=["vec_id", "win_text"]).to_pandas()
        texts = texts[texts["vec_id"].isin(set(ids))][["vec_id", "win_text"]]
        tv = embed_texts(texts["win_text"].tolist())
        lut = {v: i for i, v in enumerate(texts["vec_id"])}
        rows = cand["vec_id"].map(lut).to_numpy()
        cand = cand.assign(
            score=np.einsum("ij,ij->i", q[cand["query_idx"].to_numpy()], tv[rows]),
            win_text=texts["win_text"].to_numpy()[rows],
        )
    elif rerank:
        cand = cand.assign(win_text=pd.Series([], dtype=object))
    else:
        cand = cand.assign(win_text=None)

    parts = cand["vec_id"].str.rsplit("#", n=1)
    cand = cand.copy()
    cand["doc_id"] = parts.str[0]
    cand["win_idx"] = parts.str[1].astype("int64") if len(cand) else parts.str[1]
    cand = cand.sort_values(
        ["query_idx", "score", "doc_id", "win_idx"],
        ascending=[True, False, True, True],
    ).reset_index(drop=True)
    cand["rank"] = cand.groupby("query_idx").cumcount() + 1
    cand = cand[cand["rank"] <= k]
    return cand[
        ["query_idx", "rank", "score", "doc_id", "win_idx", "win_text"]
    ].reset_index(drop=True)
