"""Training-mixture assembly — the ONE-CALL composition of the engine's
LLM-data endgame: source weights (doc-rate up/down-sampling) → per-source
token budgets → seeded global epoch order → concatenate-then-split
context packing → assembled chunk text, optionally straight into
TFRecord shards.  Each stage is the already-tested operator in its
documented distributed shape; this module only WIRES them (the
curate_corpus convention applied to the mixing side):

    ops/mix.weighted_source_mixture   floor(w) + Bernoulli(frac) copies
    ops/mix.token_budget_sample       fill each source to N tokens
    ops/shuffle.shuffle_hash          the seeded order (bijective)
    ops/pack.range_prefix_sum         distributed ordered prefix sum
    ops/chunks.grouped_ordered_concat per-chunk text, moved exactly once

Determinism: every stage is a pure function of (corpus, seed) — the same
inputs yield byte-identical chunks under any block structure or
parallelism (tested), which is what makes a 100 TB mixture REPRODUCIBLE
across reruns and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..ops.chunks import grouped_ordered_concat
from ..ops.lm import _clean_tokens
from ..ops.mix import token_budget_sample, weighted_source_mixture
from ..ops.pack import range_prefix_sum
from ..ops.relational import auto_join
from ..ops.shuffle import shuffle_hash

_MAX_COPIES = 8  # mix keys pack as id * 8 + copy_idx


def prepare_training_mix(
    docs: rd.Dataset,
    *,
    weights: dict[str, float],
    budgets: dict[str, int | None] | None = None,
    seed: int = 0,
    chunk_tokens: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    out_dir: str | None = None,
) -> rd.Dataset | tuple[rd.Dataset, list[str]]:
    """docs (id, text, source) -> packed training chunks
    ``(chunk_id, n_items, chunk_text)`` in the seed-determined global
    order.  ``weights`` up/down-sample per source (a doc can appear
    ``floor(w)+1`` times; weights must stay below 8 — the copy-key
    packing domain); ``budgets`` optionally caps each source's TOKEN
    total (epoch-shuffle fill order).  With ``out_dir`` the chunks also
    land as TFRecord shards (``chunk_id`` int64 + ``chunk_text`` bytes)
    and ``(dataset, files)`` returns.

    Ids must be unique non-negative ints below 2^29 (the packed key
    stays in the 2^32 shuffle-hash domain)."""
    if any(not (0.0 <= w < _MAX_COPIES) for w in weights.values()):
        raise ValueError(f"weights must be in [0, {_MAX_COPIES}) — the copy-key domain")
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 29)):
            raise ValueError(f"{id_col} must be in [0, 2^29)")
        _, lens = _clean_tokens(b[text_col].fillna(""))
        out = b[[id_col, source_col]].copy()
        out["n_tokens"] = lens.astype("int64")
        return out

    counted = docs.map_batches(count_tokens, batch_format="pandas")
    mixed = weighted_source_mixture(
        counted,
        source_col=source_col,
        key_col=id_col,
        weights=weights,
        seed=seed,
    )

    def pack_key(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["mix_key"] = (
            b[id_col].to_numpy(dtype="int64") * _MAX_COPIES
            + b["copy_idx"].to_numpy(dtype="int64")
        )
        return out

    keyed = mixed.map_batches(pack_key, batch_format="pandas")
    if budgets is not None:
        keyed = token_budget_sample(
            keyed,
            source_col=source_col,
            key_col="mix_key",
            token_col="n_tokens",
            budgets=budgets,
            seed=seed,
        )

    def add_order(b: pd.DataFrame) -> pd.DataFrame:
        mk = b["mix_key"].to_numpy(dtype="int64")
        # the budget stage projects to (key, source, tokens) — the doc id
        # recovers from the packed key on either path
        out = pd.DataFrame(
            {
                "mix_key": mk,
                id_col: mk // _MAX_COPIES,
                "n_tokens": b["n_tokens"].to_numpy(dtype="int64"),
            }
        )
        out["sk"] = shuffle_hash(mk, seed + 1).astype("int64")
        return out

    ordered = keyed.map_batches(add_order, batch_format="pandas")
    pref = range_prefix_sum(
        ordered,
        "sk",
        "n_tokens",
        out_col="start_tok",
        carry_cols=[id_col],
        key_max=(1 << 32) - 1,
    )
    packed = pref.map_batches(
        lambda b: b.assign(
            chunk_id=b["start_tok"].to_numpy(dtype="int64") // chunk_tokens
        ),
        batch_format="pandas",
    )
    withtext = auto_join(
        packed, docs.select_columns([id_col, text_col]), id_col
    )
    chunks = grouped_ordered_concat(
        withtext,
        group_col="chunk_id",
        order_col="sk",
        text_col=text_col,
        sep="\n",
    )
    if out_dir is None:
        return chunks
    from ..sources.tfrecord import write_tfrecord_dataset

    def to_records(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "chunk_id": b["chunk_id"].astype("int64"),
                "chunk_text": [t.encode("utf-8") for t in b["chunk_text"]],
            }
        )

    files = write_tfrecord_dataset(
        chunks.map_batches(to_records, batch_format="pandas"), out_dir
    )
    return chunks, files
