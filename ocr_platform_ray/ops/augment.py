"""Training-data augmentation — deterministic masked-language-model
corruption (Devlin et al. 2018 §3.1, the published BERT recipe): select
15 % of tokens; of those, 80 % become ``[MASK]``, 10 % a random
vocabulary token, 10 % stay unchanged.  The pretraining-data transform
that turns a curated corpus into MLM examples.

Determinism contract (the epoch-shuffle rule): every draw derives from
``pd.util.hash_array`` over salted ``(id, token position)`` integers — a
pure function of (corpus, seed), so the same example masks identically
under any parallelism, block structure, or rerun, and a different
``seed`` yields an independent epoch of masks.  (NOT `shuffle_hash`:
that mix is AFFINE in the key, so two "lanes" differ by a constant
shift and conditioning on one biases the other — measured: every
selected token landed in the mask branch.)

Scale shape: MAP-ONLY.  One Arrow whitespace tokenize per batch, ONE
flat hashed-uniform array over every token of the batch (no per-row
Python, no per-row RNG objects), masked text rebuilt with
``pc.binary_join``.  The random-replacement tokens draw from the
DOCUMENT's own token multiset (self-vocabulary — no external vocab
file), indexed by a third hash lane; a batch-level draw would depend on
block structure (measured) and break the determinism contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_MOD64F = float(1 << 64)


def _lane(key: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Independent uniform [0,1) per key: nonlinear 64-bit hash over the
    salted key (lanes must not be affinely related — see module doc)."""
    salted = key + np.int64(seed) * np.int64(1 << 40) + np.int64(salt)
    return pd.util.hash_array(salted).astype("float64") / _MOD64F


def mlm_mask(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    mask_token: str = "[MASK]",
    seed: int = 0,
    out_col: str = "masked_text",
    labels_col: str = "mask_positions",
) -> rd.Dataset:
    """Add ``out_col`` (the corrupted text) and ``labels_col`` (int64
    list of masked token positions — the prediction targets).  Ids must
    be non-negative ints below 2^29 (the position-packing domain);
    documents longer than 8 tokens per position slot pack as
    ``id * 2^34 + pos`` which stays within the int64 hash domain."""
    if not (0.0 < mask_rate < 1.0):
        raise ValueError("mask_rate must be in (0, 1)")

    def corrupt(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(dtype="int64")
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 29)):
            raise ValueError(f"{id_col} must be in [0, 2^29)")
        arr = pa.array(b[text_col].fillna(""), pa.string())
        toks = pc.split_pattern(pc.utf8_lower(arr), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        counts = offs[1:] - offs[:-1]
        n_tok = int(counts.sum())
        row_idx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        pos = np.arange(n_tok, dtype=np.int64) - np.repeat(offs[:-1], counts)
        # one hashed-uniform lane per decision: select, branch, pick
        key = ids[row_idx] * (1 << 34) + pos
        u_sel = _lane(key, seed, 0)
        u_branch = _lane(key, seed, 1)
        u_pick = pd.util.hash_array(key + np.int64(seed) * np.int64(1 << 40) + np.int64(2))
        nonempty = (
            pc.greater(pc.binary_length(flat), 0)
            .to_numpy(zero_copy_only=False)
        )
        selected = (u_sel < mask_rate) & nonempty
        # 80/10/10 within the selected set (the published split)
        to_mask = selected & (u_branch < 0.8)
        to_rand = selected & (u_branch >= 0.8) & (u_branch < 0.9)
        flat_np = np.asarray(flat.to_pylist(), dtype=object)
        out_flat = flat_np.copy()
        out_flat[to_mask] = mask_token
        if to_rand.any() and n_tok:
            # random replacement from the DOCUMENT's own token multiset —
            # a pure function of (doc, seed), never of the batch
            doc_len = counts[row_idx].astype(np.uint64)
            pick_pos = (
                (u_pick % np.maximum(doc_len, np.uint64(1))).astype(np.int64)
                + np.repeat(offs[:-1], counts)
            )
            out_flat[to_rand] = flat_np[pick_pos[to_rand]]
        rebuilt = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offs.astype("int32")), pa.array(out_flat, pa.string())
            ),
            " ",
        )
        sel_rows = row_idx[selected]  # nondecreasing (row-major flat order)
        sel_pos = pos[selected]
        bounds = np.searchsorted(sel_rows, np.arange(len(b) + 1))
        sel_per_row = [
            sel_pos[bounds[i]:bounds[i + 1]] for i in range(len(b))
        ]
        out = b.copy()
        out[out_col] = rebuilt.to_pandas()
        out[labels_col] = pd.Series(sel_per_row, index=b.index, dtype=object)
        return out

    return ds.map_batches(corrupt, batch_format="pandas")


def t5_span_corrupt(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    corrupt_rate: float = 0.15,
    mean_span_len: int = 3,
    max_span_len: int = 8,
    seed: int = 0,
    input_col: str = "corrupted_text",
    target_col: str = "target_text",
) -> rd.Dataset:
    """T5 span corruption (Raffel et al. 2020 §3.1.4 — the seq2seq
    pretraining objective next to `mlm_mask`): contiguous token spans
    (~``corrupt_rate`` of tokens, geometric lengths around
    ``mean_span_len``, clipped to ``max_span_len``) collapse to
    ``<extra_id_k>`` sentinels in the input; the target is the sentinel
    sequence with the dropped spans spelled out — interleaving the two
    recovers the original exactly (tested).

    Same determinism contract and map-only shape as `mlm_mask`: hashed
    uniform lanes over (id, pos), span COVERAGE resolved with
    ``max_span_len`` shifted vector compares (no per-row Python), both
    texts rebuilt from one ordered flat array."""
    if not (0.0 < corrupt_rate < 1.0):
        raise ValueError("corrupt_rate must be in (0, 1)")
    if not (1 <= mean_span_len <= max_span_len):
        raise ValueError("need 1 <= mean_span_len <= max_span_len")

    p_start = corrupt_rate / mean_span_len

    def corrupt(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(dtype="int64")
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 29)):
            raise ValueError(f"{id_col} must be in [0, 2^29)")
        arr = pa.array(b[text_col].fillna(""), pa.string())
        toks = pc.split_pattern(pc.utf8_lower(arr), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        counts = offs[1:] - offs[:-1]
        n_tok = int(counts.sum())
        row_idx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        pos = np.arange(n_tok, dtype=np.int64) - np.repeat(offs[:-1], counts)
        key = ids[row_idx] * (1 << 34) + pos
        nonempty = (
            pc.greater(pc.binary_length(flat), 0)
            .to_numpy(zero_copy_only=False)
        )
        is_start = (_lane(key, seed, 10) < p_start) & nonempty
        # geometric span length around the mean, clipped
        u_len = _lane(key, seed, 11)
        geom = 1 + np.floor(
            np.log(np.maximum(u_len, 1e-12))
            / np.log(1.0 - 1.0 / mean_span_len)
        ).astype(np.int64)
        span_len = np.minimum(np.maximum(geom, 1), max_span_len)
        # coverage via max_span_len shifted compares (within-doc only)
        covered = np.zeros(n_tok, dtype=bool)
        ends = np.where(is_start, pos + span_len, np.int64(-1))
        for d in range(max_span_len):
            if d >= n_tok:
                break
            sh_end = np.concatenate([np.full(d, -1, dtype=np.int64), ends[: n_tok - d]])
            sh_row = np.concatenate([np.full(d, -1, dtype=np.int64), row_idx[: n_tok - d]])
            covered |= (sh_row == row_idx) & (sh_end > pos)
        # a covered start that is INSIDE an earlier span does not open a
        # new sentinel — true span starts are covered positions whose
        # predecessor (same doc) is uncovered
        prev_cov = np.concatenate([[False], covered[:-1]])
        prev_row = np.concatenate([[-1], row_idx[:-1]])
        span_open = covered & (~prev_cov | (prev_row != row_idx))
        # sentinel ordinal per doc (padded cumsum avoids the empty-doc
        # offs == n_tok out-of-bounds index)
        open_in_doc = np.zeros(n_tok, dtype=np.int64)
        if n_tok:
            cpad = np.concatenate([[0], np.cumsum(span_open.astype(np.int64))])
            doc_base = np.repeat(cpad[offs[:-1]], counts)
            open_in_doc = cpad[1:] - doc_base - 1  # ordinal where span_open
        flat_np = np.asarray(flat.to_pylist(), dtype=object)
        n_sent = 100  # the T5 vocabulary ships 100 sentinels
        if span_open.any() and int(open_in_doc[span_open].max()) >= n_sent:
            raise ValueError(
                "t5_span_corrupt: a document opened more than "
                f"{n_sent} spans — chunk long documents first "
                "(sliding_token_windows / prepare_training_mix)"
            )
        sentinels = np.array(
            [f"<extra_id_{k}>" for k in range(n_sent)], dtype=object
        )
        sent_of = sentinels[np.clip(open_in_doc, 0, n_sent - 1)]
        # INPUT: uncovered tokens keep their text; span-open positions
        # carry the sentinel; other covered positions drop
        in_keep = ~covered | span_open
        in_text = np.where(span_open, sent_of, flat_np)
        kin = in_keep
        k_c = np.concatenate([[0], np.cumsum(kin.astype(np.int64))])
        in_offs = (k_c[offs[1:]] - k_c[offs[0:-1]])
        in_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(in_offs)]).astype("int32")),
            pa.array(in_text[kin], pa.string()),
        )
        inputs = pc.binary_join(in_list, " ")
        # TARGET: at span-open positions emit sentinel THEN the token —
        # two flat streams merged by a stable sort on (flat_idx, phase)
        tgt_keep = covered
        idx_tok = np.flatnonzero(tgt_keep)
        idx_sent = np.flatnonzero(span_open)
        merge_idx = np.concatenate([idx_sent, idx_tok])
        merge_phase = np.concatenate(
            [np.zeros(len(idx_sent), dtype=np.int64),
             np.ones(len(idx_tok), dtype=np.int64)]
        )
        merge_text = np.concatenate(
            [sent_of[idx_sent], flat_np[idx_tok]]
        ) if len(merge_idx) else np.empty(0, dtype=object)
        order = np.lexsort((merge_phase, merge_idx))
        m_idx = merge_idx[order]
        m_text = merge_text[order]
        m_row = row_idx[m_idx] if len(m_idx) else np.empty(0, dtype=np.int64)
        per_row_t = np.bincount(m_row, minlength=len(b)).astype("int64") \
            if len(m_row) else np.zeros(len(b), dtype="int64")
        t_list = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate([[0], np.cumsum(per_row_t)]).astype("int32")
            ),
            pa.array(m_text, pa.string()),
        )
        targets = pc.binary_join(t_list, " ")
        out = b.copy()
        out[input_col] = inputs.to_pandas()
        out[target_col] = targets.to_pandas()
        return out

    return ds.map_batches(corrupt, batch_format="pandas")
