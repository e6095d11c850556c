"""Shared batch-flattening regex scan: ONE compiled-regex pass over a
batch's concatenated texts with vectorized row attribution (the
``_shingle_hashes_batch`` rule — no per-row re loop).  Used by the link
extractor (``ops/graph.py``) and the card redactor (``functions/pii.py``)
so the separator handling and offset arithmetic live in one place."""

from __future__ import annotations

import re

import numpy as np


def row_starts(texts: list[str], sep_len: int) -> np.ndarray:
    """Flat-string start offset of each row."""
    starts = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        starts[1:] = np.cumsum(lens[:-1] + sep_len)
    return starts


def flat_finditer(rx: "re.Pattern", texts: list[str], sep: str):
    """Yield ``(row_idx, match, row_start)`` for every match of ``rx``
    over ``sep.join(texts)``.  Callers pick a separator the pattern
    cannot cross (quote-closing for href scans, NUL for digit scans);
    ``match.start() - row_start`` is the row-relative offset."""
    flat = sep.join(texts)
    starts = row_starts(texts, len(sep))
    for m in rx.finditer(flat):
        row = int(np.searchsorted(starts, m.start(), side="right") - 1)
        yield row, m, int(starts[row])


def flat_tokens_nonempty(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat lowered tokens, per-token row index) under THE corpus
    tokenization rule (lower, split on single spaces, empties dropped —
    the PMI/BM25 renumbered-adjacency contract every SQL oracle
    mirrors).  One Arrow pass; the ONE copy of this flatten — the
    eval n-gram builder, the zipf/heaps corpus-law fits and ad-hoc
    query scans all consume it, so a tokenization change cannot split
    the engines."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    toks = pc.split_pattern(
        pc.utf8_lower(pa.array(pd.Series(texts).fillna(""), pa.string())),
        pattern=" ",
    )
    flat = np.asarray(toks.flatten(), dtype=object)
    lens = np.asarray(pc.list_value_length(toks), dtype="int64")
    doc_of = np.repeat(np.arange(len(lens), dtype="int64"), lens)
    keep = flat != ""
    return flat[keep], doc_of[keep]
