"""Distributed BPE-merge training (Sennrich et al. 2016).

The corpus-scale part of BPE training is exactly ONE aggregation: the
word-frequency histogram.  The merge iteration itself only ever touches
that histogram (never the corpus), and every production tokenizer
trainer prunes it (min count / max vocab) before iterating — so the
scale shape here is:

  map_batches      per-batch word Counter -> (word, n) partial rows
                   (pre-aggregated map-side; a batch emits at most its
                   distinct-word count, not its token count)
  auto_group_agg   size-aware finish — one vectorized driver groupby
                   below the probe threshold, hash-shard exchange above
  prune            min_count filter map-side; max_words via the local
                   top-N prune pattern (each block emits its own top-N,
                   the driver finishes over <= n_blocks * N candidates)
  merge_loop       driver-side over the pruned histogram (functions/
                   bpe.py::merge_loop — shared with the serial trainer,
                   so distributed == serial exactly when unpruned)

Reference parity: the reference commits a fixed tokenizer; this engine
already applies a committed merge table (`functions/bpe.py`).  This op
adds the *training* half so the full tokenizer lifecycle (train ->
commit -> encode) runs on the engine.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import ray.data as rd

from ..functions.bpe import _EOW, merge_loop, pretokenize
from .relational import auto_group_agg, probe_head


def _word_count_partials(col: str):
    def part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"word": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            )
        c: Counter = Counter()
        for t in b[col]:
            for w in pretokenize(str(t).lower()):
                c[w] += 1
        return pd.DataFrame(
            {"word": list(c.keys()), "n": pd.Series(list(c.values()), dtype="int64")}
        )

    return part


def word_histogram(
    ds: rd.Dataset,
    col: str = "text",
    *,
    min_count: int = 1,
    max_words: int | None = None,
    driver_threshold_rows: int = 2_000_000,
) -> pd.DataFrame:
    """Exact corpus word-frequency histogram, pruned to the trainer's
    working set.  Deterministic: counts are exact integer sums; the
    ``max_words`` cut orders by (count desc, word asc), so the result is
    a pure function of the corpus regardless of block structure."""
    partials = ds.map_batches(_word_count_partials(col), batch_format="pandas")
    hist = auto_group_agg(
        partials,
        ["word"],
        {"n": ("n", "sum")},
        driver_threshold_rows=driver_threshold_rows,
    )
    if isinstance(hist, rd.Dataset):
        if min_count > 1:
            hist = hist.map_batches(
                lambda b: b[b["n"] >= min_count], batch_format="pandas"
            )
        if max_words is not None:
            # local top-N prune: a word outside its own block's top-N
            # cannot be in the global top-N (the histogram has one row
            # per word after the group agg)
            hist = hist.map_batches(
                lambda b: b.sort_values(["n", "word"], ascending=[False, True]).head(
                    max_words
                ),
                batch_format="pandas",
            )
            df = hist.to_pandas()
        else:
            head = probe_head(hist, driver_threshold_rows)
            df = head if head is not None else hist.to_pandas()
    else:
        df = hist
    if len(df) == 0:
        return pd.DataFrame(
            {"word": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
        )
    df = df[df["n"] >= min_count]
    df = df.sort_values(["n", "word"], ascending=[False, True]).reset_index(drop=True)
    if max_words is not None:
        df = df.head(max_words)
    return df


def bpe_train_distributed(
    ds: rd.Dataset,
    col: str = "text",
    *,
    n_merges: int = 500,
    min_count: int = 1,
    max_words: int | None = None,
    driver_threshold_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a Dataset.  With ``min_count=1`` and
    ``max_words=None`` this equals ``functions.bpe.train_bpe`` on the
    same texts exactly (equivalence-tested); the prunes are the
    standard trainer knobs that bound the driver-side histogram at
    corpus scale."""
    df = word_histogram(
        ds,
        col,
        min_count=min_count,
        max_words=max_words,
        driver_threshold_rows=driver_threshold_rows,
    )
    vocab: Counter = Counter(
        {tuple(w) + (_EOW,): int(n) for w, n in zip(df["word"], df["n"])}
    )
    return merge_loop(vocab, n_merges)
