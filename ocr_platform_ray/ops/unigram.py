"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model): the second of the two standard subword
tokenizers, completing the lifecycle next to BPE (`ops/bpe_train.py`).

Scale shape — identical to the BPE trainer, and that is the point: the
corpus-scale part of unigram training is exactly ONE aggregation, the
word-frequency histogram (`ops/bpe_train.word_histogram`: map-side
Counter partials -> size-aware ``auto_group_agg`` finish, with the
standard min_count / max_words prunes bounding the driver working set).
Everything after — seed-vocab enumeration, EM over the lattice, loss
pruning — touches only the (word, count) histogram, never the corpus.

Algorithm (per the paper, with the documented simplifications):
  1. SEED: every substring of every histogram word up to
     ``max_piece_len`` chars, scored by corpus frequency; the top
     ``seed_size`` multi-char substrings plus ALL single characters
     (single chars are never pruned — they guarantee every word stays
     segmentable, the paper's "character coverage" floor).
  2. EM: the E-step computes EXPECTED piece counts with the full
     forward-backward marginals over each word's segmentation lattice
     (soft EM, not Viterbi counts); the M-step is maximum-likelihood
     re-normalization.  Exact in log space.
  3. PRUNE: after each round of ``n_sub_iters`` EM steps, the
     lowest-expected-count multi-char pieces are dropped so the vocab
     shrinks by ``shrink`` (never below ``vocab_size``), then EM
     re-runs; expected count is the paper's loss-delta proxy (the
     full alternative-segmentation loss is a noted simplification).
  4. ENCODE: Viterbi segmentation (max total log-prob; deterministic
     tie-break prefers the longer final piece) — map-only against the
     broadcast piece table, the `functions/bpe.py` actor pattern.

Determinism: the histogram is an exact integer sum; seeding, EM and
pruning order ties by (score desc, piece asc); so the trained vocab is
a pure function of the corpus — block-structure independent, and
``unigram_train_distributed == unigram_train`` (serial) exactly when
the histogram prunes are off (equivalence-tested)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import ray.data as rd

from ..functions.bpe import pretokenize
from .bpe_train import word_histogram

_UNK_PENALTY = 16.0  # nats below the worst in-vocab piece for unknown chars


def _seed_vocab(
    hist: pd.DataFrame, *, max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Candidate pieces: substring corpus frequencies from the histogram
    (count of the word times occurrences in the word).  All single chars
    kept unconditionally; multi-char candidates cut to the top
    ``seed_size`` by (frequency desc, piece asc)."""
    sub: Counter = Counter()
    chars: Counter = Counter()
    for w, n in zip(hist["word"], hist["n"]):
        n = int(n)
        L = len(w)
        for i in range(L):
            chars[w[i]] += n
            for j in range(i + 2, min(i + max_piece_len, L) + 1):
                sub[w[i:j]] += n
    top = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    counts = dict(chars)
    counts.update(top)
    total = sum(counts.values())
    logt = math.log(total)
    return {p: math.log(c) - logt for p, c in counts.items()}


def _em_step(
    words: list[str],
    counts: list[int],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One full E-step over the histogram: forward-backward marginals per
    word lattice, returning expected piece counts and the data log-lik."""
    exp: dict[str, float] = {}
    loglik = 0.0
    NEG = -1e30
    for w, n in zip(words, counts):
        L = len(w)
        # matches[i] = list of (j, piece, lp) for pieces ending at i
        alpha = [NEG] * (L + 1)
        alpha[0] = 0.0
        ends: list[list[tuple[int, str, float]]] = [[] for _ in range(L + 1)]
        for i in range(1, L + 1):
            for j in range(max(0, i - max_piece_len), i):
                piece = w[j:i]
                lp = logp.get(piece)
                if lp is None:
                    continue
                ends[i].append((j, piece, lp))
                a = alpha[j] + lp
                if alpha[i] == NEG:
                    alpha[i] = a
                else:
                    m = max(alpha[i], a)
                    alpha[i] = m + math.log(
                        math.exp(alpha[i] - m) + math.exp(a - m)
                    )
        if alpha[L] <= NEG:  # unsegmentable (chars missing) — skip
            continue
        beta = [NEG] * (L + 1)
        beta[L] = 0.0
        for i in range(L, 0, -1):
            if beta[i] == NEG:
                continue
            for j, piece, lp in ends[i]:
                b = beta[i] + lp
                if beta[j] == NEG:
                    beta[j] = b
                else:
                    m = max(beta[j], b)
                    beta[j] = m + math.log(math.exp(beta[j] - m) + math.exp(b - m))
        z = alpha[L]
        loglik += n * z
        for i in range(1, L + 1):
            for j, piece, lp in ends[i]:
                post = alpha[j] + lp + beta[i] - z
                if post > -40.0:  # exp underflow guard
                    exp[piece] = exp.get(piece, 0.0) + n * math.exp(post)
    return exp, loglik


def _train_from_histogram(
    hist: pd.DataFrame,
    *,
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    n_sub_iters: int,
    shrink: float,
) -> dict[str, float]:
    """The driver-side trainer shared by the serial and distributed
    entry points (the `merge_loop` pattern of ops/bpe_train.py)."""
    if len(hist) == 0:
        return {}
    words = [str(w) for w in hist["word"]]
    counts = [int(n) for n in hist["n"]]
    logp = _seed_vocab(hist, max_piece_len=max_piece_len, seed_size=seed_size)

    def em_rounds(lp: dict[str, float]) -> tuple[dict[str, float], dict[str, float]]:
        exp: dict[str, float] = {}
        for _ in range(n_sub_iters):
            exp, _ll = _em_step(words, counts, lp, max_piece_len)
            total = sum(exp.values())
            if total <= 0.0:
                break
            logt = math.log(total)
            floor = min(exp.values())
            lp = {p: math.log(c) - logt for p, c in exp.items() if c > 0.0}
            # single chars must survive even at ~zero expectation
            for p in list(logp):
                if len(p) == 1 and p not in lp:
                    lp[p] = math.log(max(floor, 1e-12)) - logt
        return lp, exp

    logp, exp = em_rounds(logp)
    n_chars = sum(1 for p in logp if len(p) == 1)
    target = max(vocab_size, n_chars)
    while len(logp) > target:
        keep_multi = max(int(len(logp) * shrink), target) - n_chars
        multi = [p for p in logp if len(p) > 1]
        # prune by expected-count contribution, ties by piece
        multi.sort(key=lambda p: (-exp.get(p, 0.0), p))
        kept = set(multi[: max(keep_multi, 0)])
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in kept}
        logp, exp = em_rounds(logp)
    # final renormalize over the surviving vocab
    m = max(logp.values())
    total = sum(math.exp(lp - m) for lp in logp.values())
    logz = m + math.log(total)
    return {p: lp - logz for p, lp in sorted(logp.items())}


def unigram_train(
    texts: list[str],
    *,
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    n_sub_iters: int = 2,
    shrink: float = 0.75,
) -> dict[str, float]:
    """Serial reference trainer (the `train_bpe` analogue): histogram the
    texts locally, then the shared EM/prune loop."""
    c: Counter = Counter()
    for t in texts:
        for w in pretokenize(str(t).lower()):
            c[w] += 1
    hist = pd.DataFrame(
        {"word": list(c.keys()), "n": pd.Series(list(c.values()), dtype="int64")}
    ).sort_values(["n", "word"], ascending=[False, True]).reset_index(drop=True)
    return _train_from_histogram(
        hist,
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        n_sub_iters=n_sub_iters,
        shrink=shrink,
    )


def unigram_train_distributed(
    ds: rd.Dataset,
    col: str = "text",
    *,
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    n_sub_iters: int = 2,
    shrink: float = 0.75,
    min_count: int = 1,
    max_words: int | None = None,
    driver_threshold_rows: int = 2_000_000,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocab from a Dataset.  One corpus pass
    (the word histogram); with the prunes off this equals
    ``unigram_train`` on the same texts exactly."""
    hist = word_histogram(
        ds,
        col,
        min_count=min_count,
        max_words=max_words,
        driver_threshold_rows=driver_threshold_rows,
    )
    return _train_from_histogram(
        hist,
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        n_sub_iters=n_sub_iters,
        shrink=shrink,
    )


class UnigramTokenizer:
    """Viterbi encoder over a trained piece table (the actor-state
    pattern of ``functions/bpe.BpeTokenizer``): max-log-prob segmentation
    per word, deterministic tie-break = the longer final piece (smaller
    split point wins on equal score).  Characters outside the vocab
    encode as single-char pieces at a fixed penalty below the worst
    in-vocab piece, so any input segments."""

    def __init__(self, logp: dict[str, float], max_piece_len: int = 8):
        self.logp = dict(logp)
        self.max_piece_len = max_piece_len
        self.unk = (min(logp.values()) if logp else 0.0) - _UNK_PENALTY
        self._cache: dict[str, list[str]] = {}

    def encode_word(self, word: str) -> list[str]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        L = len(word)
        NEG = -1e30
        best = [NEG] * (L + 1)
        back = [0] * (L + 1)
        best[0] = 0.0
        for i in range(1, L + 1):
            for j in range(max(0, i - self.max_piece_len), i):
                if best[j] == NEG:
                    continue
                piece = word[j:i]
                lp = self.logp.get(piece)
                if lp is None:
                    if i - j > 1:
                        continue
                    lp = self.unk
                s = best[j] + lp
                # strict >: the FIRST j (longest piece ending at i) wins ties
                if s > best[i]:
                    best[i] = s
                    back[i] = j
        out: list[str] = []
        i = L
        while i > 0:
            j = back[i]
            out.append(word[j:i])
            i = j
        out.reverse()
        if len(self._cache) < 65536:
            self._cache[word] = out
        return out

    def encode(self, text: str) -> list[str]:
        toks: list[str] = []
        for w in pretokenize(str(text).lower()):
            toks.extend(self.encode_word(w))
        return toks

    def count(self, text: str) -> int:
        return sum(len(self.encode_word(w)) for w in pretokenize(str(text).lower()))
