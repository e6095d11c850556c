"""Fuzzy string match scorer (M17, apps/web/src/lib/command-score.ts:1-172).

A continuous-subsequence scorer in the command-score family: each matched
query char contributes a penalty-weighted score depending on how it
continues the previous match — exact continuation, word-boundary jump, gap,
case mismatch, or transposition.  Implemented from the published semantics
(MIT-licensed superhuman/command-score), not transcribed.
"""

from __future__ import annotations

from functools import lru_cache

SCORE_CONTINUE = 1.0
SCORE_SPACE_JUMP = 0.9
SCORE_BOUNDARY_JUMP = 0.8
SCORE_CHAR_JUMP = 0.17
SCORE_TRANSPOSITION = 0.1
PENALTY_CASE = 0.9999
PENALTY_GAP = 0.999

_BOUNDARY = set(" /-_+.#\"'")


def command_score(target: str, query: str) -> float:
    """Score in [0, 1]; 0 = query is not a subsequence of target."""
    t_low, q_low = target.lower(), query.lower()

    @lru_cache(maxsize=None)
    def rec(ti: int, qi: int) -> float:
        if qi == len(query):
            return SCORE_CONTINUE
        best = 0.0
        i = t_low.find(q_low[qi], ti)
        while i != -1:
            # base jump score for matching query[qi] at target[i]
            if i == ti:
                jump = SCORE_CONTINUE
            elif i > 0 and target[i - 1] in _BOUNDARY:
                jump = SCORE_SPACE_JUMP if target[i - 1] == " " else SCORE_BOUNDARY_JUMP
            elif i > 0 and target[i - 1].islower() and target[i].isupper():
                jump = SCORE_BOUNDARY_JUMP  # camelCase boundary
            else:
                jump = SCORE_CHAR_JUMP
            if target[i] != query[qi]:
                jump *= PENALTY_CASE
            gap_penalty = PENALTY_GAP ** max(0, i - ti)
            score = jump * gap_penalty * rec(i + 1, qi + 1)
            # transposition: swap query[qi], query[qi+1]
            if qi + 1 < len(query) and q_low[qi + 1] == t_low[i] and q_low[qi] != q_low[qi + 1]:
                if i + 1 < len(target) and t_low[i + 1] == q_low[qi]:
                    score = max(score, SCORE_TRANSPOSITION * gap_penalty * rec(i + 2, qi + 2))
            best = max(best, score)
            i = t_low.find(q_low[qi], i + 1)
        return best

    if not query:
        return SCORE_CONTINUE
    return rec(0, 0)


def jaro_similarity(a: str, b: str) -> float:
    """Jaro similarity (Jaro 1989) — the record-linkage string metric
    under `ops/linkage.py`'s agreement patterns: match window
    floor(max/2)−1, transpositions counted over matched order, the
    classic (m/|a| + m/|b| + (m−t)/m)/3."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_taken = [False] * lb
    a_match = []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_taken[j] and b[j] == ca:
                b_taken[j] = True
                a_match.append(ca)
                break
    m = len(a_match)
    if m == 0:
        return 0.0
    b_match = [b[j] for j in range(lb) if b_taken[j]]
    t = sum(1 for x, y in zip(a_match, b_match) if x != y) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, *, prefix_weight: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Jaro–Winkler (Winkler 1990): the Jaro score boosted by the
    common prefix (≤ 4 chars, weight 0.1) when it exceeds the 0.7
    boost threshold — the US-Census name-matching convention DuckDB's
    ``jaro_winkler_similarity`` implements, used as the oracle."""
    j = jaro_similarity(a, b)
    if j <= boost_threshold:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * prefix_weight * (1.0 - j)


def jaro_winkler_batch(a, b) -> "np.ndarray":
    """Vectorized wrapper over candidate-pair arrays (pairs are
    blocking-bounded and dim-sized by the fuzzy/linkage contract; the
    per-pair scan is O(len·window) python like the reference scorer)."""
    import numpy as np

    out = np.empty(len(a), dtype="float64")
    for i, (x, y) in enumerate(zip(a, b)):
        out[i] = jaro_winkler(
            x if isinstance(x, str) else "", y if isinstance(y, str) else ""
        )
    return out
