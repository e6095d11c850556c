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
