"""American Soundex phonetic keys (NARA standard; Russell & Odell's
1918 patent family) — the classic blocking function for probabilistic
record linkage (`ops/linkage.py`): names that sound alike share a
4-char key (ROBERT and RUPERT → R163), so candidate generation can
block on the key instead of comparing all pairs.

The coding is expressed as a fixed translate + regexp chain (uppercase
strip → drop non-leading H/W (transparent letters: ASHCRAFT → A261) →
letter→digit translate with vowels → 0 → collapse adjacent equal codes
→ drop the leading code → drop zeros → pad/truncate to 3 digits behind
the first LETTER).  The exact same chain is SQL-expressible
(``translate`` + ``regexp_replace``), so the engine and a DuckDB oracle
produce identical keys by construction."""

from __future__ import annotations

import re

import pandas as pd

_TRANS = str.maketrans(
    "AEIOUYBFPVCGJKQSXZDTLMNR", "000000111122222222334556"
)
_NON_ALPHA = re.compile(r"[^A-Za-z]")
_HW_TAIL = re.compile(r"[HW]")
_RUNS = re.compile(r"(.)\1+")


def soundex(name: str) -> str:
    """4-char American Soundex key ('' for a letterless input)."""
    up = _NON_ALPHA.sub("", name or "").upper()
    if not up:
        return ""
    t = up[0] + _HW_TAIL.sub("", up[1:])
    coded = t.translate(_TRANS)
    collapsed = _RUNS.sub(r"\1", coded)
    tail = collapsed[1:].replace("0", "")
    return up[0] + (tail + "000")[:3]


def soundex_batch(s: pd.Series) -> pd.Series:
    """Vectorized-chain Soundex over a string Series: every step is one
    pandas C string kernel over the whole column (upper / regex strip /
    translate / regex collapse) — no per-row Python."""
    up = (
        s.fillna("")
        .astype(str)
        .str.replace(_NON_ALPHA, "", regex=True)
        .str.upper()
    )
    first = up.str[0].fillna("")
    rest = up.str[1:].str.replace("[HW]", "", regex=True)
    t = first + rest
    coded = t.str.translate(_TRANS)
    collapsed = coded.str.replace(r"(.)\1+", r"\1", regex=True)
    tail = collapsed.str[1:].str.replace("0", "", regex=False)
    out = first + (tail + "000").str[:3]
    return out.where(up != "", "")
