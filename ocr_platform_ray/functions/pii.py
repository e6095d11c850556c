"""Vectorized PII scrubbing (emails, NANP 555 phone numbers, IPv4
addresses) — the pre-training redaction pass every published web-corpus
pipeline runs (C4, RefinedWeb, Dolma) and the reference does not have.

Every rule is ONE RE2 kernel over the whole Arrow column
(`pyarrow.compute.replace_substring_regex` / `count_substring_regex`) —
no per-row Python.  Rules apply SEQUENTIALLY and each rule's count is
taken on the text as the PREVIOUS rules left it, so a match nested
inside an earlier rule's match is neither double-counted nor
phantom-counted ('1.2.3.4@example.com' is one EMAIL, not an email plus
an IP — the email replacement removes the inner IP before the IP rule
runs).  Placeholders contain no digits or '@', so a replacement can
only DELETE later matches it swallowed, never create new ones.
DuckDB's regexp engine is also RE2, so the oracle runs the
byte-identical patterns over the same intermediate texts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textscan import flat_finditer

# (name, RE2 pattern, placeholder) — patterns valid verbatim in DuckDB
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii_column(texts: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Returns (redacted column, total match count per row)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = np.zeros(len(texts), dtype="int64")
    out = texts
    for _, pat, repl in PII_RULES:
        # count on the CURRENT text (prior replacements applied), so a
        # match swallowed by an earlier rule is not counted twice
        n += pc.count_substring_regex(out, pattern=pat).to_numpy(zero_copy_only=False)
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out, n


def redact_pii_batch(
    b: pd.DataFrame, *, text_col: str = "text", out_col: str = "redacted_text"
) -> pd.DataFrame:
    redacted, counts = redact_pii_column(pa.array(b[text_col], pa.string()))
    out = b.copy()
    # positional assignment: a pandas Series would index-ALIGN against
    # b's index and silently NaN-fill on filtered frames
    out[out_col] = redacted.to_numpy(zero_copy_only=False)
    out["n_pii"] = counts
    return out


# ---------------------------------------------------------------------------
# Credit-card redaction (Luhn-validated)
# ---------------------------------------------------------------------------
# Candidate = 13-19 digits with optional single space/dash separators.
# Pure regex replacement would redact order numbers and timestamps; the
# ISO/IEC 7812 Luhn check (public standard) filters candidates to actual
# card-shaped numbers.  RE2-compatible pattern (valid verbatim in DuckDB).
CARD_RE_PATTERN = r"\b\d(?:[ -]?\d){12,18}\b"
_CARD_RE = None  # compiled lazily (pickle-by-value workers)


def luhn_valid(digits: str) -> bool:
    """ISO/IEC 7812 Annex B check: from the right, double every second
    digit, subtract 9 when > 9, total % 10 == 0."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d = d * 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def redact_cards_batch(
    b: pd.DataFrame, *, text_col: str = "text", out_col: str = "redacted_text"
) -> pd.DataFrame:
    """One compiled-regex pass over the batch's concatenated text finds
    candidates (the shared ``functions/textscan`` flat scan); the
    per-MATCH Luhn loop is candidate-sized, not corpus-sized; surgery is
    MATCH-OFFSET-based (a plain str.replace would also rewrite the PAN
    where it occurs as a substring of a longer, unmatched digit run).
    Emits ``n_card_candidates`` / ``n_cards`` per row."""
    import re as _re

    global _CARD_RE
    if _CARD_RE is None:
        _CARD_RE = _re.compile(CARD_RE_PATTERN)
    texts = b[text_col].astype(str).tolist()
    n_cand = np.zeros(len(texts), dtype="int64")
    n_valid = np.zeros(len(texts), dtype="int64")
    # row -> [(start, end)] in ORIGINAL row-relative offsets, match order
    per_row: dict[int, list[tuple[int, int]]] = {}
    for row, m, rstart in flat_finditer(_CARD_RE, texts, "\x00"):
        digits = m.group(0).replace(" ", "").replace("-", "")
        if not (13 <= len(digits) <= 19):
            continue
        n_cand[row] += 1
        if luhn_valid(digits):
            n_valid[row] += 1
            per_row.setdefault(row, []).append((m.start() - rstart, m.end() - rstart))
    out_texts = list(texts)
    for row, spans in per_row.items():
        t = texts[row]
        pieces, last = [], 0
        for s, e in spans:  # finditer order: non-overlapping, ascending
            pieces.append(t[last:s])
            pieces.append("<CARD>")
            last = e
        pieces.append(t[last:])
        out_texts[row] = "".join(pieces)
    out = b.copy()
    out[out_col] = out_texts
    out["n_card_candidates"] = n_cand
    out["n_cards"] = n_valid
    return out
