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
