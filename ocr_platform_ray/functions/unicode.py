"""Unicode text repair: canonical normalization and mojibake recovery —
the cleanup pass every web-crawl corpus needs before dedup/tokenization
(mixed NFC/NFD spellings of the same word defeat exact dedup and split
token statistics; mis-decoded UTF-8 ("cafÃ©") poisons language ID).

Reference parity: the reference normalizes titles/names before matching
(``apps/web/src/lib/slug.ts``, the fuzzy matcher's strip-diacritics in
``functions/score.py``'s source); this is the corpus-scale generalization
using the standard algorithms (UAX #15 normalization forms; the
encode-roundtrip mojibake heuristic popularized by the public ftfy
library's "fix encoding" pass — implemented from the principle, not the
library).

Scale shape: MAP-ONLY, no state.
* Normalization uses CPython's ``unicodedata`` (UCD-exact): per batch a
  ``unicodedata.is_normalized`` scan (a C-level quick-check that answers
  YES for the overwhelmingly-common already-normalized row without
  allocating) selects the rows that actually re-normalize.  The Arrow
  ``utf8_normalize`` kernel is deliberately NOT used: on the pinned
  pyarrow (16.1) its NFC/NFKC forms fail to recompose (composed input
  comes back decomposed — verified by probe; DuckDB and CPython agree
  with UAX #15, Arrow disagrees).
* Mojibake repair is two-phase: a vectorized detector (one compiled-regex
  pass for UTF-8-as-latin1 lead-byte signatures — Ã/Â/â/Å… followed by a
  continuation-range char) selects the rare affected rows; only those go
  through the per-row encode-roundtrip (cp1252 with a latin-1 fallback
  for its five unmapped byte slots, then strict utf-8 decode — a failed
  roundtrip leaves the row untouched).  Clean corpora pay only the regex
  scan.
"""

from __future__ import annotations

import codecs
import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# UTF-8 multibyte lead bytes read as latin-1/cp1252: U+00C2-U+00C5 (Â Ã Ä Å),
# U+00E2 (â), U+00C6/U+00D0... — keep to the high-precision core: the lead
# char followed by a typical continuation char (latin-1 0x80-0xBF range or
# the cp1252 remappings of those bytes).
_CONT = (
    "-¿€‚ƒ„…†‡ˆ‰"
    "Š‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
MOJIBAKE_RE = re.compile(f"[Â-ÅâÃ][{_CONT}]")


def unicode_normalize(
    ds: rd.Dataset, col: str, *, form: str = "NFC", out_col: str | None = None
) -> rd.Dataset:
    """Apply a UAX #15 normalization form to a string column (in place by
    default).  ``is_normalized`` quick-check per row (C call, no
    allocation), ``normalize`` only on the rows that need it."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    target = out_col or col

    def norm(t: pa.Table) -> pa.Table:
        # pyarrow-native: only the string column is touched — a pandas
        # round-trip would also convert unrelated list/tensor columns
        # (null-bearing page_numbers blocks fail that conversion)
        vals = t.column(col).to_pylist()
        out = [
            v
            if v is None or unicodedata.is_normalized(form, v)
            else unicodedata.normalize(form, v)
            for v in vals
        ]
        arr = pa.array(out, pa.string())
        if target in t.column_names:
            return t.set_column(t.column_names.index(target), target, arr)
        return t.append_column(target, arr)

    return ds.map_batches(norm, batch_format="pyarrow")


def _cp1252_latin1_fallback(exc: UnicodeError):
    """cp1252 leaves five byte slots unmapped (0x81 0x8D 0x8F 0x90 0x9D);
    real mojibake carries them as the raw C1 control chars.  Encode those
    back to their byte value (the latin-1 identity) — any char > 0xFF
    means the text never was a mis-decoded byte stream, so re-raise."""
    if isinstance(exc, UnicodeEncodeError):
        chunk = exc.object[exc.start : exc.end]
        if all(ord(c) <= 0xFF for c in chunk):
            return bytes(ord(c) for c in chunk), exc.end
    raise exc


def _ensure_handler() -> None:
    """Idempotent error-handler registration, called at use time: the
    package ships pickle-by-value, so module-top side effects do NOT
    replay on workers — only function bodies do (same reason the module
    avoids lazy relative imports)."""
    try:
        codecs.lookup_error("ocr_ray_latin1_fallback")
    except LookupError:
        codecs.register_error("ocr_ray_latin1_fallback", _cp1252_latin1_fallback)


def _repair_one(s: str) -> str:
    """Encode-roundtrip repair, up to 3 passes (double-encoded input needs
    two).  Any failure leaves the input unchanged — never lossy."""
    _ensure_handler()
    cur = s
    for _ in range(3):
        if not MOJIBAKE_RE.search(cur):
            break
        try:
            raw = cur.encode("cp1252", errors="ocr_ray_latin1_fallback")
            fixed = raw.decode("utf-8")
        except UnicodeError:
            break
        if fixed == cur:
            break
        cur = fixed
    return cur


def fix_mojibake(
    ds: rd.Dataset, col: str, *, out_col: str | None = None, flag_col: str | None = None
) -> rd.Dataset:
    """Repair UTF-8-decoded-as-latin1/cp1252 text.  Detection is one
    vectorized regex pass; repair touches only flagged rows.  With
    ``flag_col``, a boolean column records which rows were modified."""
    target = out_col or col

    def fix(t: pa.Table) -> pa.Table:
        src = t.column(col)
        # ONE vectorized RE2 detection kernel; clean batches short-circuit
        hits = pc.fill_null(
            pc.match_substring_regex(src, pattern=MOJIBAKE_RE.pattern), False
        ).to_pylist()
        if not any(hits):
            out = t
            if target not in t.column_names:
                out = out.append_column(target, src)
            elif target != col:
                out = out.set_column(out.column_names.index(target), target, src)
            if flag_col is not None:
                out = out.append_column(
                    flag_col, pa.array([False] * len(t), pa.bool_())
                )
            return out
        vals = src.to_pylist()
        changed = [False] * len(vals)
        for i, (v, h) in enumerate(zip(vals, hits)):
            if h and v is not None:
                r = _repair_one(v)
                if r != v:
                    vals[i] = r
                    changed[i] = True
        arr = pa.array(vals, pa.string())
        if target in t.column_names:
            out = t.set_column(t.column_names.index(target), target, arr)
        else:
            out = t.append_column(target, arr)
        if flag_col is not None:
            out = out.append_column(flag_col, pa.array(changed, pa.bool_()))
        return out

    return ds.map_batches(fix, batch_format="pyarrow")


def fold_diacritics(s: "pd.Series") -> "pd.Series":
    """Accent folding: NFD-decompose and drop combining marks (category
    Mn) — the search-normalization fold (café→cafe, Ångström→Angstrom)
    that deliberately does NOT transliterate base letters (ł, ß and
    ligatures survive, exactly DuckDB's ``strip_accents`` — probe-
    verified equal, which makes it SQL-oracle-able).

    Vectorized via the flat-string rule: the batch joins on NUL (NFD
    can't produce or consume it), normalizes in ONE C call, drops Mn
    codepoints with a unique-codepoint category LUT over the utf-32
    view, and splits back."""
    import numpy as np
    import pandas as pd
    import unicodedata

    vals = s.fillna("").astype(str).tolist()
    flat = "\x00".join(vals)
    nfd = unicodedata.normalize("NFD", flat)
    arr = np.frombuffer(nfd.encode("utf-32-le"), dtype="uint32")
    uq = np.unique(arr)
    keep_lut = np.array(
        [unicodedata.category(chr(int(c))) != "Mn" for c in uq], dtype=bool
    )
    keep = keep_lut[np.searchsorted(uq, arr)]
    out = arr[keep].tobytes().decode("utf-32-le")
    folded = out.split("\x00")
    return pd.Series(folded, index=s.index, dtype=object)
