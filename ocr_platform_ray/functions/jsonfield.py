"""Vectorized JSON scalar-field extraction — the semi-structured
wrangling primitive (event `props`, WARC metadata, API payload columns):
pull ONE top-level scalar field out of a JSON-text column without
per-row Python.

Contract (documented, deliberately narrow): TOP-LEVEL scalar fields of
flat JSON objects whose KEY does not itself appear escaped inside a
string value — the common-crawl/event-telemetry shape.  The extraction
is one RE2 kernel per batch (`pc.extract_regex`), which is how
production WAT/metadata scans actually read these columns (a full JSON
parse per row is the slow path this engine refuses).  Values agree with
SQL ``json_extract`` on that contract — the oracle proves it on real
data.  Nested objects / exotic escapes are out of contract: reach for a
real parser upstream if you have them.

Supported kinds: ``int`` (optionally-signed integers), ``float``
(int/float/exponent), ``str`` (no escaped quotes inside the value),
``bool``.  A missing key / null JSON yields NULL.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_VALUE_PATTERNS = {
    # int matches the FULL numeric token (float syntax) and casts to
    # int64 afterwards, so "k": 12.5 under kind="int" raises loudly
    # instead of silently truncating at the decimal point
    "int": r"(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)",
    "float": r"(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)",
    "str": r'"(?P<v>[^"\\]*)"',
    "bool": r"(?P<v>true|false)",
}

_PA_OUT = {
    "int": pa.int64(),
    "float": pa.float64(),
    "str": pa.string(),
    "bool": pa.bool_(),
}


def _field_pattern(key: str, kind: str) -> str:
    if kind not in _VALUE_PATTERNS:
        raise ValueError(f"kind must be one of {sorted(_VALUE_PATTERNS)}")
    if '"' in key or "\\" in key:
        raise ValueError("key must not contain quotes or backslashes")
    import re as _re

    return '"' + _re.escape(key) + r'"\s*:\s*' + _VALUE_PATTERNS[kind]


def json_scalar_field(
    ds: rd.Dataset,
    json_col: str,
    key: str,
    *,
    kind: str = "str",
    out_col: str | None = None,
) -> rd.Dataset:
    """Add ``out_col`` (default the key name) holding the typed value of
    top-level ``key`` in ``json_col``.  Map-only; one RE2 kernel per
    batch; missing key / NULL json → NULL."""
    pattern = _field_pattern(key, kind)
    out_name = out_col or key
    out_type = _PA_OUT[kind]

    def extract(batch: pa.Table) -> pa.Table:
        col = batch.column(json_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(pc.fill_null(col, ""), pattern=pattern)
        vals = pc.if_else(
            pc.is_valid(st), st.field("v"), pa.nulls(len(col), pa.string())
        )
        if kind == "bool":
            typed = pc.equal(vals, "true")
        elif kind == "str":
            typed = vals
        else:
            typed = pc.cast(vals, out_type)
        return batch.append_column(out_name, typed)

    return ds.map_batches(extract, batch_format="pyarrow")
