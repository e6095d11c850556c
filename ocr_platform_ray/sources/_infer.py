"""Shared column-kind inference for the row-framed sinks (TFRecord,
Avro): pandas dtype first, then the first non-null value for object
columns.  One implementation so the two sinks can't silently diverge
(they did: only Avro inspected list elements for str-vs-bytes)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def infer_column_plan(b: pd.DataFrame) -> list[tuple[str, str, bool]]:
    """[(column, kind, is_list)] with kind in int/float/str/bytes, over
    sorted column names.  All-null object columns raise (no kind
    evidence); unsupported value types raise."""
    plan: list[tuple[str, str, bool]] = []
    for col in sorted(b.columns):
        s = b[col]
        if pd.api.types.is_bool_dtype(s) or pd.api.types.is_integer_dtype(s):
            plan.append((col, "int", False))
        elif pd.api.types.is_float_dtype(s):
            plan.append((col, "float", False))
        else:
            nonnull = s[s.notna()] if s.dtype == object else s
            if len(nonnull) == 0:
                raise ValueError(
                    f"column {col!r} has no non-null value in a block — "
                    "no kind evidence (drop it or fill it)"
                )
            v = nonnull.iloc[0]
            if isinstance(v, str):
                plan.append((col, "str", False))
            elif isinstance(v, (bytes, bytearray)):
                plan.append((col, "bytes", False))
            elif isinstance(v, (list, np.ndarray)):
                inner = np.asarray(v)
                if inner.dtype.kind in "iub":
                    plan.append((col, "int", True))
                elif inner.dtype.kind == "f":
                    plan.append((col, "float", True))
                elif len(v) and isinstance(v[0], (bytes, bytearray)):
                    plan.append((col, "bytes", True))
                else:
                    plan.append((col, "str", True))
            else:
                raise ValueError(
                    f"column {col!r} has unsupported value type "
                    f"{type(v).__name__}"
                )
    return plan
