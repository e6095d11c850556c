"""URL canonicalization — the dedup precursor for a Common-Crawl-style
corpus keyed by url (the north rule's input shape): different raw
spellings of one page (scheme/host case, www prefix, default ports,
fragments, tracking params, query order, trailing slashes) must collapse
to one canonical key BEFORE url-level dedup/reassembly.

The transform is deliberately defined in SQL-expressible steps so the
composition is exactly oracle-able (see queries.url_canonical_dedup):

  1. strip the fragment (``#...``)
  2. split off the query at the first ``?``
  3. lowercase the pre-query part (synthetic-corpus simplification:
     real-world paths are case-sensitive — documented limit)
  4. drop a ``www.`` host prefix
  5. drop explicit default ports ``:80`` / ``:443``
  6. strip trailing slashes
  7. drop empty and ``utm_``-prefixed query params, sort the rest
     bytewise, rejoin with ``&``
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data as rd

_FRAG_RE = re.compile(r"#.*$")
_WWW_RE = re.compile(r"^(https?://)www\.")
_PORT_RE = re.compile(r"^(https?://[^/:]+):(443|80)(/|$)")


def canonicalize_url(url: str) -> str:
    base = _FRAG_RE.sub("", url)
    if "?" in base:
        base, q = base.split("?", 1)
    else:
        q = ""
    base = base.lower()
    base = _WWW_RE.sub(r"\1", base)
    base = _PORT_RE.sub(r"\1\3", base)
    base = base.rstrip("/")
    params = sorted(x for x in q.split("&") if x and not x.startswith("utm_"))
    return base + ("?" + "&".join(params) if params else "")


def add_canonical_url(
    ds: rd.Dataset, url_col: str, *, out_col: str = "canonical_url"
) -> rd.Dataset:
    """Append the canonical form of ``url_col``.  Base normalization runs
    as vectorized pandas str kernels; only the per-row query-param sort is
    a Python comprehension (params are few and bounded)."""

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b[url_col].str.replace(_FRAG_RE, "", regex=True)
        split = s.str.split("?", n=1)
        base = split.str[0].str.lower()
        base = base.str.replace(_WWW_RE, r"\1", regex=True)
        base = base.str.replace(_PORT_RE, r"\1\3", regex=True)
        base = base.str.rstrip("/")
        qs = split.str[1].fillna("")
        tails = [
            "?" + "&".join(p) if (p := sorted(x for x in q.split("&") if x and not x.startswith("utm_"))) else ""
            for q in qs
        ]
        out = b.copy()
        out[out_col] = base + pd.Series(tails, index=b.index)
        return out

    return ds.map_batches(canon, batch_format="pandas")
