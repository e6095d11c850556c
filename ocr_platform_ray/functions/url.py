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

import numpy as np
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


# RefinedWeb-style URL filtering (Penedo et al. 2023 arXiv:2306.01116
# §3.1.2 / App. G.1: a domain blocklist plus a soft word-score over the
# URL string).  Weights are INTEGERS (the paper's fractional weights
# scaled x100) so the score sum is exact integer arithmetic on any
# engine — fully SQL-mirrorable.  Occurrence counting is non-overlapping
# substring count over the lowercased URL (pandas str.count == the SQL
# (len - len(replace))/len(word) identity).
DEFAULT_URL_BLOCKLIST = frozenset({"freebet-casino.com", "spam-mall.net"})
DEFAULT_URL_WORD_WEIGHTS = {
    "casino": 50,
    "webcam": 50,
    "torrent": 40,
    "sex": 60,
    "free": 25,
    "download": 25,
}

_HOST_RE = re.compile(r"^https?://([^/:?#]+)")


def add_url_quality(
    ds: rd.Dataset,
    url_col: str,
    *,
    blocklist: frozenset[str] | set[str] = DEFAULT_URL_BLOCKLIST,
    word_weights: dict[str, int] | None = None,
    score_col: str = "url_score",
    blocked_col: str = "url_blocked",
) -> rd.Dataset:
    """Append the soft banned-word score (integer; sum over words of
    weight x non-overlapping occurrences in the lowercased URL) and the
    domain-blocklist flag (host with any ``www.`` prefix stripped,
    matched exactly or as a suffix domain).  MAP-ONLY: the blocklist and
    weight table are dim-sized closure state; each word is ONE vectorized
    ``str.count`` kernel per batch, never a per-row Python loop."""
    ww = DEFAULT_URL_WORD_WEIGHTS if word_weights is None else word_weights
    bl = frozenset(blocklist)
    suffixes = tuple("." + d for d in sorted(bl))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        lu = b[url_col].str.lower()
        total = np.zeros(len(b), dtype="int64")
        for w, wt in ww.items():
            total += lu.str.count(re.escape(w)).to_numpy(dtype="int64") * wt
        host = lu.str.extract(_HOST_RE, expand=False).fillna("")
        host = host.str.replace(r"^www\.", "", regex=True)
        blocked = host.isin(bl).to_numpy()
        if suffixes:
            blocked |= host.str.endswith(suffixes).to_numpy()
        out[score_col] = total
        out[blocked_col] = blocked
        return out

    return ds.map_batches(score, batch_format="pandas")


def url_quality_filter(
    ds: rd.Dataset,
    url_col: str,
    *,
    threshold: int = 100,
    blocklist: frozenset[str] | set[str] = DEFAULT_URL_BLOCKLIST,
    word_weights: dict[str, int] | None = None,
    score_col: str = "url_score",
) -> rd.Dataset:
    """Keep rows whose URL is not domain-blocklisted and whose soft
    word score stays BELOW ``threshold`` (RefinedWeb drops at the
    threshold).  The score column is kept for downstream audit; the
    blocklist flag is dropped (it is always False on kept rows)."""
    scored = add_url_quality(
        ds, url_col, blocklist=blocklist, word_weights=word_weights,
        score_col=score_col, blocked_col="__blocked",
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        k = b[(~b["__blocked"]) & (b[score_col] < threshold)]
        return k.drop(columns="__blocked")

    return scored.map_batches(keep, batch_format="pandas")
