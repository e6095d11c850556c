"""Dataset card — the "datasheets for datasets" practice (Gebru et al.
2018, arXiv:1803.09010) as an engine surface: ONE call that assembles
the release-note facts a corpus consumer asks first — size, per-column
profile, token volume, language mix, exact-duplicate rate — from the
already-tested operators, as a JSON-serializable dict.

Scale shape: every ingredient is its operator's documented shape
(`dataset_profile` zero-exchange partials; token/lang counts one
combiner reduce; the dup rate ONE (hash → count) reduce over content
hashes — ids only through the exchange).  Nothing corpus-sized lands on
the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .profile import dataset_profile
from .relational import auto_group_agg


def dataset_card(
    ds: rd.Dataset,
    *,
    text_col: str | None = "text",
    lang_col: str | None = "lang",
    profile_cols: list[str] | None = None,
    corpus_laws: bool = False,
    id_col: str | None = None,
    n_shards: int = 64,
) -> dict:
    """Assemble the card: ``{n_rows, columns: [profile rows], n_tokens,
    languages: {lang: rows}, dup_rate, n_distinct_texts}``.  ``text_col``
    / ``lang_col`` = None skip those sections (non-text tables).

    ``corpus_laws=True`` adds the statistical-health section: the Zipf
    rank-frequency slope/r² (`ops/textstats.zipf_fit` — natural text
    tracks slope ≈ −1) and, when ``id_col`` names an integer document
    id, the Heaps vocabulary-growth exponent
    (`ops/textstats.heaps_fit` — β ≈ 0.4–0.6 for natural text)."""
    names = list(ds.schema().names)
    cols = profile_cols or names
    prof = dataset_profile(ds, cols)
    card: dict = {
        "n_rows": int(prof["n_rows"].max()) if len(prof) else 0,
        "columns": prof.to_dict("records"),
    }
    if lang_col is not None and lang_col in names:

        def lang_partial(b: pd.DataFrame) -> pd.DataFrame:
            vc = b[lang_col].value_counts(dropna=False)
            return pd.DataFrame(
                {"lang": vc.index.astype(str), "n": vc.to_numpy().astype("int64")}
            )

        red = auto_group_agg(
            ds.map_batches(lang_partial, batch_format="pandas"),
            ["lang"], {"n": ("n", "sum")}, n_shards=n_shards,
        )
        if not isinstance(red, pd.DataFrame):
            red = red.to_pandas()
        card["languages"] = {
            str(r["lang"]): int(r["n"])
            for _, r in red.sort_values("lang").iterrows()
        }
    if text_col is not None and text_col in names:

        def text_partial(b: pd.DataFrame) -> pd.DataFrame:
            t = b[text_col].fillna("")
            toks = t.str.split().str.len().to_numpy(dtype="int64")
            h = pd.util.hash_array(t.to_numpy(dtype=object))
            return pd.DataFrame(
                {
                    "h": h.astype("int64"),
                    "toks": toks,
                }
            )

        hashed = ds.map_batches(text_partial, batch_format="pandas")

        def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby("h", as_index=False).agg(
                n=("h", "size"), toks=("toks", "first")
            )
            return g

        red = auto_group_agg(
            hashed.map_batches(agg_partial, batch_format="pandas"),
            ["h"],
            {"n": ("n", "sum"), "toks": ("toks", "first")},
            n_shards=n_shards,
        )
        if not isinstance(red, pd.DataFrame):
            # distinct-hash table past the driver threshold: reduce to
            # the three scalars map-side
            def scal(b: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    [
                        {
                            "distinct": np.int64(len(b)),
                            "total": b["n"].to_numpy().sum(),
                            "tok_distinct": (
                                b["toks"].to_numpy() * 1
                            ).sum(),
                            "tok_total": (
                                b["toks"].to_numpy() * b["n"].to_numpy()
                            ).sum(),
                        }
                    ]
                )

            sc = red.map_batches(scal, batch_format="pandas").to_pandas()
            distinct = int(sc["distinct"].sum())
            total = int(sc["total"].sum())
            tok_total = int(sc["tok_total"].sum())
        else:
            distinct = int(len(red))
            total = int(red["n"].sum())
            tok_total = int((red["toks"] * red["n"]).sum())
        card["n_tokens"] = tok_total
        card["n_distinct_texts"] = distinct
        card["dup_rate"] = (
            (total - distinct) / total if total else 0.0
        )
    if corpus_laws and text_col is not None and text_col in names:
        from ..ops.textstats import heaps_fit, zipf_fit

        z = zipf_fit(ds, text_col, n_shards=n_shards).iloc[0]
        laws = {
            "zipf_slope": None if pd.isna(z["slope"]) else round(float(z["slope"]), 4),
            "zipf_r2": None if pd.isna(z["r2"]) else round(float(z["r2"]), 4),
            "zipf_top_k": int(z["k"]),
        }
        if id_col is not None and id_col in names:
            h, _ = heaps_fit(ds, id_col, text_col, n_shards=n_shards)
            hb = h.iloc[0]
            laws["heaps_beta"] = (
                None if pd.isna(hb["beta"]) else round(float(hb["beta"]), 4)
            )
            laws["vocab_size"] = int(hb["v_total"])
        card["corpus_laws"] = laws
    return card
