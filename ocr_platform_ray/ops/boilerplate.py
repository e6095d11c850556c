"""HTML main-content extraction (boilerplate removal) — the
block-classification treatment of Kohlschütter et al. 2010 (boilerpipe)
/ Pomikálek 2011 (jusText) that every web-text corpus applies between
"fetched HTML" and "document text" (C4, RefinedWeb and FineWeb all run
one before their text rules).  Re-expresses the reference's per-page
block classifier (nav/script boilerplate dropped before segmentation,
`stages/extract.py` here; apps/queue/src/pipeline in the reference) for
raw crawl HTML.

Rule (deterministic simplification of jusText's context-free core,
documented so the naive test reference and the SQL oracle can mirror
it exactly):

1. drop ``<script>`` / ``<style>`` elements and HTML comments;
2. segment on block-level tags (p, div, h1-6, li, ul/ol, table rows,
   section/article/header/footer/nav/aside, blockquote, pre, form,
   main, br);
3. per block, over its tag-stripped text: ``words`` = ``\\S+`` runs,
   ``link density`` = anchor-text chars / total chars (anchor text
   measured by stripping ``<a>`` ELEMENTS first and diffing lengths);
4. a block is CONTENT iff ``words >= min_words`` and
   ``link_density <= max_link_density`` — short and/or link-dense
   blocks (navigation, footers, button bars) are boilerplate;
5. content blocks, whitespace-collapsed and entity-unescaped (the six
   ubiquitous entities, ``&amp;`` last so double-escapes resolve the
   html.unescape way), join with a blank line into ``main_text``.

jusText's context-sensitive pass (short blocks rescued by good
neighbors) is deliberately out: it trades determinism of the
block-local rule for recall on fragmented markup, and the downstream
quality gates (gopher/C4) already handle short-text pages.

Scale shape: map-only, zero exchanges.  Every step is an Arrow RE2
kernel over the flattened block list (the ``c4_clean`` machinery —
split_pattern_regex -> flat features -> ListArray rebuild ->
binary_join); no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DEFAULT_MIN_WORDS = 10
DEFAULT_MAX_LINK_DENSITY = 0.33

# RE2-compatible (no backreferences); (?is) = case-insensitive dotall
_SCRIPT_PAT = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_PAT = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_PAT = r"(?s)<!--.*?-->"
_ANCHOR_ELEM_PAT = r"(?is)<a\b[^>]*>.*?</a>"
_BLOCK_TAG_PAT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|section"
    r"|article|header|footer|nav|aside|blockquote|pre|form|main)\b[^>]*>"
    r"|(?i)<br\s*/?>"
)
_TAG_PAT = r"(?s)<[^>]*>"
_WORD_PAT = r"\S+"
_WS_PAT = r"\s+"

# (entity, replacement) in double-escape-safe order: named/numeric first,
# the ampersand itself LAST (html.unescape semantics for these six)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_main_content(
    pages: rd.Dataset,
    html_col: str = "html",
    *,
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    out_col: str = "main_text",
) -> rd.Dataset:
    """Append ``main_text`` (content blocks joined by blank lines),
    ``n_blocks`` (non-empty text blocks seen) and ``n_blocks_kept``
    to a Dataset of HTML pages.  Map-only; see the module docstring
    for the exact rule."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    if not 0.0 <= max_link_density <= 1.0:
        raise ValueError(
            f"max_link_density must be in [0, 1], got {max_link_density}"
        )

    def _strip_tags(pc, arr):
        txt = pc.replace_substring_regex(arr, pattern=_TAG_PAT, replacement=" ")
        for ent, rep in _ENTITIES:
            txt = pc.replace_substring(txt, pattern=ent, replacement=rep)
        txt = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(txt, pattern=_WS_PAT, replacement=" ")
        )
        return txt

    def extract(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(html_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.string())
        col = col.fill_null("")

        clean = col
        for pat in (_SCRIPT_PAT, _STYLE_PAT, _COMMENT_PAT):
            clean = pc.replace_substring_regex(clean, pattern=pat, replacement=" ")

        blocks = pc.split_pattern_regex(clean, pattern=_BLOCK_TAG_PAT)
        if isinstance(blocks, pa.ChunkedArray):
            blocks = blocks.combine_chunks()
        flat = blocks.flatten()
        offs = blocks.offsets.to_numpy().astype(np.int64) - blocks.offsets[0].as_py()

        txt = _strip_tags(pc, flat)
        len_all = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
        no_anchor = _strip_tags(
            pc,
            pc.replace_substring_regex(
                flat, pattern=_ANCHOR_ELEM_PAT, replacement=" "
            ),
        )
        len_noa = (
            pc.utf8_length(no_anchor).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        anchor_len = np.maximum(len_all - len_noa, 0)
        link_density = anchor_len / np.maximum(len_all, 1)
        n_words = pc.count_substring_regex(txt, pattern=_WORD_PAT).to_numpy(
            zero_copy_only=False
        )

        nonempty = len_all > 0
        keep = nonempty & (n_words >= min_words) & (link_density <= max_link_density)

        # rebuild per-row kept-block lists without leaving Arrow (the
        # c4_clean ListArray machinery)
        k_c = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        kept_per_row = k_c[offs[1:]] - k_c[offs[:-1]]
        new_offs = np.concatenate([[0], np.cumsum(kept_per_row)]).astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_offs), txt.filter(pa.array(keep))
        )
        main_text = pc.binary_join(kept_lists, "\n\n")

        ne_c = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
        n_blocks = ne_c[offs[1:]] - ne_c[offs[:-1]]

        out = batch
        for name, arr in (
            (out_col, main_text),
            ("n_blocks", pa.array(n_blocks, pa.int64())),
            ("n_blocks_kept", pa.array(kept_per_row, pa.int64())),
        ):
            out = out.append_column(name, arr)
        return out

    return pages.map_batches(extract, batch_format="pyarrow")


_META_PATTERNS = {
    "title": [r"(?is)<title[^>]*>(?P<v>.*?)</title>"],
    "description": [
        r"(?is)<meta\s[^>]*name\s*=\s*[\"']description[\"'][^>]*"
        r"content\s*=\s*[\"'](?P<v>[^\"']*)[\"']",
        r"(?is)<meta\s[^>]*content\s*=\s*[\"'](?P<v>[^\"']*)[\"']"
        r"[^>]*name\s*=\s*[\"']description[\"']",
    ],
    "canonical": [
        r"(?is)<link\s[^>]*rel\s*=\s*[\"']canonical[\"'][^>]*"
        r"href\s*=\s*[\"'](?P<v>[^\"']*)[\"']",
        r"(?is)<link\s[^>]*href\s*=\s*[\"'](?P<v>[^\"']*)[\"']"
        r"[^>]*rel\s*=\s*[\"']canonical[\"']",
    ],
}


def extract_html_meta(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    fields: tuple = ("title", "description", "canonical"),
) -> rd.Dataset:
    """Page-metadata extraction — the head-tag signals a crawl pipeline
    mines BEFORE body extraction (title for retrieval/display, canonical
    link for URL dedup, meta description as a quality/summary signal):
    first ``<title>``, first ``<meta name="description" content>``
    (either attribute order), first ``<link rel="canonical" href>``
    (either order).  Values are RAW (no entity unescape — the consumer
    chooses); a missing tag yields NULL.

    Map-only: one RE2 kernel (``pc.extract_regex``) per (field, variant)
    per batch — the first-match rule IS the kernel's semantics, and the
    primary attribute order is exactly DuckDB ``regexp_extract`` group 1,
    so a SQL oracle mirrors it pattern-for-pattern.  Bytes html decodes
    as UTF-8 with replacement."""
    for f in fields:
        if f not in _META_PATTERNS:
            raise ValueError(f"unknown field {f!r} (have {sorted(_META_PATTERNS)})")

    def extract(batch: pa.Table) -> pa.Table:
        col = batch.column(html_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            s = pd.Series(col.to_pandas()).map(
                lambda v: None if v is None else bytes(v).decode("utf-8", "replace")
            )
            col = pa.array(s, pa.string())
        col = pc.fill_null(col, "")
        out = {id_col: batch.column(id_col)}
        for f in fields:
            best = None
            for pat in _META_PATTERNS[f]:
                st = pc.extract_regex(col, pattern=pat)
                # the child array carries "" garbage where the parent
                # struct is null (no match) — mask by the STRUCT validity
                vals = pc.if_else(
                    pc.is_valid(st), st.field("v"), pa.nulls(len(col), pa.string())
                )
                best = vals if best is None else pc.if_else(
                    pc.is_valid(best), best, vals
                )
            out[f] = best
        return pa.table(out)

    return ds.map_batches(extract, batch_format="pyarrow")


def split_sections(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    levels: str = "12",
) -> rd.Dataset:
    """Heading-based document sectioning — the chapter/section
    segmentation step between extraction and chunking (the reference's
    book-structuring heuristics generalized to crawl HTML): split each
    page at its ``<h1>``/``<h2>`` (``levels``-configurable) headings into
    ``(id, section_idx, heading, section_text)`` rows — section 0 is the
    pre-heading preamble (NULL heading) when non-empty.

    MAP-ONLY and fully vectorized: heading OPEN tags rewrite to a \\x01
    sentinel and CLOSE tags to \\x02 with two RE2 ``replace_substring_regex``
    passes, one ``split_pattern`` explodes sections, and heading/body
    separate on the first \\x02 — every step an Arrow kernel over the
    flattened section list, and every step mirrorable in SQL
    (regexp_replace + string_split + substring arithmetic), so the
    oracle is exact.  Remaining tags inside sections are NOT stripped
    (compose with `extract_main_content` for that)."""
    if not levels or any(c not in "123456" for c in levels):
        raise ValueError("levels must be a non-empty subset of '123456'")
    cls = f"[{levels}]"
    open_pat = rf"(?is)<h{cls}[^>]*>"
    close_pat = rf"(?is)</h{cls}\s*>"

    def split(batch: pa.Table) -> pa.Table:
        col = batch.column(html_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            s = pd.Series(col.to_pandas()).map(
                lambda v: None if v is None else bytes(v).decode("utf-8", "replace")
            )
            col = pa.array(s, pa.string())
        col = pc.fill_null(col, "")
        marked = pc.replace_substring_regex(col, pattern=open_pat, replacement="\x01")
        marked = pc.replace_substring_regex(
            marked, pattern=close_pat, replacement="\x02"
        )
        parts = pc.split_pattern(marked, pattern="\x01")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        offs = parts.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        counts = offs[1:] - offs[:-1]
        row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        sec_idx = (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(offs[:-1], counts)
        )
        # the first piece is the preamble (no heading); later pieces are
        # "heading\x02body" — split at the FIRST \x02 (a malformed
        # heading with no close tag becomes an all-heading section)
        is_preamble = sec_idx == 0
        # heading/body separate at the FIRST \x02 — CHARACTER semantics
        # (str.find), exactly DuckDB strpos/substr arithmetic; a
        # per-SECTION pass (sections, not tokens — bounded small)
        flat_py = flat.to_pylist()
        heads, bodies = [], []
        for i, piece in enumerate(flat_py):
            if is_preamble[i]:
                heads.append(None)
                bodies.append(piece)
                continue
            cut = piece.find("\x02")
            if cut < 0:  # malformed heading with no close tag
                heads.append(piece)
                bodies.append("")
            else:
                heads.append(piece[:cut])
                bodies.append(piece[cut + 1:])
        keep = ~(is_preamble & (np.array([len(x.strip()) for x in bodies]) == 0))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[row_idx]
        out = pa.table(
            {
                id_col: pa.array(ids[keep]),
                "section_idx": pa.array(sec_idx[keep], pa.int64()),
                "heading": pa.array(
                    [h for h, k in zip(heads, keep) if k], pa.string()
                ),
                "section_text": pa.array(
                    [b for b, k in zip(bodies, keep) if k], pa.string()
                ),
            }
        )
        return out

    return ds.map_batches(split, batch_format="pyarrow")


def text_tiling(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 20,
    k: int = 6,
    cutoff_sd: float = 0.5,
) -> rd.Dataset:
    """TextTiling topic segmentation (Hearst 1997, Computational
    Linguistics 23(1)) — subtopic boundaries for long-document chunking
    at TOPIC shifts instead of the fixed windows `sliding_token_windows`
    cuts: tokens group into ``w``-token pseudo-sentences; each gap gets
    the cosine similarity of the ``k``-block bags before/after; the
    depth score at a gap is (left-peak − sim) + (right-peak − sim) and
    boundaries fall where depth exceeds Hearst's μ − σ/2-family cutoff
    (here μ + ``cutoff_sd``·σ over the doc's own gaps — the paper's
    "liberal" vs "conservative" knob).

    Map-only: every doc's gap loop is a handful of numpy block-bag
    cosines (gaps = tokens/w per doc — bounded per document, the
    per-record parse shape of the WARC/PDF sources); nothing exchanges.
    Emits one row per segment: (id, seg_idx, start_tok, end_tok,
    n_tokens, seg_text)."""
    if w < 2 or k < 1:
        raise ValueError("w must be >= 2 and k >= 1")

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, text in zip(b[id_col], b[text_col]):
            toks = [t for t in str(text or "").lower().split(" ") if t]
            n = len(toks)
            if n == 0:
                continue
            n_blocks = (n + w - 1) // w
            if n_blocks < 2 * k + 1:
                rows.append(
                    {id_col: rid, "seg_idx": 0, "start_tok": 0,
                     "end_tok": n, "n_tokens": n,
                     "seg_text": " ".join(toks)}
                )
                continue
            vocab = {}
            for t in toks:
                if t not in vocab:
                    vocab[t] = len(vocab)
            mat = np.zeros((n_blocks, len(vocab)), dtype="float64")
            for i, t in enumerate(toks):
                mat[i // w, vocab[t]] += 1.0
            # gap g sits between blocks g and g+1
            sims = np.empty(n_blocks - 1, dtype="float64")
            for g in range(n_blocks - 1):
                lo = max(0, g - k + 1)
                hi = min(n_blocks, g + 1 + k)
                left = mat[lo : g + 1].sum(axis=0)
                right = mat[g + 1 : hi].sum(axis=0)
                denom = np.sqrt((left * left).sum()) * np.sqrt(
                    (right * right).sum()
                )
                sims[g] = (left * right).sum() / denom if denom > 0 else 0.0
            depth = np.zeros_like(sims)
            for g in range(len(sims)):
                l = g
                while l > 0 and sims[l - 1] >= sims[l]:
                    l -= 1
                r = g
                while r < len(sims) - 1 and sims[r + 1] >= sims[r]:
                    r += 1
                depth[g] = (sims[l] - sims[g]) + (sims[r] - sims[g])
            cut = depth.mean() + cutoff_sd * depth.std()
            bounds = [
                (g + 1) * w
                for g in range(len(depth))
                if depth[g] > cut and depth[g] > 0
            ]
            starts = [0] + bounds
            ends = bounds + [n]
            for si, (a, e) in enumerate(zip(starts, ends)):
                rows.append(
                    {id_col: rid, "seg_idx": si, "start_tok": a,
                     "end_tok": e, "n_tokens": e - a,
                     "seg_text": " ".join(toks[a:e])}
                )
        cols = [id_col, "seg_idx", "start_tok", "end_tok", "n_tokens", "seg_text"]
        return pd.DataFrame(rows, columns=cols)

    return ds.map_batches(per_batch, batch_format="pandas")
