"""Deterministic page recognition — the inverse of ``stages/raster.py``.

The reference OCRs every rasterized page through Azure prebuilt-read
(apps/queue/src/lib/ocr.ts:77-122), so a purely scanned (image-only) PDF
still yields text.  This module is that capability under the repo's
byte-identical determinism rule (SURVEY §0): template matching against
the SAME 5x7 glyph atlas the rasterizer paints with (stages/font.py), so
a page rendered by ``rasterize_boxes`` recognizes back to its exact
source text.

Contract (what the fixture generator guarantees, and what real scanned
input must look like for exact recovery):

* glyph cells sit on a uniform grid per line: cell height = the
  rasterized font size, cell width = half of it (the parser's 0.5 em
  advance model) — integer pixel sizes;
* every line contains at least one full-cell-height glyph (uppercase
  letters and digits all span the full 7 rows), so the ink band height
  IS the cell height;
* line bands do not touch vertically (the article layout's 14 pt pitch
  at 12 pt size leaves a 4 px gap at 2x);
* characters come from the atlas's font table (the small-caps font
  renders lowercase identically to uppercase, so recognition emits
  uppercase — scanned fixtures carry uppercase text to keep the
  byte-identity invariant exact).

Lines violating the contract still recognize deterministically (best
match by fewest mismatched pixels, ties to the lowest offset / lowest
codepoint) — they just aren't guaranteed exact.
"""

from __future__ import annotations

import numpy as np

from .font import _FONT_ART, _GlyphAtlas

# candidate characters, deterministic order (codepoint ascending);
# lowercase is excluded — it renders identically to uppercase
_CANDIDATES = "".join(sorted(_FONT_ART.keys(), key=ord))


# per-process caches (recognition is a pure function of the pixels; the
# atlas and per-size tables are content-independent)
_ATLAS = _GlyphAtlas()
_SIZE_CACHE: dict[tuple[int, int], tuple[dict, np.ndarray]] = {}


def _glyph_tables(ch_w: int, ch_h: int) -> tuple[dict, np.ndarray]:
    """Per cell size: (exact-match dict {bitmap_bytes: char}, (G, ch_h,
    ch_w) bool stack).  On exact-render input every cell hits the dict
    (first candidate in codepoint order wins a collision — several
    glyphs can resize to one bitmap at tiny sizes); the stack only backs
    the off-contract fallback scorer."""
    key = (ch_w, ch_h)
    hit = _SIZE_CACHE.get(key)
    if hit is not None:
        return hit
    stack = np.stack([_ATLAS.glyph(ord(c), ch_w, ch_h) for c in _CANDIDATES])
    exact: dict = {}
    for c, g in zip(_CANDIDATES, stack):
        exact.setdefault(g.tobytes(), c)
    _SIZE_CACHE[key] = (exact, stack)
    return exact, stack


def _bands(ink: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs of consecutive ink-bearing rows -> [(r0, r1)...]."""
    rows = ink.any(axis=1)
    if not rows.any():
        return []
    d = np.diff(rows.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if rows[0]:
        starts = np.concatenate([[0], starts])
    if rows[-1]:
        ends = np.concatenate([ends, [len(rows)]])
    return list(zip(starts.tolist(), ends.tolist()))


def _band_cells(band: np.ndarray, o: int, xr: int, ch_w: int) -> np.ndarray:
    """Slice the band into (n_cells, ch_h, ch_w) starting at offset o."""
    ch_h = band.shape[0]
    n_cells = -(-(xr + 1 - o) // ch_w)
    width = n_cells * ch_w
    seg = np.zeros((ch_h, width), dtype=bool)
    avail = min(width, band.shape[1] - o)
    seg[:, :avail] = band[:, o : o + avail]
    return seg.reshape(ch_h, n_cells, ch_w).transpose(1, 0, 2)


def _recognize_band(band: np.ndarray) -> tuple[int, str] | None:
    """One line band (ch_h rows of bool ink) -> (x_offset_px, text).

    Sweeps the ch_w possible grid offsets ending at the first ink
    column.  Fast path: on rasterizer output every cell of the TRUE
    grid is an exact glyph render, so a bitmap-bytes dict lookup
    identifies it (first failing cell rejects the offset immediately) —
    no per-pixel scoring at all.  If no offset matches exactly
    (off-contract input), falls back to XOR-popcount best-match; ties
    break to the smallest offset, then the lowest codepoint per cell."""
    ch_h = band.shape[0]
    ch_w = int(round(ch_h / 2))
    if ch_w < 1:
        return None
    cols = np.flatnonzero(band.any(axis=0))
    xl, xr = int(cols[0]), int(cols[-1])
    exact, stack = _glyph_tables(ch_w, ch_h)
    lo = max(0, xl - ch_w + 1)
    for o in range(lo, xl + 1):
        cells = _band_cells(band, o, xr, ch_w)
        chars = []
        for cell in cells:
            c = exact.get(cell.tobytes())
            if c is None:
                break
            chars.append(c)
        else:
            text = "".join(chars).rstrip(" ")
            return (o, text) if text else None
    # off-contract fallback: best match by fewest mismatched pixels
    best = None  # (total_mismatch, offset, text)
    for o in range(lo, xl + 1):
        cells = _band_cells(band, o, xr, ch_w)
        mism = (cells[:, None, :, :] ^ stack[None, :, :, :]).sum(axis=(2, 3))
        pick = mism.argmin(axis=1)
        total = int(mism[np.arange(len(cells)), pick].sum())
        if best is None or total < best[0]:
            text = "".join(_CANDIDATES[g] for g in pick).rstrip(" ")
            best = (total, o, text)
    if best is None or not best[2]:
        return None
    return best[1], best[2]


def recognize_pixels(
    px: np.ndarray, *, scale: float
) -> list[tuple[float, float, float, str]]:
    """Grayscale page pixels (255 = paper) -> recognized lines as
    ``(x_pt, top_y_pt, size_pt, text)`` in page points (top-down y),
    ready to synthesize TextRuns for the standard line-merge / XY-cut /
    segment path."""
    ink = px < 128
    out = []
    for r0, r1 in _bands(ink):
        got = _recognize_band(ink[r0:r1])
        if got is None:
            continue
        o, text = got
        out.append((o / scale, r0 / scale, (r1 - r0) / scale, text))
    return out
