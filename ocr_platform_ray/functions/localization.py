"""Localized-entries folder (M14, apps/web/src/lib/localization.ts:1-19).

``[{locale, text}]`` or ``[{locale, texts}]`` list-of-struct -> dict keyed by
locale; first entry per locale wins (the reference's reduce keeps the first
occurrence).
"""

from __future__ import annotations


def fold_localized_entries(entries: list[dict] | None) -> dict:
    out: dict = {}
    for e in entries or []:
        loc = e.get("locale")
        if loc is None or loc in out:
            continue
        out[loc] = e.get("texts") if "texts" in e else e.get("text")
    return out
