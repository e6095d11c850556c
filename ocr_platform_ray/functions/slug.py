"""Slug / transliteration-char scalar functions.

Reference parity:
  - M9 slugifier (apps/web/src/lib/slug.ts:3-12): NFD-decompose, strip
    combining marks, slugify-lowercase (non-alphanumeric runs -> single
    dash, trimmed).
  - M12 deterministic transliteration char canonicalization
    (apps/web/src/lib/openai/transliterate.ts:121-146): modifier
    apostrophes mapped to the IJMES ayn/hamza forms.
"""

from __future__ import annotations

import re
import unicodedata

_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")


def remove_diacritics(text: str) -> str:
    """NFD-decompose and drop combining marks (slug.ts:3-5 semantics,
    duplicated at apps/web/src/lib/utils.ts:16-18)."""
    return "".join(
        c for c in unicodedata.normalize("NFD", text) if not unicodedata.combining(c)
    )


def slugify(text: str) -> str:
    """Stable ASCII slug: diacritics stripped, lowercased, non-alphanumeric
    runs collapsed to '-', edges trimmed (slug.ts:7-12)."""
    t = remove_diacritics(text).lower()
    return _NON_ALNUM_RE.sub("-", t).strip("-")


_TRANSLIT_MAP = {
    "ʻ": "ʿ",  # modifier turned comma -> ayn
    "'": "ʾ",  # apostrophe -> hamza
    "`": "ʿ",
    "’": "ʾ",
    "‘": "ʿ",
}


def canonicalize_translit_chars(text: str) -> str:
    """Deterministic IJMES character canonicalization (transliterate.ts
    char-replace table; the LLM portion is out of scope per SURVEY M12)."""
    return "".join(_TRANSLIT_MAP.get(c, c) for c in text)
