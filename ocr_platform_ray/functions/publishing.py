"""Publishing-details labeled-field parser (M11).

The reference prompt (apps/web/src/lib/openai/extract-publishing-details.ts:
17-21) is exactly a parse table: the Arabic string is '/'-separated
``label: value`` segments.  The rebuild is the deterministic parser the
prompt describes — no LLM.
"""

from __future__ import annotations

_LABELS = {
    "المحقق": "investigator",
    "دار النشر": "publisher",
    "مكان النشر": "publisher_location",
    "رقم الطبعة": "edition_number",
    "عام النشر": "publication_year",
}

_FIELDS = ("investigator", "publisher", "publisher_location", "edition_number", "publication_year")


def parse_publishing_details(raw: str | None) -> dict[str, str | None]:
    """Split on '/', match known Arabic label prefixes, map to typed fields
    (extract-publishing-details.ts:53-59 zod schema shape)."""
    out: dict[str, str | None] = {f: None for f in _FIELDS}
    if not raw:
        return out
    for seg in raw.split("/"):
        seg = seg.strip()
        if not seg or ":" not in seg and "：" not in seg:
            continue
        label, _, value = seg.partition(":")
        field = _LABELS.get(label.strip())
        if field:
            v = value.strip()
            out[field] = v if v else None
    return out
