"""Null-coercion helpers (M16, apps/web/src/lib/validation.ts:3-17):
empty strings normalize to None at schema boundaries."""

from __future__ import annotations

from typing import TypeVar

T = TypeVar("T")


def empty_to_none(value: T | None) -> T | None:
    if isinstance(value, str) and value.strip() == "":
        return None
    return value
