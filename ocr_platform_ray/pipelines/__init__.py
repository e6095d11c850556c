"""End-to-end pipelines composed from stages/ and ops/."""

from .extraction import extract_pages_ds, extraction_pipeline  # noqa: F401
