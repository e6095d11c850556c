"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just fixture cases (SURVEY.md §5 item 3)."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_platform_ray.functions.hijri import gregorian_to_hijri, hijri_to_gregorian
from ocr_platform_ray.functions.score import command_score
from ocr_platform_ray.functions.slug import slugify
from ocr_platform_ray.functions.text import count_words, normalize_text
from ocr_platform_ray.stages.extract import extract_page
from ocr_platform_ray.stages.skew import split_payload


class TestExtractTotal:
    """extract_page is a TOTAL function: any bytes in, a valid row out."""

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2000), st.text(max_size=200))
    def test_never_raises_and_shape_stable(self, payload, prior):
        r = extract_page(payload, prior)
        assert set(r) == {
            "header", "body", "footnotes", "page_number", "spans",
            "total_words", "flags", "failed_stage",
        }
        assert isinstance(r["body"], str)
        assert r["total_words"] >= 0
        for s in r["spans"]:
            assert 0 <= s["start"] <= s["end"] <= len(r["body"].encode("utf-8"))

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=1000), st.text(max_size=100))
    def test_deterministic(self, payload, prior):
        assert extract_page(payload, prior) == extract_page(payload, prior)


class TestSplitPayloadProps:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=5000), st.integers(min_value=16, max_value=1000))
    def test_lossless_and_bounded(self, blob, max_bytes):
        chunks = split_payload(blob, max_bytes)
        assert b"".join(chunks) == blob
        if len(blob) > max_bytes:
            # every chunk respects the bound up to one block-boundary overhang
            assert all(len(c) <= max_bytes for c in chunks)


class TestScalarProps:
    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def test_normalize_idempotent(self, t):
        once = normalize_text(t)
        assert normalize_text(once) == once

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def test_slug_charset(self, t):
        s = slugify(t)
        assert all(c.islower() or c.isdigit() or c == "-" for c in s)
        assert not s.startswith("-") and not s.endswith("-")

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def test_word_count_nonneg_and_ws_insensitive(self, t):
        n = count_words(t)
        assert n >= 0
        assert count_words("  " + t + "  ") == n

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=30), st.text(max_size=10))
    def test_command_score_bounds(self, target, query):
        s = command_score(target, query)
        assert 0.0 <= s <= 1.0

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=1, max_value=1500),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=29),
    )
    def test_hijri_roundtrip(self, hy, hm, hd):
        g = hijri_to_gregorian(hy, hm, hd)
        assert gregorian_to_hijri(*g) == (hy, hm, hd)

    @settings(max_examples=100, deadline=None)
    @given(st.dates(min_value=datetime.date(700, 1, 1), max_value=datetime.date(2500, 1, 1)))
    def test_gregorian_roundtrip(self, d):
        h = gregorian_to_hijri(d.year, d.month, d.day)
        assert hijri_to_gregorian(*h) == (d.year, d.month, d.day)
