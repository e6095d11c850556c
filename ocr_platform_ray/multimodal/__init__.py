"""Multimodal binary-column stages (stubbed codecs, real plumbing)."""

from .decode import (  # noqa: F401
    DecodeImages,
    ExtractImageFeatures,
    ResizeImages,
    SampleFrames,
    decode_images,
    image_features,
    resize_images,
    sample_frames,
)
