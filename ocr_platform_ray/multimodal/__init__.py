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
from .audio import (  # noqa: F401
    AudioFrameFeatures,
    DecodeAudio,
    audio_frame_features,
    decode_audio,
)
