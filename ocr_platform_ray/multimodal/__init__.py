"""Multimodal binary-column stages — PNG/WAV/PNG-seq payloads decode for
real (vendored pure-python codecs); other formats stub/strict."""

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
from .codecs import (  # noqa: F401
    decode_png,
    encode_png,
    decode_wav,
    encode_wav,
    encode_png_seq,
    decode_png_seq_frame,
)
from .audio import (  # noqa: F401
    AudioFrameFeatures,
    DecodeAudio,
    audio_frame_features,
    decode_audio,
)
