"""Multimodal plumbing tests: schema contracts, actor stages, explode
fan-out.  Codecs are stubbed (no image/audio libs in this container); the
Ray-side flow is real (SURVEY task spec: 'make the plumbing real and
tested')."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_platform_ray.multimodal.decode import IMAGE_SCHEMA


def _images_table(n=6):
    return pa.table(
        {
            "media_id": pa.array([f"img{i}" for i in range(n)], pa.string()),
            "payload": pa.array([f"payload-{i}".encode() for i in range(n)], pa.binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array([32 + 4 * i for i in range(n)], pa.int32()),
            "height": pa.array([24 + 2 * i for i in range(n)], pa.int32()),
        },
        schema=IMAGE_SCHEMA,
    )


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_decode_deterministic_and_sized(self):
        from ocr_platform_ray.multimodal import decode_images

        out = decode_images(rd.from_arrow(_images_table())).to_pandas()
        assert len(out) == 6
        row = out.iloc[0]
        assert len(row.pixels) == row.width * row.height * 3
        # deterministic: same payload -> same pixels
        out2 = decode_images(rd.from_arrow(_images_table())).to_pandas()
        assert out.iloc[3].pixels == out2.iloc[3].pixels

    def test_strict_mode_raises(self):
        from ocr_platform_ray.multimodal.decode import DecodeImages

        with pytest.raises(NotImplementedError):
            DecodeImages(strict=True)(_images_table())

    def test_resize_then_features(self):
        from ocr_platform_ray.multimodal import decode_images, image_features, resize_images

        ds = decode_images(rd.from_arrow(_images_table()))
        ds = resize_images(ds, 16, 16)
        out = image_features(ds).to_pandas()
        assert len(out) == 6
        assert all(len(m) == 3 for m in out.channel_mean)
        assert (out.width == 16).all() and (out.height == 16).all()
        # phash is a stable 64-bit value
        assert out.phash.between(np.iinfo(np.int64).min, np.iinfo(np.int64).max).all()

    def test_video_frame_sampling_explodes(self):
        from ocr_platform_ray.multimodal import sample_frames

        vids = pa.table(
            {
                "media_id": pa.array(["v0", "v1"], pa.string()),
                "payload": pa.array([b"vid0", b"vid1"], pa.binary()),
                "n_frames": pa.array([25, 7], pa.int64()),
            }
        )
        out = sample_frames(rd.from_arrow(vids), every_n=10).to_pandas()
        assert list(out[out.media_id == "v0"].frame_idx) == [0, 10, 20]
        assert list(out[out.media_id == "v1"].frame_idx) == [0]
        assert all(len(p) == 16 * 16 * 3 for p in out.pixels)


@pytest.mark.usefixtures("ray_session")
class TestAudio:
    def _clips(self):
        from ocr_platform_ray.multimodal.audio import AUDIO_SCHEMA

        return pa.table(
            {
                "media_id": pa.array(["a0", "a1"], pa.string()),
                "payload": pa.array([b"clip0", b"clip1"], pa.binary()),
                "sample_rate": pa.array([16000, 16000], pa.int32()),
                "n_samples": pa.array([4096, 1500], pa.int64()),
            },
            schema=AUDIO_SCHEMA,
        )

    def test_decode_and_frame_features(self):
        from ocr_platform_ray.multimodal import audio_frame_features, decode_audio

        out = audio_frame_features(decode_audio(rd.from_arrow(self._clips()))).to_pandas()
        a0 = out[out.media_id == "a0"]
        assert list(a0.frame_idx) == list(range(len(a0)))
        assert len(a0) == 1 + (4096 - 1024) // 512
        assert len(out[out.media_id == "a1"]) == 1  # 1500 samples -> one frame
        assert (out.rms > 0).all()
        assert out.spectral_centroid.between(0, 8000).all()

    def test_strict_mode_raises(self):
        from ocr_platform_ray.multimodal.audio import DecodeAudio

        with pytest.raises(NotImplementedError):
            DecodeAudio(strict=True)(self._clips())

    def test_decode_deterministic(self):
        from ocr_platform_ray.multimodal import decode_audio

        a = decode_audio(rd.from_arrow(self._clips())).to_pandas()
        b = decode_audio(rd.from_arrow(self._clips())).to_pandas()
        assert a.iloc[0].pcm == b.iloc[0].pcm
