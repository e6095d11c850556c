"""Audio binary-column stages — sibling of decode.py's image/video stages.

A row is (media_id, payload: binary, sample_rate, n_samples).  RIFF/WAV
payloads decode for REAL via the vendored PCM parser (codecs.py); other
formats (no soundfile/ffmpeg in this container) fall back to a
deterministic stub or raise in strict mode.  Frame windowing, feature
math (RMS energy, zero-crossing rate, spectral centroid via numpy FFT),
and the explode layout are real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from .codecs import decode_wav

AUDIO_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("sample_rate", pa.int32()),
        pa.field("n_samples", pa.int64()),
    ]
)


def _fake_pcm(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in decode: seeded waveform in [-1, 1]."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples, dtype=np.float64)
    f = 100 + (seed % 400)
    return 0.5 * np.sin(2 * np.pi * f * t / 16000) + 0.1 * rng.randn(n_samples)


class DecodeAudio:
    """Actor-pool stage: payload -> float32 PCM column.

    RIFF/WAV payloads decode for REAL (vendored PCM parser,
    multimodal/codecs.py; the container ships no soundfile/ffmpeg for
    compressed formats).  Other payloads fall back to the deterministic
    stub, or raise in ``strict`` mode.  The decoded sample count/rate
    overwrite the metadata columns."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ns = batch.column("n_samples").to_pylist()
        srs = batch.column("sample_rate").to_pylist()
        pcm, out_n, out_sr = [], [], []
        for p, n, sr in zip(payloads, ns, srs):
            if p[:4] == b"RIFF":
                x, sr = decode_wav(p)
                n = len(x)
            elif self.strict:
                raise NotImplementedError("no codec for non-WAV payload in this environment")
            else:
                x = _fake_pcm(p, int(n))
            pcm.append(x.astype(np.float32).tobytes())
            out_n.append(int(n))
            out_sr.append(int(sr))
        out = batch.drop_columns(["payload"])
        out = out.set_column(
            out.schema.get_field_index("sample_rate"), "sample_rate", pa.array(out_sr, pa.int32())
        )
        out = out.set_column(
            out.schema.get_field_index("n_samples"), "n_samples", pa.array(out_n, pa.int64())
        )
        return out.append_column("pcm", pa.array(pcm, pa.binary()))


def decode_audio(ds: rd.Dataset, *, concurrency=(1, 8), batch_size: int = 16) -> rd.Dataset:
    return ds.map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


class AudioFrameFeatures:
    """Explode each clip into fixed-length frames with per-frame features:
    rms energy, zero-crossing rate, spectral centroid (numpy FFT)."""

    def __init__(self, frame_len: int = 1024, hop: int = 512):
        self.frame_len, self.hop = frame_len, hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        srs = batch.column("sample_rate").to_pylist()
        pcms = batch.column("pcm").to_pylist()
        o_id, o_frame, o_rms, o_zcr, o_cent = [], [], [], [], []
        for mid, sr, raw in zip(ids, srs, pcms):
            x = np.frombuffer(raw, dtype=np.float32).astype(np.float64)
            n_frames = max(0, 1 + (len(x) - self.frame_len) // self.hop)
            for fi in range(n_frames):
                fr = x[fi * self.hop : fi * self.hop + self.frame_len]
                o_id.append(mid)
                o_frame.append(fi)
                o_rms.append(float(np.sqrt(np.mean(fr**2))))
                o_zcr.append(float(np.mean(np.abs(np.diff(np.signbit(fr).astype(np.int8))))))
                spec = np.abs(np.fft.rfft(fr))
                freqs = np.fft.rfftfreq(self.frame_len, d=1.0 / sr)
                o_cent.append(float((spec * freqs).sum() / max(spec.sum(), 1e-12)))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.string()),
                "frame_idx": pa.array(o_frame, pa.int32()),
                "rms": pa.array(o_rms, pa.float64()),
                "zcr": pa.array(o_zcr, pa.float64()),
                "spectral_centroid": pa.array(o_cent, pa.float64()),
            }
        )


def audio_frame_features(
    ds: rd.Dataset, *, frame_len: int = 1024, hop: int = 512, concurrency=(1, 8)
) -> rd.Dataset:
    return ds.map_batches(
        AudioFrameFeatures,
        fn_constructor_args=(frame_len, hop),
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
    )
