"""AudioFeatures: real PCM statistics vs a numpy oracle on synthesized
WAVs (sine, silence, clipped, stereo, 8-bit), skip/strict semantics,
malformed-RIFF decode_error."""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa
import pytest


def _wav(samples: np.ndarray, rate=16000, ch=1, width=2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes((samples * 32767).astype("<i2").tobytes())
        elif width == 1:
            w.writeframes(((samples * 127) + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


def _batch(rows):
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "media": pa.array([r[1] for r in rows], pa.binary()),
        }
    )


def test_audio_features_statistics():
    from textextract_ray.stages.multimodal import AudioFeatures

    t = np.arange(16000) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    silence = np.zeros(8000)
    clipped = np.clip(2.0 * np.sin(2 * np.pi * 100 * t), -1.0, 1.0)
    stereo = np.stack([sine, -sine], axis=1).ravel()  # L/R cancel to ~0

    out = AudioFeatures()(
        _batch(
            [
                (0, _wav(sine)),
                (1, _wav(silence)),
                (2, _wav(clipped)),
                (3, _wav(stereo, ch=2)),
                (4, _wav(sine[:4000], width=1)),
                (5, b"not audio"),
                (6, b"RIFF\x00\x00\x00\x00WAVEgarbage"),
            ]
        )
    ).to_pandas().set_index("media_id")

    # sine: rms = amp/sqrt(2), zcr ~ 2*f/rate, one second duration
    assert abs(out.loc[0, "rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(out.loc[0, "zcr"] - 2 * 440 / 16000) < 0.01
    assert out.loc[0, "duration_ms"] == 1000
    assert out.loc[0, "clipping_frac"] == 0.0
    # silence: all-quiet
    assert out.loc[1, "rms"] == 0.0 and out.loc[1, "silence_frac"] == 1.0
    # clipped square-ish wave: substantial clipping fraction
    assert out.loc[2, "clipping_frac"] > 0.3
    # stereo L/R opposites average to near-silence in the mono mix
    assert out.loc[3, "rms"] < 1e-4
    # 8-bit path decodes (quantization-limited accuracy)
    assert abs(out.loc[4, "rms"] - 0.5 / np.sqrt(2)) < 0.02
    assert out.loc[5, "status"] == "skipped"
    assert out.loc[6, "status"].startswith("decode_error")


def test_audio_features_strict_and_dataset(ray_session):
    import ray.data as rd

    from textextract_ray.stages.multimodal import AudioFeatures, audio_features

    with pytest.raises(NotImplementedError):
        AudioFeatures(strict=True)(_batch([(0, b"junk")]))

    t = np.arange(4000) / 16000.0
    ds = rd.from_arrow(_batch([(i, _wav(0.3 * np.sin(2 * np.pi * 200 * t)))
                               for i in range(8)]))
    got = audio_features(ds).to_pandas()
    assert len(got) == 8 and (got["status"] == "ok").all()
    assert (got["duration_ms"] == 250).all()


def test_audio_features_duration_beyond_max_frames():
    """duration_ms comes from the header frame count, not the
    max_frames-truncated analysis prefix: a clip longer than the bound
    still reports its true duration while statistics cover the prefix."""
    from textextract_ray.stages.multimodal import AudioFeatures

    t = np.arange(16000) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)  # 1 s at 16 kHz
    out = (
        AudioFeatures(max_frames=4000)(_batch([(0, _wav(sine))]))
        .to_pandas()
        .iloc[0]
    )
    assert out["status"] == "ok"
    assert out["duration_ms"] == 1000  # whole clip, not 250 ms
    # stats are over the 4000-frame prefix and stay sane
    assert abs(out["rms"] - 0.5 / np.sqrt(2)) < 0.01
