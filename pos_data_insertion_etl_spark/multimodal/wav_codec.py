"""WAV audio codec over the stdlib `wave` module.

PCM WAV needs no external audio library: `wave` handles the RIFF
container and numpy views the frames. 16-bit mono/stereo PCM only --
the format the engine's synthetic audio payloads and tests use; other
sample widths raise rather than silently mis-decode.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 array, shape (n,) mono or (n, 2) stereo -> WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    n_channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 array [n] or [n, channels], sample_rate)."""
    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"{8 * w.getsampwidth()}-bit samples (only 16-bit PCM supported)"
            )
        n_channels = w.getnchannels()
        frames = w.readframes(w.getnframes())
        arr = np.frombuffer(frames, dtype="<i2")
        if n_channels > 1:
            arr = arr.reshape(-1, n_channels)
        return arr, w.getframerate()
