"""Stdlib-only WAV (RIFF PCM) encode/decode — the audio analog of png.py.

The container has no audio libraries, but CPython's ``wave`` module is a
complete PCM WAV codec — so the audio modality's decode path can be REAL
and oracle-verified in-sandbox, exactly the move png.py made for images
(r4 verdict item 5). Payloads are genuine RIFF/WAVE bytes; a consumer with
ffmpeg/soundfile swaps the decoder behind the same seam and nothing else
changes.

16-bit signed little-endian PCM only (the dominant WAV layout): samples are
exact integers in [-32768, 32767], so every feature derived from them is
integer-valued and bit-exact across engines.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav(
    samples: list[int], sample_rate: int, n_channels: int = 1
) -> bytes:
    """Interleaved int16 samples -> RIFF/WAVE bytes (PCM, 16-bit LE)."""
    if len(samples) % n_channels:
        raise ValueError("sample count not divisible by channel count")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """WAV bytes -> (n_channels, sample_rate, n_frames, interleaved int16
    samples). Raises on non-16-bit payloads (the only layout we emit)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        ch, width, rate, n = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        if width != 2:
            raise NotImplementedError(f"only 16-bit PCM supported, got {width*8}-bit")
        raw = w.readframes(n)
    return ch, rate, n, list(struct.unpack(f"<{n * ch}h", raw))
