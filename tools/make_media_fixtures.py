"""Generate the vendored media micro-fixtures in tests/data/.

tiny.wav is written unconditionally (stdlib ``wave`` — deterministic
320-sample 16 kHz mono square wave, ~700 bytes) and is exercised by
tests/test_multimodal.py's wav-branch tests in EVERY environment.

tiny.mp4 needs NO encoder: tools/mjpeg_mp4.py builds an MJPEG-in-MP4
file in pure Python (always the same deterministic bytes, so the
structural assertions in tests/test_multimodal.py hold in every
environment), and the PyAV/ffmpeg DECODE branches in
operators/multimodal.py get exercised wherever a decoder exists.
tests/test_multimodal.py also self-vendors: when its mp4 fixture has
to synthesize (no vendored file yet, real codec present), it writes
those bytes here for the next run.

Usage: python tools/make_media_fixtures.py
"""

from __future__ import annotations

import os
import sys

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
)


def write_wav(path: str) -> None:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        # square wave +8192/-8192, 20-sample half-period, 320 samples:
        # RMS 0.25 and a known zero-crossing count — the same waveform
        # tests/test_multimodal.py::TestAudio asserts features on
        half = [8192] * 20 + [-8192] * 20
        samples = (half * 8)[:320]
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def write_mp4(path: str) -> bool:
    """The vendored tiny.mp4 is ALWAYS the pure-Python MJPEG build
    (solid DC-only JPEG frames, hand-boxed ISO BMFF — see
    tools/mjpeg_mp4): deterministic bytes in every environment, so
    tests/test_multimodal.py's structural assertions (box tree,
    sample table, 8×32×32) hold no matter where the tool runs.
    Regenerating on a box WITH an encoder must not swap in an
    encoder-specific file (an mpeg4/fragmented MP4 would fail the
    structural test); encoder environments still exercise their real
    codec by DECODING this same file."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.mjpeg_mp4 import check_mjpeg_mp4, tiny_mp4_bytes

    b = tiny_mp4_bytes()
    info = check_mjpeg_mp4(b)
    with open(path, "wb") as f:
        f.write(b)
    print(f"wrote {path} ({len(b)} bytes, pure-python MJPEG: {info})")
    return True


def write_ac_jpeg(path: str) -> None:
    """tiny_ac.jpg: a grayscale baseline JPEG with nonzero AC
    coefficients (tools/mjpeg_mp4.py::tiny_ac_jpeg_bytes) — the
    photographic-class fixture the full stdlib decoder
    (operators/mjpegdc.py::decode_baseline_gray) is pinned against.
    Deterministic formula-derived blocks, so tests recompute the
    coefficients and assert decoded pixels bit-exact."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.mjpeg_mp4 import tiny_ac_jpeg_bytes

    b = tiny_ac_jpeg_bytes()
    with open(path, "wb") as f:
        f.write(b)
    print(f"wrote {path} ({len(b)} bytes)")


if __name__ == "__main__":
    os.makedirs(DATA_DIR, exist_ok=True)
    write_wav(os.path.join(DATA_DIR, "tiny.wav"))
    write_mp4(os.path.join(DATA_DIR, "tiny.mp4"))
    write_ac_jpeg(os.path.join(DATA_DIR, "tiny_ac.jpg"))
