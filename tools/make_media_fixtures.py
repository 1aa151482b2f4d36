"""Generate the vendored media micro-fixtures in tests/data/.

tiny.wav is written unconditionally (stdlib ``wave`` — deterministic
320-sample 16 kHz mono square wave, ~700 bytes) and is exercised by
tests/test_multimodal.py's wav-branch tests in EVERY environment.

tiny.mp4 needs a video encoder (PyAV or the ffmpeg binary) and is
written only where one exists — run this script once from such an
environment (any CI image with ffmpeg) and commit the file; from then
on the PyAV/ffmpeg DECODE branches in operators/multimodal.py get
exercised wherever a decoder exists, without needing the encoder.
tests/test_multimodal.py also self-vendors: when its mp4 fixture has
to synthesize (no vendored file yet, codec present), it writes the
bytes here for the next run.

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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from syncflux_spark.operators import multimodal as mm

    if mm.codec_available("pyav") or mm.codec_available("ffmpeg"):
        from tests.test_multimodal import _mp4_bytes

        b = _mp4_bytes()
        with open(path, "wb") as f:
            f.write(b)
        print(f"wrote {path} ({len(b)} bytes, real encoder)")
        return True
    # no encoder anywhere: build MJPEG-in-MP4 in pure Python (solid
    # DC-only JPEG frames, hand-boxed ISO BMFF — see tools/mjpeg_mp4)
    # and prove the structure with the marker/box checker
    from tools.mjpeg_mp4 import check_mjpeg_mp4, tiny_mp4_bytes

    b = tiny_mp4_bytes()
    info = check_mjpeg_mp4(b)
    with open(path, "wb") as f:
        f.write(b)
    print(f"wrote {path} ({len(b)} bytes, pure-python MJPEG: {info})")
    return True


if __name__ == "__main__":
    os.makedirs(DATA_DIR, exist_ok=True)
    write_wav(os.path.join(DATA_DIR, "tiny.wav"))
    write_mp4(os.path.join(DATA_DIR, "tiny.mp4"))
