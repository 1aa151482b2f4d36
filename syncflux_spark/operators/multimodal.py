"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, per the
large-scale training-data pipeline pattern: the bytes move through the
plan as little as possible; decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` stages; everything after feature
extraction operates on compact typed columns (dims, vectors) so
shuffles never carry raw media.

Third-party codecs (PIL/PyAV/ffmpeg) are NOT in this container, so
those decode kernels are deterministic STUBS behind ``codec="fake"``
with capability-probed real branches — the Spark-side contract
(schemas, batch iteration, 1→N row expansion for frame sampling,
partition sizing) is real and tested; swapping in a real codec
changes only the inner function. The audio ``wav`` branch is a REAL
codec that runs here (stdlib ``wave``, no dependency).

Scale notes:
* media rows are big (MBs) → ``spark.sql.files.maxPartitionBytes``
  keeps scan partitions bounded; ``spread_for_cpu`` applies when a
  small row count carries heavy per-row decode cost.
* ``mapInPandas`` streams Arrow record batches — memory is bounded by
  batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``), not
  partition size, which is what makes 100 GB-per-partition video
  tables workable.
* feature vectors come out as ``array<float>`` ready for
  operators/similarity.py (ANN) and operators/dedup.py (embedding
  near-dup).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from syncflux_spark.utils import spread_for_cpu

#: Schema of a media table: id + kind + opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def synth_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (testing stand-in for a real
    binary ingest): content bytes derive from the id, with a tiny
    16-byte header encoding fake width/height/channels."""

    def payload(i: int) -> bytes:
        w, h, c = 64 + (i % 8) * 16, 64 + (i % 5) * 32, 3
        header = struct.pack("<III", w, h, c) + b"FAKE"
        body = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 4
        return header + body

    rows = [(i, kind, payload(i), f"synthetic://{kind}/{i}") for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def codec_available(codec: str) -> bool:
    """Capability probe for media codecs. ``fake`` (the deterministic
    header-parsing stub) is always available; ``pil`` is available
    when Pillow imports; ``pyav`` when the PyAV bindings import;
    ``ffmpeg`` when an ffmpeg binary is on PATH. Tests use this as
    their skip condition, and every kernel routes through
    :func:`_require_codec` so an unavailable codec fails fast on the
    driver with an actionable message instead of import-erroring
    inside executors."""
    if codec == "fake":
        return True
    if codec in ("mjpegdc", "dcjpeg"):
        return True  # pure-stdlib spec decoders (operators/mjpegdc.py)
    if codec == "pil":
        try:
            import PIL.Image  # noqa: F401

            return True
        except Exception:
            return False
    if codec == "pyav":
        try:
            import av  # noqa: F401

            return True
        except Exception:
            return False
    if codec == "ffmpeg":
        import shutil

        return shutil.which("ffmpeg") is not None
    if codec == "wav":
        try:
            import wave  # noqa: F401  (stdlib — probe kept for symmetry)

            return True
        except Exception:
            return False
    return False


_CODEC_HINT = {
    "pil": "pip install pillow",
    "pyav": "pip install av",
    "ffmpeg": "install the ffmpeg binary",
}


def _require_codec(
    codec: str, supported: tuple[str, ...] = ("fake", "pil")
) -> None:
    if codec not in supported:
        raise NotImplementedError(
            f"codec {codec!r}: this stage supports {supported}"
        )
    if not codec_available(codec):
        raise NotImplementedError(
            f"codec {codec!r}: decoder not available in this environment "
            f"({_CODEC_HINT.get(codec, 'no install hint')}) — the 'fake' "
            "codec exercises the same Spark plumbing (schemas, batching, "
            "1→N expansion) deterministically"
        )


def decode_images(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stage: bytes → image metadata. Arrow-batched
    ``mapInPandas``; same kernel shape for every codec — ``fake``
    parses the synthetic 16-byte header, ``pil`` calls
    ``PIL.Image.open`` on the real bytes (capability-probed), and
    ``dcjpeg`` fully entropy-decodes real grayscale baseline JPEGs —
    AC coefficients and IDCT included — with the pure-stdlib T.81
    decoder (operators/mjpegdc.py::decode_baseline_gray — executes
    the real-bytes branch in environments with no Pillow at all)."""
    _require_codec(codec, supported=("fake", "pil", "dcjpeg"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            from io import BytesIO

            from PIL import Image
        elif codec == "dcjpeg":
            from syncflux_spark.operators.mjpegdc import decode_baseline_gray

        for pdf in batches:
            content = pdf["content"]
            if codec == "pil":
                meta = []
                for b in content:
                    im = Image.open(BytesIO(bytes(b)))
                    meta.append((im.size[0], im.size[1], len(im.getbands())))
            elif codec == "dcjpeg":
                meta = []
                for b in content:
                    w, h, _px = decode_baseline_gray(bytes(b))
                    meta.append((w, h, 1))  # grayscale-only scope
            else:
                meta = [struct.unpack("<III", b[:12]) for b in content]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "n_bytes": [len(b) for b in content],
                }
            )

    return spread_for_cpu(df).mapInPandas(kernel, DECODED_IMAGE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16, codec: str = "fake") -> DataFrame:
    """Feature-extraction stage: bytes → ``array<float>`` embedding.
    ``fake``: sha256-seeded deterministic vector; ``pil``: grayscale
    downsample to ``dim`` pixels normalized to [0,1]; ``dcjpeg``:
    per-pixel-column means of the full T.81 decode (AC + IDCT)
    resampled to ``dim`` and normalized the same way (real-bytes path
    with zero third-party codecs; identical values to the former
    block-stripe means on flat-block media, and now faithful on
    photographic blocks too) — a real model slots into the same Arrow
    batch loop. Output feeds the similarity/dedup operators
    directly."""
    _require_codec(codec, supported=("fake", "pil", "dcjpeg"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            from io import BytesIO

            from PIL import Image
        elif codec == "dcjpeg":
            from syncflux_spark.operators.mjpegdc import decode_baseline_gray

        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                if codec == "pil":
                    im = Image.open(BytesIO(bytes(b))).convert("L")
                    px = list(im.resize((dim, 1)).getdata())
                    feats.append([p / 255.0 for p in px])
                    continue
                if codec == "dcjpeg":
                    w, h, px = decode_baseline_gray(bytes(b))
                    # mean gray per pixel column, resampled to dim
                    col_means = [
                        sum(px[r * w + c] for r in range(h)) / h
                        for c in range(w)
                    ]
                    feats.append(
                        [
                            col_means[min(w - 1, i * w // dim)] / 255.0
                            for i in range(dim)
                        ]
                    )
                    continue
                h = hashlib.sha256(bytes(b)).digest()
                # dim floats in [0,1) from repeated hash material
                raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
                vals = struct.unpack(f"<{dim}I", raw[: dim * 4])
                feats.append([(v % 1_000_003) / 1_000_003.0 for v in vals])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return spread_for_cpu(df).mapInPandas(kernel, FEATURE_SCHEMA)


def _pyav_frames(b: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Decode every Nth video frame with PyAV; frame bytes are raw
    rgb24 (h×w×3, row-major) — compact, codec-free, and exactly what
    a feature extractor consumes next."""
    from io import BytesIO

    import av

    out: list[tuple[int, bytes]] = []
    with av.open(BytesIO(b)) as container:
        stream = container.streams.video[0]
        for fi, frame in enumerate(container.decode(stream)):
            if fi % every_n == 0:
                out.append((fi, frame.to_ndarray(format="rgb24").tobytes()))
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _ffmpeg_frames(b: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Decode every Nth frame by piping the container bytes through
    the ffmpeg binary: select filter keeps frames where n % N == 0,
    image2pipe emits a PNG stream we split on the PNG signature."""
    import subprocess

    proc = subprocess.run(
        [
            "ffmpeg", "-v", "error", "-i", "pipe:0",
            "-vf", f"select='not(mod(n\\,{every_n}))'",
            "-vsync", "vfr", "-f", "image2pipe", "-c:v", "png", "pipe:1",
        ],
        input=b,
        capture_output=True,
        check=True,
    )
    raw = proc.stdout
    pngs = [
        _PNG_SIG + chunk
        for chunk in raw.split(_PNG_SIG)
        if chunk
    ]
    return [(i * every_n, png) for i, png in enumerate(pngs)]


def sample_frames(df: DataFrame, every_n: int = 4, codec: str = "fake") -> DataFrame:
    """Frame-sampling stage (video): one input row → N frame rows —
    the 1→N expansion shape of real frame extraction, streamed per
    Arrow batch so memory stays bounded regardless of video length.
    ``fake`` emits 32-byte slices of the content (deterministic stub);
    ``pyav`` decodes real containers in-process (raw rgb24 frames);
    ``ffmpeg`` shells out to the binary (PNG frames); ``mjpegdc`` is
    the pure-stdlib DC-only MJPEG/MP4 decoder (operators/mjpegdc.py,
    rgb24 frames like pyav) that needs no third-party codec at all.
    The real codecs are capability-probed and share the fake path's
    kernel contract: same schema, same per-batch iteration, same 1→N
    row expansion."""
    _require_codec(codec, supported=("fake", "pyav", "ffmpeg", "mjpegdc"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                b = bytes(b)
                if codec == "pyav":
                    decoded = _pyav_frames(b, every_n)
                elif codec == "ffmpeg":
                    decoded = _ffmpeg_frames(b, every_n)
                elif codec == "mjpegdc":
                    from syncflux_spark.operators.mjpegdc import (
                        mjpeg_mp4_frames,
                    )

                    decoded = mjpeg_mp4_frames(b, every_n)
                else:
                    n_frames = max(1, (len(b) - 16) // 32)
                    decoded = [
                        (fi, b[16 + fi * 32 : 16 + fi * 32 + 32])
                        for fi in range(0, n_frames, every_n)
                    ]
                for fi, fb in decoded:
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(fb)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return spread_for_cpu(df).mapInPandas(kernel, FRAME_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, codec: str = "fake"
) -> DataFrame:
    """Resize stage: bytes → bytes at the model's input resolution —
    the classic pre-training normalization step (a real kernel would
    ``PIL.Image.resize`` / ``cv2.resize`` inside the batch loop). The
    stub rewrites the synthetic header to the target dims and scales
    the body length proportionally to the pixel-count ratio, which
    preserves the property a real resize has: output size tracks
    target area, not source area. Output rows keep the MEDIA binary
    shape so further stages (feature extraction, frame sampling)
    compose downstream of the resize. ``pil`` resizes the real image
    and re-encodes PNG."""
    _require_codec(codec)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            from io import BytesIO

            from PIL import Image

        for pdf in batches:
            ids, ws, hs, cs, outs = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                b = bytes(b)
                if codec == "pil":
                    im = Image.open(BytesIO(b)).resize((target_w, target_h))
                    buf = BytesIO()
                    im.save(buf, format="PNG")
                    ids.append(mid)
                    ws.append(target_w)
                    hs.append(target_h)
                    cs.append(len(im.getbands()))
                    outs.append(buf.getvalue())
                    continue
                _, _, c = struct.unpack("<III", b[:12])
                body = b[16:]
                n_out = max(32, (target_w * target_h * c) // 4096)
                scaled = (body * (n_out // max(1, len(body)) + 1))[:n_out]
                ids.append(mid)
                ws.append(target_w)
                hs.append(target_h)
                cs.append(c)
                outs.append(struct.pack("<III", target_w, target_h, c) + b"FAKE" + scaled)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "channels": cs,
                    "content": outs,
                }
            )

    return spread_for_cpu(df).mapInPandas(kernel, RESIZED_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — note the projection: ``length(content)``
    is computed in the scan and the bytes themselves never reach the
    aggregation shuffle."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.length("content")).alias("avg_bytes"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from the ``documents`` fixture: the
    utf-8 text bytes become the opaque payload behind the synthetic
    16-byte header (width/height derived deterministically from the
    id, so an oracle can recompute them without touching the bytes).
    This is the binary-ingest stand-in that lets the decode /
    frame-sample / feature plumbing run against driver testdata."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                w, h, c = 64 + int(did) % 8 * 16, 64 + int(did) % 5 * 32, 3
                content.append(
                    struct.pack("<III", w, h, c) + b"FAKE" + str(text).encode()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "doc-blob",
                    "content": content,
                    "source_uri": "synthetic://documents/" + pdf["doc_id"].astype(str),
                }
            )

    return spread_for_cpu(docs.select("doc_id", "text")).mapInPandas(
        kernel, MEDIA_SCHEMA
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def perceptual_hash(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Perceptual fingerprint stage: bytes → 64-bit pHash-style
    signature via block-mean thresholding — split the decoded payload
    into 64 blocks, bit i = (block-i mean > global mean). Identical
    payloads give identical hashes and small payload perturbations
    flip few bits, which is the property perceptual dedup needs
    (pair search within Hamming ≤ k reuses the same pigeonhole
    banding as operators/dedup.py::simhash_near_pairs — the hash is
    the only thing that changes). ``pil`` computes the classic 8×8
    average-hash over the grayscale image; the ``fake`` stub
    block-means the synthetic payload — same batch shape, same output
    type, deterministic. Like every media stage: Arrow-batched
    mapInPandas, bytes never survive past this projection."""
    _require_codec(codec)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            from io import BytesIO

            from PIL import Image

        for pdf in batches:
            hashes = []
            for b in pdf["content"]:
                if codec == "pil":
                    im = Image.open(BytesIO(bytes(b))).convert("L")
                    px = list(im.resize((8, 8)).getdata())
                    mean = sum(px) / 64.0
                    bits = 0
                    for i, p in enumerate(px):
                        if p > mean:
                            bits |= 1 << i
                    hashes.append(
                        bits - (1 << 64) if bits >= (1 << 63) else bits
                    )
                    continue
                body = bytes(b)[16:] or b"\x00"
                n = len(body)
                # 64 contiguous blocks (last one absorbs the remainder)
                step = max(1, n // 64)
                blocks = [body[i * step : (i + 1) * step] for i in range(63)]
                blocks.append(body[63 * step :])
                gmean = sum(body) / n
                bits = 0
                for i, blk in enumerate(blocks):
                    if blk and (sum(blk) / len(blk)) > gmean:
                        bits |= 1 << i
                # two's-complement into a signed long column
                hashes.append(bits - (1 << 64) if bits >= (1 << 63) else bits)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            )

    return spread_for_cpu(df).mapInPandas(kernel, PHASH_SCHEMA)


# -- audio ------------------------------------------------------------------

DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mean_rms", T.DoubleType()),
        T.StructField("mean_zcr", T.DoubleType()),
    ]
)

#: fake-codec PCM interpretation: everything after the 16-byte header
#: is signed 16-bit little-endian mono at this rate
FAKE_AUDIO_SR = 16_000


def _fake_pcm(b: bytes):
    """PCM samples of a fake-codec payload: content[16:] as s16le,
    odd trailing byte dropped."""
    import numpy as np

    body = bytes(b)[16:]
    return np.frombuffer(body[: len(body) - len(body) % 2], dtype="<i2")


def decode_audio(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stage for audio: bytes → (sample_rate, n_samples,
    duration). Arrow-batched ``mapInPandas``, same kernel contract as
    :func:`decode_images`. ``fake`` reads the payload after the
    16-byte header as s16le mono @16 kHz; ``wav`` parses real RIFF
    WAV bytes with the stdlib ``wave`` module — an actually-working
    real-codec branch (no third-party dependency), so the same
    plumbing decodes genuine recordings."""
    _require_codec(codec, supported=("fake", "wav"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "wav":
            import wave
            from io import BytesIO

        for pdf in batches:
            meta = []
            for b in pdf["content"]:
                if codec == "wav":
                    with wave.open(BytesIO(bytes(b))) as wf:
                        sr, n = wf.getframerate(), wf.getnframes()
                else:
                    sr, n = FAKE_AUDIO_SR, len(_fake_pcm(b))
                meta.append((sr, n, n / float(sr), len(bytes(b))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [m[0] for m in meta],
                    "n_samples": [m[1] for m in meta],
                    "duration_s": [m[2] for m in meta],
                    "n_bytes": [m[3] for m in meta],
                }
            )

    return spread_for_cpu(df).mapInPandas(kernel, DECODED_AUDIO_SCHEMA)


def audio_frames(
    df: DataFrame, frame_len: int = 512, hop: int = 256, codec: str = "fake"
) -> DataFrame:
    """Framing stage: 1→N expansion of each clip into fixed-length
    PCM windows (``frame_len`` samples every ``hop``) — the audio
    analog of video frame sampling, and the unit every downstream
    audio featurizer consumes. Only FULL windows are emitted. Frame
    bytes stay s16le, so frames re-enter any audio kernel."""
    _require_codec(codec, supported=("fake",))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                pcm = _fake_pcm(b)
                for j, start in enumerate(
                    range(0, len(pcm) - frame_len + 1, hop)
                ):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(pcm[start : start + frame_len].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return spread_for_cpu(df).mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("rms_micro", T.LongType()),
        T.StructField("zcr_micro", T.LongType()),
    ]
)


def audio_frame_features(
    df: DataFrame,
    frame_len: int = 512,
    hop: int = 256,
    codec: str = "fake",
    spread: bool = True,
) -> DataFrame:
    """Per-FRAME features quantized to integer micros — the
    oracle-hashable stage under :func:`audio_features`: RMS energy
    and zero-crossing rate per 1→N expanded window, each rounded
    half-away to parts-per-million int64 inside the kernel (numpy
    over the Arrow batch). Downstream per-clip means become pure
    integer SUM / COUNT aggregations that any engine replays exactly
    — this is the table mm_audio_features persists to the oracle
    handshake dir (the mm_feature_knn pattern). Zero-frame clips emit
    zero rows here; callers re-attach them by left join.

    ``spread=False`` skips the CPU-spreading repartition — pass it
    when ``df`` is already spread (e.g. fresh out of
    :func:`media_from_documents`), so the two Arrow kernels chain in
    one stage instead of paying an exchange between them."""
    _require_codec(codec, supported=("fake",))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, rms_l, zcr_l = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                pcm = _fake_pcm(b).astype(np.float64) / 32768.0
                n_frames = max(0, (len(pcm) - frame_len) // hop + 1)
                if n_frames == 0:
                    continue
                starts = np.arange(n_frames) * hop
                idx = starts[:, None] + np.arange(frame_len)[None, :]
                fr = pcm[idx]
                rms = np.sqrt((fr * fr).mean(axis=1))
                zc = (np.signbit(fr[:, 1:]) != np.signbit(fr[:, :-1])).mean(
                    axis=1
                )
                ids.extend([mid] * n_frames)
                idxs.extend(range(n_frames))
                # half-away rounding (values are nonnegative)
                rms_l.extend(np.floor(rms * 1e6 + 0.5).astype(np.int64))
                zcr_l.extend(np.floor(zc * 1e6 + 0.5).astype(np.int64))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "rms_micro": rms_l,
                    "zcr_micro": zcr_l,
                }
            )

    src = spread_for_cpu(df) if spread else df
    return src.mapInPandas(kernel, AUDIO_FRAME_FEATURE_SCHEMA)


def audio_features(
    df: DataFrame, frame_len: int = 512, hop: int = 256, codec: str = "fake"
) -> DataFrame:
    """Feature stage: per-clip mean frame RMS energy and mean
    zero-crossing rate — the classic cheap audio quality/speechiness
    signals, computed vectorized (numpy over the Arrow batch, no
    per-sample Python). Clips with no full frame emit zero frames
    and NaN-free zero features. A real featurizer (log-mel, wav2vec)
    slots into the same batch loop with the same output contract."""
    _require_codec(codec, supported=("fake",))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                pcm = _fake_pcm(b).astype(np.float64) / 32768.0
                n_frames = max(0, (len(pcm) - frame_len) // hop + 1)
                if n_frames == 0:
                    out.append((mid, 0, 0.0, 0.0))
                    continue
                starts = np.arange(n_frames) * hop
                idx = starts[:, None] + np.arange(frame_len)[None, :]
                fr = pcm[idx]
                rms = np.sqrt((fr * fr).mean(axis=1))
                zc = (np.signbit(fr[:, 1:]) != np.signbit(fr[:, :-1])).mean(
                    axis=1
                )
                out.append(
                    (mid, n_frames, float(rms.mean()), float(zc.mean()))
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_frames", "mean_rms", "mean_zcr"]
            )

    return spread_for_cpu(df).mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)
