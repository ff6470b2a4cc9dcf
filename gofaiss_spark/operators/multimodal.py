"""Multimodal columns: binary payloads + typed metadata at scale.

The reference is vectors-only; this extends the engine for
training-data pipelines (image/audio/video corpora) per the
north-star surface (SURVEY.md §7 phase E). Design rules:

- payloads are opaque ``BINARY`` columns with a ``modality`` tag and
  a ``meta MAP<STRING,STRING>`` of typed attributes — the schema a
  100 TB multimodal lakehouse actually uses (content-addressed blobs
  inline or as object-store pointers);
- all per-payload compute runs Arrow-batched in ``mapInPandas`` —
  never per-row Python;
- REAL codec work (JPEG decode, resampling, frame extraction) needs
  image/video libs that are NOT in this environment, so those decode
  kernels are pluggable: ``decoder="fake"`` is a deterministic
  bytes→features stub (documented, test-covered) and the library
  paths raise ``NotImplementedError`` at *call* time (driver-side,
  not mid-job). The Spark-side plumbing — schema, batching, fan-out
  cardinality, partitioning — is real and tested either way.
- AUDIO is the exception (round 9): WAV decode needs only the stdlib
  ``wave`` module, so ``wav_features`` is a REAL bytes→signal→
  features codec path (RIFF header parse + int16 PCM decode), not a
  stub.
- IMAGE joined it in round 10: uncompressed 24-bit BMP needs only
  ``struct`` + numpy, so ``bmp_features`` (container parse → pixel
  decode → mean-RGB / luma histogram) and ``resize_images`` (nearest-
  neighbor resample + BMP re-encode) are REAL codec paths.
- VIDEO joined in round 11: uncompressed RIFF AVI is a chunk tree of
  fixed-layout structs whose frame payloads are the SAME DIB pixel
  arrays the BMP path decodes, so ``avi_features`` (RIFF chunk walk →
  per-frame decode → channel/luma means + consecutive-frame motion)
  is a REAL codec path too.
- PNG joined in round 12 — the first COMPRESSED format: DEFLATE is
  stdlib ``zlib``, leaving the CRC-checked chunk walk and the 5
  scanline-filter reconstructions (pure numpy), so ``png_features``
  is a REAL compressed-image codec path, cross-validated both
  directions against Java ImageIO. The ``NotImplementedError`` seam
  is now LOSSY formats only (JPEG → Pillow, MP3/FLAC → soundfile,
  H.264 → a real video lib).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("text", "image", "audio", "video")

#: canonical multimodal corpus schema
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _require_decoder(decoder: str) -> None:
    """Driver-side gate: fail fast (and clearly) before any job runs."""
    if decoder == "fake":
        return
    if decoder == "image":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='image' needs Pillow (not installed here) for "
                "compressed formats; uncompressed 24-bit BMP has a REAL "
                "stdlib codec path — use bmp_features() / "
                "resize_images(decoder='bmp'); decoder='fake' covers the "
                "generic plumbing path"
            ) from e
        return
    if decoder == "audio":
        try:
            import soundfile  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='audio' needs soundfile/librosa (not installed "
                "here) for compressed formats; WAV has a REAL stdlib codec "
                "path — use wav_features(); decoder='fake' covers the "
                "generic plumbing path"
            ) from e
        return
    raise ValueError(f"unknown decoder {decoder!r} (expected fake|image|audio)")


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic bytes→R^dim stub for the decode+embed kernel.

    blake2b(payload) seeds a PRNG that emits a unit-norm vector —
    stable across processes/runs (unlike Python ``hash``), so tests
    and oracles can rely on it. A real deployment swaps this for a
    model forward pass; the Spark plan does not change.
    """
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "big"))
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def extract_features(
    df: DataFrame,
    dim: int = 64,
    decoder: str = "fake",
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """(id, modality, features ARRAY<FLOAT>[dim], n_bytes) per payload.

    Arrow-batched; one task per input partition — scales with the
    corpus, no driver involvement. This is the decode→embed stage of
    a multimodal ingest pipeline; downstream it feeds the ANN indexes
    (operators/{flat,ivf,ivfpq,lsh}) and embedding dedup
    (operators/dedup.embedding_near_dup_pairs).
    """
    _require_decoder(decoder)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col("modality"),
        F.col(content_col).alias("content"),
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                _fake_features(bytes(b) if b is not None else b"", dim)
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "modality": pdf["modality"],
                    "features": feats,
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf["content"]
                    ],
                }
            )

    return base.mapInPandas(
        part, schema="id long, modality string, features array<float>, n_bytes long"
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Frame sampling for video payloads: 1-to-many fan-out.

    The payload is treated as ``n_frames`` equal byte slices (the
    deterministic stand-in for a real container demuxer — the fan-out
    cardinality, schema, and batching are what a PyAV version would
    share). Emits (id, frame_idx, frame BINARY) for every
    ``every_n``-th frame. ``meta['n_frames']`` is required.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(content_col).alias("content"),
        F.col("meta").getItem("n_frames").cast("int").alias("n_frames"),
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["content"]) if row["content"] is not None else b""
                n = int(row["n_frames"]) if not pd.isna(row["n_frames"]) else 0
                if n <= 0 or not payload:
                    continue
                size = max(len(payload) // n, 1)
                for fi in range(0, n, every_n):
                    ids.append(row["id"])
                    idxs.append(fi)
                    frames.append(payload[fi * size : (fi + 1) * size])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return base.mapInPandas(part, schema="id long, frame_idx int, frame binary")


def synth_wav(
    df: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Deterministic synthetic WAV payloads keyed on ``id`` — the test
    corpus generator for the real audio codec path. Per id ``d``:
    sample rate ``8000 + (d%3)*4000`` Hz, ``1 + d%2`` channels,
    ``100 + d%50`` frames, interleaved int16 values
    ``v_j = (d*31 + j*7) % 2001 - 1000``. Every field is an analytic
    function of ``d``, so a SQL oracle can recompute the features
    that `wav_features` extracts from the ENCODED bytes — the
    encode→decode round trip through the stdlib ``wave`` RIFF codec
    is what the driver row actually verifies. Arrow-batched; one
    task per input partition."""
    import io
    import wave as wave_mod

    base = df.select(F.col(id_col).alias("id"))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for d in pdf["id"].to_numpy(dtype=np.int64):
                d = int(d)
                rate = 8000 + (d % 3) * 4000
                channels = 1 + d % 2
                frames = 100 + d % 50
                j = np.arange(frames * channels, dtype=np.int64)
                vals = ((d * 31 + j * 7) % 2001 - 1000).astype("<i2")
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as w:
                    w.setnchannels(channels)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(vals.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "modality": "audio",
                    "content": payloads,
                }
            )

    return base.mapInPandas(
        part, schema="id long, modality string, content binary"
    )


def wav_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """REAL audio decode: WAV (RIFF) bytes → per-clip signal features
    via the stdlib ``wave`` module — no external codec libs needed,
    so unlike the image/video seams this path parses actual container
    bytes end-to-end. Emits
    (id, sample_rate, n_channels, n_samples, duration_us, rms,
    peak_abs) where ``n_samples`` is frames per channel,
    ``duration_us`` is exact integer microseconds (floor — float
    seconds round-tie differently across engines), ``rms`` is over
    all interleaved int16 samples (6dp) and ``peak_abs`` is
    ``max(|sample|)``. Arrow-batched in ``mapInPandas``, one task per
    partition — the decode kernel a 100 TB audio corpus would run,
    with this function's body swapped for a resampling/fbank kernel.
    Unparseable or empty payloads are dropped (poison-blob tolerance:
    a corrupt clip must not kill the ingest job)."""
    import io
    import wave as wave_mod

    base = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "id": [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "duration_us": [], "rms": [],
                "peak_abs": [],
            }
            for i, payload in zip(
                pdf["id"].to_numpy(dtype=np.int64), pdf["content"]
            ):
                if payload is None:
                    continue
                try:
                    with wave_mod.open(io.BytesIO(bytes(payload))) as w:
                        rate = w.getframerate()
                        channels = w.getnchannels()
                        width = w.getsampwidth()
                        frames = w.getnframes()
                        raw = w.readframes(frames)
                except (wave_mod.Error, EOFError):
                    continue
                if width != 2 or frames == 0:
                    continue
                sig = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                rows["id"].append(int(i))
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(channels)
                rows["n_samples"].append(frames)
                rows["duration_us"].append(frames * 1_000_000 // rate)
                rows["rms"].append(round(float(np.sqrt(np.mean(sig * sig))), 6))
                rows["peak_abs"].append(int(np.abs(sig).max()))
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        part,
        schema=(
            "id long, sample_rate int, n_channels int, n_samples long, "
            "duration_us long, rms double, peak_abs long"
        ),
    )


# --- REAL image codec path (round 10): uncompressed 24-bit BMP -------
#
# BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows,
# 4-byte row stride) is fully specified by two fixed-layout structs —
# parseable with stdlib ``struct`` + numpy, no Pillow. Same role as
# the WAV path one section up: the decode kernel a 100 TB image
# corpus runs, with the body swapped for a JPEG/resize kernel when a
# real codec lib is present. Reference analogue: external-payload
# ingest (examples/kaggle_foodpanda_reviews/main.go:26-48).

_BMP_HEADER_BYTES = 54  # 14 (file header) + 40 (BITMAPINFOHEADER)


def encode_bmp(img_bgr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 BGR, row 0 = TOP → uncompressed 24-bit BMP
    bytes (bottom-up pixel array, rows padded to 4 bytes)."""
    import struct

    h, w, c = img_bgr.shape
    if c != 3:
        raise ValueError(f"encode_bmp needs (h, w, 3) BGR, got {img_bgr.shape}")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img_bgr[::-1].reshape(h, w * 3)  # bottom-up
    pix = rows.tobytes()
    return (
        struct.pack("<2sIHHI", b"BM", _BMP_HEADER_BYTES + len(pix), 0, 0,
                    _BMP_HEADER_BYTES)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                      2835, 2835, 0, 0)
        + pix
    )


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 BGR with row 0
    = TOP (both bottom-up ``height>0`` and top-down ``height<0`` pixel
    arrays are handled). Returns ``None`` for anything unparseable or
    unsupported (other bpp / compressed BMP) — poison-blob tolerance:
    one corrupt image must not kill an ingest job."""
    import struct

    if len(payload) < _BMP_HEADER_BYTES or payload[:2] != b"BM":
        return None
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr, w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hdr < 40 or bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    if offset < _BMP_HEADER_BYTES or len(payload) < offset + stride * h:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)
    return np.ascontiguousarray(img[::-1] if h_signed > 0 else img)


def synth_bmp(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic synthetic BMP payloads keyed on ``id`` — the test
    corpus generator for the real image codec path (the image twin of
    ``synth_wav``). Per id ``d``: width ``4 + d%5``, height
    ``3 + d%4``, and at image coordinate (x, y) (y=0 is the top row)
    the channels are ``r=(7d+3x+5y)%256``, ``g=(11d+5x+7y)%256``,
    ``b=(13d+7x+3y)%256`` — every pixel an analytic function of
    ``d``, so a SQL oracle can recompute the features
    ``bmp_features`` extracts from the ENCODED container bytes; the
    encode→decode round trip through the real BMP codec (bottom-up
    row order, BGR byte order, 4-byte stride padding) is what the
    driver row verifies. Arrow-batched; one task per partition."""
    base = df.select(F.col(id_col).alias("id"))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for d in pdf["id"].to_numpy(dtype=np.int64):
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                r = (7 * d + 3 * x + 5 * y) % 256
                g = (11 * d + 5 * x + 7 * y) % 256
                b = (13 * d + 7 * x + 3 * y) % 256
                img = np.stack(
                    [b, g, r], axis=-1).astype(np.uint8)  # BGR
                payloads.append(encode_bmp(img))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "modality": "image",
                    "content": payloads,
                }
            )

    return base.mapInPandas(
        part, schema="id long, modality string, content binary"
    )


def bmp_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """REAL image decode: BMP container bytes → per-image pixel
    features, no external codec libs. Emits (id, width, height,
    mean_r, mean_g, mean_b, luma_mean, luma_h0..luma_h3) where the
    means are exact ``integer_sum / n_pixels`` doubles (bit-stable
    across engines — no rounding needed: channel sums are exact
    integers ≪ 2^53), luma is the INTEGER rec-601 approximation
    ``(299r + 587g + 114b) // 1000`` per pixel, and ``luma_h0..h3``
    is its 4-bin histogram (bin = luma // 64). Arrow-batched in
    ``mapInPandas``; unparseable payloads are dropped."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "luma_mean": [],
                "luma_h0": [], "luma_h1": [], "luma_h2": [], "luma_h3": [],
            }
            for i, payload in zip(
                pdf["id"].to_numpy(dtype=np.int64), pdf["content"]
            ):
                if payload is None:
                    continue
                img = decode_bmp(bytes(payload))
                if img is None:
                    continue
                h, w = img.shape[:2]
                n = h * w
                bgr = img.reshape(n, 3).astype(np.int64)
                b, g, r = bgr[:, 0], bgr[:, 1], bgr[:, 2]
                luma = (299 * r + 587 * g + 114 * b) // 1000
                hist = np.bincount(luma // 64, minlength=4)
                rows["id"].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(float(int(r.sum())) / n)
                rows["mean_g"].append(float(int(g.sum())) / n)
                rows["mean_b"].append(float(int(b.sum())) / n)
                rows["luma_mean"].append(float(int(luma.sum())) / n)
                for bin_ in range(4):
                    rows[f"luma_h{bin_}"].append(int(hist[bin_]))
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        part,
        schema=(
            "id long, width int, height int, mean_r double, "
            "mean_g double, mean_b double, luma_mean double, "
            "luma_h0 long, luma_h1 long, luma_h2 long, luma_h3 long"
        ),
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: str = "bmp",
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Image resize. ``decoder="bmp"`` (default) is a REAL path:
    decode the BMP container, nearest-neighbor resample to
    (width, height) — source pixel ``floor((i + 0.5) * src / dst)``
    per axis, the classic grid-center mapping, pure numpy fancy
    indexing — and re-encode as BMP. Emits (id, content BINARY) of
    the resized images; unparseable payloads are dropped.
    ``decoder="image"`` (Pillow, for compressed formats) remains the
    documented NotImplementedError seam in this environment."""
    if width < 1 or height < 1:
        raise ValueError("width/height must be >= 1")
    if decoder != "bmp":
        _require_decoder(decoder)
        raise AssertionError("unreachable in this environment")  # pragma: no cover
    base = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i, payload in zip(
                pdf["id"].to_numpy(dtype=np.int64), pdf["content"]
            ):
                if payload is None:
                    continue
                img = decode_bmp(bytes(payload))
                if img is None:
                    continue
                src_h, src_w = img.shape[:2]
                xs = ((np.arange(width) + 0.5) * src_w / width).astype(
                    np.int64).clip(0, src_w - 1)
                ys = ((np.arange(height) + 0.5) * src_h / height).astype(
                    np.int64).clip(0, src_h - 1)
                ids.append(int(i))
                payloads.append(encode_bmp(img[ys][:, xs]))
            yield pd.DataFrame({"id": ids, "content": payloads})

    return base.mapInPandas(part, schema="id long, content binary")


# --- REAL video codec path (round 11): uncompressed RIFF AVI ---------
#
# An uncompressed AVI is three fixed-layout RIFF pieces — a header
# LIST (avih + per-stream strh/strf), a ``movi`` LIST of raw DIB
# frame chunks (the SAME bottom-up BGR stride-padded pixel array the
# r10 BMP decoder parses, minus the BMP file header), and an optional
# idx1 — all parseable with stdlib ``struct`` + numpy, no codec lib.
# Same move r9 made for audio (WAV) and r10 for image (BMP): the
# NotImplementedError seam shrinks to COMPRESSED formats only
# (JPEG/PNG, MP3/FLAC, H.264). Reference analogue: external-payload
# ingest, examples/kaggle_foodpanda_reviews/main.go:26-48.

_AVI_FOURCC_VIDS = b"vids"


def encode_avi(frames: list[np.ndarray], micro_sec_per_frame: int = 100_000) -> bytes:
    """List of (h, w, 3) uint8 BGR frames (row 0 = TOP, all the same
    shape) → uncompressed 24-bit RIFF AVI bytes: hdrl (avih + one
    'vids'/'DIB ' stream), movi with one ``00db`` chunk per frame
    (bottom-up rows padded to 4-byte stride), and an idx1 index."""
    import struct

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError(f"encode_avi needs (h, w, 3) BGR, got {frames[0].shape}")
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one (h, w, 3) shape")
    # ADVICE r11: validate the header-field domains up front instead
    # of dying in struct.pack — rcFrame packs w/h as '<H' (<= 65535)
    # and dwMicroSecPerFrame as '<I'
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(
            f"encode_avi frame size {w}x{h} out of range: AVI rcFrame "
            f"stores width/height as uint16 (1..65535)")
    if not (1 <= int(micro_sec_per_frame) <= 0xFFFFFFFF):
        raise ValueError(
            f"micro_sec_per_frame must be in 1..2^32-1 (got "
            f"{micro_sec_per_frame})")
    stride = (w * 3 + 3) // 4 * 4
    frame_bytes = stride * h

    def dib(img: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1].reshape(h, w * 3)  # bottom-up
        return rows.tobytes()

    n = len(frames)
    # dwMaxBytesPerSec is advisory — clamp instead of overflowing the
    # '<I' field at small spf / large frames (ADVICE r11)
    max_bps = min(frame_bytes * 1_000_000 // max(int(micro_sec_per_frame), 1),
                  0xFFFFFFFF)
    avih = struct.pack(
        "<14I", int(micro_sec_per_frame), max_bps,
        0, 0x10,  # dwPaddingGranularity, AVIF_HASINDEX
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        _AVI_FOURCC_VIDS, b"DIB ", 0, 0, 0, 0,
        int(micro_sec_per_frame), 1_000_000,  # dwScale/dwRate = spf
        0, n, frame_bytes, 0, 0, 0, 0, w, h)
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + \
        b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh + \
        b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + \
        b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    movi_chunks = b"".join(
        b"00db" + struct.pack("<I", frame_bytes) + dib(f) for f in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_chunks)) + \
        b"movi" + movi_chunks
    idx1_entries = b"".join(
        struct.pack("<4sIII", b"00db", 0x10,
                    4 + i * (8 + frame_bytes), frame_bytes)
        for i in range(n))
    idx1 = b"idx1" + struct.pack("<I", len(idx1_entries)) + idx1_entries
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes):
    """Uncompressed 24-bit RIFF AVI bytes → (frames, micro_sec_per_
    frame) where ``frames`` is a list of (h, w, 3) uint8 BGR arrays
    with row 0 = TOP. Walks the RIFF chunk tree (hdrl for dims +
    frame timing, movi for ``00db``/``00dc`` DIB chunks; both
    bottom-up ``height>0`` and top-down ``height<0`` strf arrays are
    handled). Returns ``None`` for anything unparseable, compressed,
    or non-24bpp — poison-blob tolerance: one corrupt video must not
    kill an ingest job."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None

    def chunks(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            data_end = pos + 8 + size
            if data_end > end:
                return
            yield cid, pos + 8, data_end
            pos = data_end + (size & 1)  # RIFF chunks are word-aligned

    w = h_signed = None
    spf = 0
    vids_no = None  # the FIRST vids stream's index in strl order
    stream_no = 0
    dib_spans: list[tuple[bytes, int, int]] = []
    for cid, s, e in chunks(payload, 12, len(payload)):
        if cid != b"LIST" or e - s < 4:
            continue
        kind = payload[s:s + 4]
        if kind == b"hdrl":
            for c2, s2, e2 in chunks(payload, s + 4, e):
                if c2 == b"avih" and e2 - s2 >= 4:
                    (spf,) = struct.unpack_from("<I", payload, s2)
                elif c2 == b"LIST" and payload[s2:s2 + 4] == b"strl":
                    # streams are numbered by strl order (ADVICE r11:
                    # movi chunks are accepted only when their
                    # two-digit prefix matches the vids stream, so a
                    # second stream's '01wb'/'01dc' chunks can no
                    # longer interleave into the frame sequence)
                    is_vids = False
                    for c3, s3, e3 in chunks(payload, s2 + 4, e2):
                        if c3 == b"strh" and e3 - s3 >= 8:
                            is_vids = (
                                vids_no is None
                                and payload[s3:s3 + 4] == _AVI_FOURCC_VIDS)
                        elif c3 == b"strf" and is_vids and e3 - s3 >= 40:
                            _hdr, w, h_signed, _pl, bpp, comp = \
                                struct.unpack_from("<IiiHHI", payload, s3)
                            if bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
                                return None
                            vids_no = stream_no
                    stream_no += 1
        elif kind == b"movi":
            for c2, s2, e2 in chunks(payload, s + 4, e):
                if c2[2:4] in (b"db", b"dc"):
                    dib_spans.append((c2[:2], s2, e2))
    if w is None or h_signed is None or vids_no is None:
        return None
    want = b"%02d" % vids_no
    spans = [(s, e) for p, s, e in dib_spans if p == want]
    if not spans:
        return None
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for s, e in spans:
        if e - s < stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=s
        ).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)
        frames.append(np.ascontiguousarray(
            img[::-1] if h_signed > 0 else img))
    return frames, int(spf)


def synth_avi(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic synthetic AVI payloads keyed on ``id`` — the
    video twin of ``synth_bmp``/``synth_wav``. Per id ``d``: width
    ``4 + d%5``, height ``3 + d%4``, ``2 + d%3`` frames at 10 fps,
    and at (x, y) of frame ``t`` (y=0 top row) the channels are
    ``r=(7d+3x+5y+17t)%256``, ``g=(11d+5x+7y+19t)%256``,
    ``b=(13d+7x+3y+23t)%256`` — every pixel of every frame an
    analytic function of ``d``, so a SQL oracle can recompute the
    features ``avi_features`` extracts from the ENCODED container;
    the encode→decode round trip through the real RIFF/DIB codec
    (chunk walking, bottom-up rows, BGR order, stride padding, frame
    ordering) is what the driver row verifies."""
    base = df.select(F.col(id_col).alias("id"))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for d in pdf["id"].to_numpy(dtype=np.int64):
                d = int(d)
                w, h, nf = 4 + d % 5, 3 + d % 4, 2 + d % 3
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                frames = []
                for t in range(nf):
                    r = (7 * d + 3 * x + 5 * y + 17 * t) % 256
                    g = (11 * d + 5 * x + 7 * y + 19 * t) % 256
                    b = (13 * d + 7 * x + 3 * y + 23 * t) % 256
                    frames.append(
                        np.stack([b, g, r], axis=-1).astype(np.uint8))
                payloads.append(encode_avi(frames))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "modality": "video",
                    "content": payloads,
                }
            )

    return base.mapInPandas(
        part, schema="id long, modality string, content binary"
    )


def avi_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """REAL video decode: AVI container bytes → per-video features,
    no external codec libs. Emits (id, width, height, n_frames,
    duration_us, mean_r, mean_g, mean_b, luma_mean, motion_mean)
    where the channel/luma means are exact ``integer_sum / n_pixels``
    doubles over ALL frames (luma = integer rec-601
    ``(299r+587g+114b) // 1000``) and ``motion_mean`` is the mean
    per-pixel absolute luma difference between consecutive frames —
    the temporal feature a frame-dedup / scene-cut pipeline keys on.
    Arrow-batched in ``mapInPandas``; unparseable payloads are
    dropped."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "id": [], "width": [], "height": [], "n_frames": [],
                "duration_us": [], "mean_r": [], "mean_g": [],
                "mean_b": [], "luma_mean": [], "motion_mean": [],
            }
            for i, payload in zip(
                pdf["id"].to_numpy(dtype=np.int64), pdf["content"]
            ):
                if payload is None:
                    continue
                got = decode_avi(bytes(payload))
                if got is None:
                    continue
                frames, spf = got
                h, w = frames[0].shape[:2]
                nf = len(frames)
                stack = np.stack(frames).astype(np.int64)  # (nf,h,w,3)
                b, g, r = stack[..., 0], stack[..., 1], stack[..., 2]
                luma = (299 * r + 587 * g + 114 * b) // 1000
                n = nf * h * w
                rows["id"].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["duration_us"].append(nf * spf)
                rows["mean_r"].append(float(int(r.sum())) / n)
                rows["mean_g"].append(float(int(g.sum())) / n)
                rows["mean_b"].append(float(int(b.sum())) / n)
                rows["luma_mean"].append(float(int(luma.sum())) / n)
                if nf > 1:
                    diff = np.abs(luma[1:] - luma[:-1])
                    rows["motion_mean"].append(
                        float(int(diff.sum())) / ((nf - 1) * h * w))
                else:
                    rows["motion_mean"].append(0.0)
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        part,
        schema=(
            "id long, width int, height int, n_frames int, "
            "duration_us long, mean_r double, mean_g double, "
            "mean_b double, luma_mean double, motion_mean double"
        ),
    )


def avi_frames(
    df: DataFrame,
    every_nth: int = 1,
    max_frames: int | None = None,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """REAL video→image frame extraction: decode the AVI container,
    take every ``every_nth``-th frame (capped at ``max_frames`` per
    video when set), re-encode each as a standalone BMP — the
    fan-out step a multimodal corpus runs before image-side dedup /
    feature extraction (each output row feeds ``bmp_features`` or
    ``resize_images`` unchanged). Emits (id, frame_idx, width,
    height, content BINARY). Arrow-batched in ``mapInPandas``;
    unparseable payloads are dropped. Fan-out cardinality is bounded
    by every_nth/max_frames — the knob that keeps the exploded table
    a controlled multiple of the video table at 100 TB."""
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    base = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "id": [], "frame_idx": [], "width": [], "height": [],
                "content": [],
            }
            for i, payload in zip(
                pdf["id"].to_numpy(dtype=np.int64), pdf["content"]
            ):
                if payload is None:
                    continue
                got = decode_avi(bytes(payload))
                if got is None:
                    continue
                frames, _spf = got
                taken = 0
                for t in range(0, len(frames), every_nth):
                    if max_frames is not None and taken >= max_frames:
                        break
                    img = frames[t]
                    h, w = img.shape[:2]
                    rows["id"].append(int(i))
                    rows["frame_idx"].append(t)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["content"].append(encode_bmp(img))
                    taken += 1
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        part,
        schema=(
            "id long, frame_idx int, width int, height int, "
            "content binary"
        ),
    )


# ---------------------------------------------------------------------
# PNG — the FIRST compressed-format codec (round 12, r11 verdict item
# 6). Unlike BMP/WAV/AVI (raw pixel/sample containers), PNG is a real
# compressed format: DEFLATE (stdlib zlib) under per-scanline
# prediction filters. The implementation is the spec (RFC 2083 /
# PNG 1.2): CRC-checked chunk walk (IHDR/IDAT*/IEND), zlib inflate,
# and the 5 filter reconstructions (None/Sub/Up/Average/Paeth) in
# numpy. Profile: 8-bit truecolor (color type 2), non-interlaced —
# anything else decodes to None (poison tolerance). Cross-validated
# BOTH directions against Java ImageIO (an independent codec, shipped
# with the JDK this repo already requires): our encoder's output
# decodes in ImageIO, ImageIO's output decodes here, pixels exact —
# tests/test_multimodal.py::test_png_java_imageio_cross_validation.
# The NotImplementedError seam is now LOSSY formats only
# (JPEG/MP3/H.264). Reference analogue: external-payload ingest,
# examples/kaggle_foodpanda_reviews/main.go:26-48.
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Element-wise Paeth predictor (PNG 1.2 §6.6) on int32 inputs:
    pick whichever of left/up/up-left is closest to a+b-c, ties
    breaking left, then up."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c))


def encode_png(img_rgb: np.ndarray, row_filters=None) -> bytes:
    """(h, w, 3) uint8 RGB, row 0 = TOP → 8-bit truecolor PNG bytes.
    ``row_filters``: per-row scanline filter types (0..4); default
    row ``y`` uses ``y % 5`` so every filter is exercised by
    construction. All five filter transforms are computed vectorized
    from the raw image (encode-side predictors need no sequential
    reconstruction)."""
    import struct
    import zlib

    h, w, c = img_rgb.shape
    if c != 3:
        raise ValueError(
            f"encode_png needs (h, w, 3) RGB, got {img_rgb.shape}")
    img = np.ascontiguousarray(img_rgb, dtype=np.uint8)
    if row_filters is None:
        row_filters = [y % 5 for y in range(h)]
    raw = img.reshape(h, w * 3).astype(np.int32)
    zero = np.zeros((1, w * 3), dtype=np.int32)
    prior = np.vstack([zero, raw[:-1]])          # b (up)
    left = np.zeros_like(raw)                    # a (left, bpp=3)
    left[:, 3:] = raw[:, :-3]
    upleft = np.zeros_like(raw)                  # c (up-left)
    upleft[:, 3:] = prior[:, :-3]
    filtered = {
        0: raw,
        1: raw - left,
        2: raw - prior,
        3: raw - ((left + prior) >> 1),
        4: raw - _paeth_predict(left, prior, upleft),
    }
    out = bytearray()
    for y in range(h):
        ft = int(row_filters[y])
        if not 0 <= ft <= 4:
            raise ValueError(f"filter type {ft} out of range 0..4")
        out.append(ft)
        out += (filtered[ft][y] & 0xFF).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray | None:
    """8-bit truecolor, non-interlaced PNG bytes → (h, w, 3) uint8
    RGB with row 0 = TOP. Returns ``None`` for anything unparseable,
    CRC-corrupt, truncated, or outside that profile (palette/alpha/
    16-bit/interlaced) — poison-blob tolerance: one corrupt image
    must not kill an ingest job. Multiple IDAT chunks are
    concatenated per spec. Filter reconstruction: None/Up fully
    vectorized per row; Sub is an exact prefix-sum mod 256 per
    channel (``np.cumsum & 0xFF``); Average/Paeth carry a true
    left-pixel dependency, so they run one vectorized step per pixel
    COLUMN (w steps/row over 3-channel vectors) — fine at metadata-
    thumbnail sizes, and the per-blob cost is embarrassingly parallel
    across the corpus in ``mapInPandas`` either way."""
    import struct
    import zlib

    if len(payload) < len(_PNG_SIG) + 12 or payload[:8] != _PNG_SIG:
        return None
    pos = 8
    w = h = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > len(payload):
            return None
        data = payload[pos + 8:data_end]
        (crc,) = struct.unpack_from(">I", payload, data_end)
        if crc != zlib.crc32(ctype + data):
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data)
            if (depth != 8 or color != 2 or comp != 0 or filt != 0
                    or inter != 0 or w <= 0 or h <= 0):
                return None
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos = data_end + 4
    if w is None or not idat or not seen_iend:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * 3
    if len(raw) != h * (stride + 1):
        return None
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = buf[:, 0]
    if (ftypes > 4).any():
        return None
    lines = buf[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(ftypes[y])
        line = lines[y].astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prior) & 0xFF
        elif ft == 1:
            rec = np.cumsum(line.reshape(w, 3), axis=0,
                            dtype=np.int64).reshape(stride) & 0xFF
        else:
            pr = prior.reshape(w, 3)
            f = line.reshape(w, 3)
            rec2 = np.zeros((w, 3), dtype=np.int32)
            a = np.zeros(3, dtype=np.int32)   # left pixel
            cc = np.zeros(3, dtype=np.int32)  # up-left pixel
            if ft == 3:
                for x in range(w):
                    a = (f[x] + ((a + pr[x]) >> 1)) & 0xFF
                    rec2[x] = a
            else:  # ft == 4 (Paeth)
                for x in range(w):
                    a = (f[x] + _paeth_predict(a, pr[x], cc)) & 0xFF
                    rec2[x] = a
                    cc = pr[x]
            rec = rec2.reshape(stride)
        out[y] = rec.astype(np.uint8)
        prior = rec.astype(np.int32)
    return out.reshape(h, w, 3)


def synth_png(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic synthetic PNG payloads keyed on ``id`` — the
    compressed-format twin of ``synth_bmp``. Per id ``d``: width
    ``5 + d%6``, height ``4 + d%5``, and at (x, y) (y=0 top) the
    channels are ``r=(17d+5x+3y)%256``, ``g=(19d+7x+5y)%256``,
    ``b=(23d+3x+7y)%256`` (DIFFERENT formulas than the BMP row, so
    the two driver rows verify independent payloads); row ``y`` is
    encoded with scanline filter ``(y + d) % 5``, so the corpus
    exercises every PNG filter. A SQL oracle recomputes the features
    ``png_features`` extracts from the COMPRESSED container bytes —
    the decode path (chunk walk, CRC, inflate, filter recon) is what
    the driver row verifies. Arrow-batched; one task per partition."""
    base = df.select(F.col(id_col).alias("id"))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for d in pdf["id"].to_numpy(dtype=np.int64):
                d = int(d)
                w, h = 5 + d % 6, 4 + d % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                r = (17 * d + 5 * x + 3 * y) % 256
                g = (19 * d + 7 * x + 5 * y) % 256
                b = (23 * d + 3 * x + 7 * y) % 256
                img = np.stack([r, g, b], axis=-1).astype(np.uint8)
                payloads.append(encode_png(
                    img, [(yy + d) % 5 for yy in range(h)]))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "modality": "image",
                    "content": payloads,
                }
            )

    return base.mapInPandas(
        part, schema="id long, modality string, content binary"
    )


def png_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """REAL compressed-image decode: PNG container bytes → per-image
    pixel features, no external codec libs (stdlib zlib inflate +
    numpy filter reconstruction). Same feature contract as
    ``bmp_features`` — (id, width, height, mean_r, mean_g, mean_b,
    luma_mean, luma_h0..luma_h3), exact integer-sum means and the
    integer rec-601 luma histogram — so the analytic-oracle
    construction proven on BMP applies verbatim. Arrow-batched in
    ``mapInPandas``; unparseable/corrupt payloads are dropped."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "luma_mean": [],
                "luma_h0": [], "luma_h1": [], "luma_h2": [], "luma_h3": [],
            }
            for i, payload in zip(
                pdf["id"].to_numpy(dtype=np.int64), pdf["content"]
            ):
                if payload is None:
                    continue
                img = decode_png(bytes(payload))
                if img is None:
                    continue
                h, w = img.shape[:2]
                n = h * w
                rgb = img.reshape(n, 3).astype(np.int64)
                r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
                luma = (299 * r + 587 * g + 114 * b) // 1000
                hist = np.bincount(luma // 64, minlength=4)
                rows["id"].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(float(int(r.sum())) / n)
                rows["mean_g"].append(float(int(g.sum())) / n)
                rows["mean_b"].append(float(int(b.sum())) / n)
                rows["luma_mean"].append(float(int(luma.sum())) / n)
                for bin_ in range(4):
                    rows[f"luma_h{bin_}"].append(int(hist[bin_]))
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        part,
        schema=(
            "id long, width int, height int, mean_r double, "
            "mean_g double, mean_b double, luma_mean double, "
            "luma_h0 long, luma_h1 long, luma_h2 long, luma_h3 long"
        ),
    )


def modality_stats(df: DataFrame) -> DataFrame:
    """Per-modality corpus accounting: pure column ops, fully
    pushdown-friendly. (modality, n_items, total_bytes, avg_bytes)."""
    return (
        df.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.round(F.avg(F.length("content")), 4).alias("avg_bytes"),
        )
    )


def documents_as_multimodal(docs: DataFrame) -> DataFrame:
    """Adapter: the testdata ``documents`` table as a multimodal
    corpus (text payloads as utf-8 binary, deterministic pseudo
    modality, typed meta). Lets every multimodal operator run against
    driver-provided data without synthesizing new inputs."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
            F.lit("n_frames"), (F.col("doc_id") % 7 + 1).cast("string"),
        ).alias("meta"),
    )
