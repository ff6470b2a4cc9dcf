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
  stub — the ``NotImplementedError`` seam is image/video only.
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
                "decoder='image' needs Pillow, which is not installed in this "
                "environment; the Spark plumbing is identical for decoder='fake'"
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


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — requires a real codec; NotImplementedError here
    by design (env has no Pillow). Kept as the documented seam."""
    _require_decoder("image")
    raise AssertionError("unreachable in this environment")  # pragma: no cover


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
