"""Multimodal plumbing tests: schema, Arrow batch shapes, fan-out
cardinality, determinism of the stubbed decode kernel, and the
driver-side decoder gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.multimodal import (
    MODALITIES,
    documents_as_multimodal,
    extract_features,
    modality_stats,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def corpus(documents):
    return documents_as_multimodal(documents).cache()


def test_corpus_schema(corpus):
    assert [f.name for f in corpus.schema.fields] == [
        "id",
        "modality",
        "content",
        "meta",
    ]
    row = corpus.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.modality in MODALITIES
    assert set(row.meta) == {"lang", "source", "n_chars", "n_frames"}


def test_extract_features_shape_and_unit_norm(corpus):
    feats = extract_features(corpus, dim=32)
    rows = feats.collect()
    assert len(rows) == corpus.count()
    for r in rows[:20]:
        assert len(r.features) == 32
        assert abs(float(np.linalg.norm(r.features)) - 1.0) < 1e-5
        assert r.n_bytes > 0


def test_extract_features_deterministic(corpus, spark):
    a = {r.id: tuple(r.features) for r in extract_features(corpus, dim=16).collect()}
    b = {r.id: tuple(r.features) for r in extract_features(corpus, dim=16).collect()}
    assert a == b
    # identical payloads → identical features; distinct → distinct
    df = spark.createDataFrame(
        [(0, "image", b"same", None), (1, "image", b"same", None), (2, "image", b"diff", None)],
        schema="id long, modality string, content binary, meta map<string,string>",
    )
    got = {r.id: tuple(r.features) for r in extract_features(df, dim=16).collect()}
    assert got[0] == got[1] != got[2]


def test_features_feed_ann_index(corpus):
    """Decode→embed output plugs straight into the vector engine."""
    from gofaiss_spark.api import build_index, search

    feats = extract_features(corpus, dim=16).select(
        "id", F.col("features").alias("vec")
    )
    idx = build_index(feats, index_type="flat", metric="cosine")
    q = feats.limit(3).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    res = search(idx, q, k=1).collect()
    # nearest neighbor of a corpus vector is itself at distance ~0
    assert all(r.query_id == r.id and r.distance < 1e-6 for r in res)


def test_sample_frames_cardinality(corpus):
    frames = sample_frames(corpus, every_n=2)
    got = frames.groupBy("id").count().collect()
    n_frames = {
        r.id: int(r.meta["n_frames"]) for r in corpus.select("id", "meta").collect()
    }
    assert len(got) == corpus.count()
    for r in got:
        expected = (n_frames[r.id] + 1) // 2  # ceil(n/2) sampled at every_n=2
        assert r["count"] == expected
    with pytest.raises(ValueError):
        sample_frames(corpus, every_n=0)


def test_frame_bytes_are_slices(spark):
    df = spark.createDataFrame(
        [(1, "video", b"abcdefgh", {"n_frames": "4"})],
        schema="id long, modality string, content binary, meta map<string,string>",
    )
    rows = {r.frame_idx: bytes(r.frame) for r in sample_frames(df, every_n=2).collect()}
    assert rows == {0: b"ab", 2: b"ef"}


def test_modality_stats(corpus):
    rows = {r.modality: r for r in modality_stats(corpus).collect()}
    assert set(rows) == set(MODALITIES)
    total = sum(r.n_items for r in rows.values())
    assert total == corpus.count()
    for r in rows.values():
        assert r.total_bytes > 0 and r.avg_bytes > 0


def test_real_decoders_gated(corpus):
    with pytest.raises(NotImplementedError, match="Pillow"):
        resize_images(corpus, 224, 224, decoder="image")
    with pytest.raises(NotImplementedError):
        extract_features(corpus, decoder="audio")
    with pytest.raises(ValueError):
        extract_features(corpus, decoder="bogus")


# --- round 9: REAL WAV codec path (stdlib wave, no external libs) ---


def test_wav_roundtrip_features(spark):
    """synth_wav encodes real RIFF containers; wav_features must
    decode them back to the exact analytic parameters."""
    from gofaiss_spark.operators.multimodal import synth_wav, wav_features

    ids = spark.range(0, 12).select(F.col("id"))
    out = {r.id: r for r in wav_features(synth_wav(ids)).collect()}
    assert set(out) == set(range(12))
    import numpy as np

    for d, r in out.items():
        assert r.sample_rate == 8000 + (d % 3) * 4000
        assert r.n_channels == 1 + d % 2
        assert r.n_samples == 100 + d % 50
        assert r.duration_us == r.n_samples * 1_000_000 // r.sample_rate
        j = np.arange(r.n_samples * r.n_channels, dtype=np.int64)
        vals = (d * 31 + j * 7) % 2001 - 1000
        assert r.peak_abs == int(np.abs(vals).max())
        assert r.rms == round(float(np.sqrt(np.mean(vals.astype(float) ** 2))), 6)


# --- round 10: REAL BMP codec path (struct + numpy, no Pillow) ------


def test_bmp_codec_roundtrip_exact_pixels():
    """encode_bmp → decode_bmp is the identity on (h, w, 3) BGR,
    including non-multiple-of-4 strides (w=5 → 1-byte row padding)."""
    from gofaiss_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(11)
    for w, h in [(5, 3), (4, 4), (7, 2), (1, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)


def test_bmp_decode_topdown_and_rejects():
    """Top-down (negative height) arrays decode too; non-BMP, wrong
    bpp, and truncated payloads return None (poison tolerance)."""
    import struct

    from gofaiss_spark.operators.multimodal import decode_bmp, encode_bmp

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    payload = bytearray(encode_bmp(img))
    # flip to top-down: negate height, re-order rows in place
    struct.pack_into("<i", payload, 22, -2)
    stride = 8
    rows = bytes(payload[54:])
    payload[54:] = rows[stride:] + rows[:stride]
    np.testing.assert_array_equal(decode_bmp(bytes(payload)), img)
    assert decode_bmp(b"not a bmp") is None
    assert decode_bmp(encode_bmp(img)[:30]) is None
    bad_bpp = bytearray(encode_bmp(img))
    struct.pack_into("<H", bad_bpp, 28, 8)
    assert decode_bmp(bytes(bad_bpp)) is None


def test_bmp_roundtrip_features(spark):
    """synth_bmp encodes real BMP containers; bmp_features must decode
    them back to the exact analytic per-pixel statistics."""
    from gofaiss_spark.operators.multimodal import bmp_features, synth_bmp

    ids = spark.range(0, 20).select(F.col("id"))
    out = {r.id: r for r in bmp_features(synth_bmp(ids)).collect()}
    assert set(out) == set(range(20))
    for d, r in out.items():
        w, h = 4 + d % 5, 3 + d % 4
        assert (r.width, r.height) == (w, h)
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        rr = (7 * d + 3 * x + 5 * y) % 256
        gg = (11 * d + 5 * x + 7 * y) % 256
        bb = (13 * d + 7 * x + 3 * y) % 256
        n = w * h
        assert r.mean_r == rr.sum() / n
        assert r.mean_g == gg.sum() / n
        assert r.mean_b == bb.sum() / n
        luma = (299 * rr + 587 * gg + 114 * bb) // 1000
        assert r.luma_mean == luma.sum() / n
        hist = np.bincount((luma // 64).ravel(), minlength=4)
        assert [r.luma_h0, r.luma_h1, r.luma_h2, r.luma_h3] == hist.tolist()


def test_bmp_features_skips_corrupt_payloads(spark):
    from gofaiss_spark.operators.multimodal import bmp_features, synth_bmp

    good = synth_bmp(spark.range(5, 6)).collect()[0]
    df = spark.createDataFrame(
        [
            (1, b"BMbogus"),
            (2, None),
            (3, bytes(good.content)),
            (4, bytes(good.content)[:40]),
        ],
        schema="id long, content binary",
    )
    rows = bmp_features(df).collect()
    assert [r.id for r in rows] == [3]
    assert (rows[0].width, rows[0].height) == (4 + 5 % 5, 3 + 5 % 4)


def test_bmp_resize_nearest_neighbor_exact(spark):
    """resize_images(decoder='bmp') is a REAL resample: decoded output
    must equal numpy fancy-indexing with grid-center source mapping,
    for both down- and up-scaling."""
    from gofaiss_spark.operators.multimodal import (
        bmp_features,
        decode_bmp,
        resize_images,
        synth_bmp,
    )

    src = synth_bmp(spark.range(0, 8))
    originals = {r.id: decode_bmp(bytes(r.content)) for r in src.collect()}
    for dst_w, dst_h in [(3, 2), (10, 7)]:
        resized = resize_images(src, dst_w, dst_h)
        rows = {r.id: decode_bmp(bytes(r.content)) for r in resized.collect()}
        assert set(rows) == set(originals)
        for d, img in originals.items():
            src_h, src_w = img.shape[:2]
            xs = ((np.arange(dst_w) + 0.5) * src_w / dst_w).astype(np.int64)
            ys = ((np.arange(dst_h) + 0.5) * src_h / dst_h).astype(np.int64)
            np.testing.assert_array_equal(
                rows[d], img[ys.clip(0, src_h - 1)][:, xs.clip(0, src_w - 1)])
        # resized payloads feed the feature kernel unchanged
        feats = bmp_features(resized).collect()
        assert all((r.width, r.height) == (dst_w, dst_h) for r in feats)
    with pytest.raises(ValueError):
        resize_images(src, 0, 4)


def test_wav_features_skips_corrupt_payloads(spark):
    """Poison-blob tolerance: corrupt/None/truncated bytes are
    dropped, valid clips still decode — a bad blob must not kill a
    100 TB ingest job."""
    from gofaiss_spark.operators.multimodal import synth_wav, wav_features

    good = synth_wav(spark.range(3, 4)).collect()[0]
    df = spark.createDataFrame(
        [
            (1, b"not a wav at all"),
            (2, None),
            (3, bytes(good.content)),
            (4, bytes(good.content)[:20]),  # truncated header
        ],
        schema="id long, content binary",
    )
    rows = wav_features(df).collect()
    assert [r.id for r in rows] == [3]
    assert rows[0].sample_rate == 8000


# --- round 11: REAL video codec path (uncompressed RIFF AVI) --------


def test_avi_codec_roundtrip_exact_pixels():
    from gofaiss_spark.operators.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(3)
    for (h, w, nf) in [(3, 4, 2), (5, 7, 4), (6, 8, 1)]:
        frames = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(nf)
        ]
        got = decode_avi(encode_avi(frames, 40_000))
        assert got is not None
        fr2, spf = got
        assert spf == 40_000 and len(fr2) == nf
        for a, b in zip(frames, fr2):
            assert np.array_equal(a, b)


def test_avi_decode_rejects_poison():
    from gofaiss_spark.operators.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(4)
    p = encode_avi([rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)])
    assert decode_avi(b"garbage") is None
    assert decode_avi(b"RIFF\x04\x00\x00\x00AVI ") is None
    assert decode_avi(p[:40]) is None                 # truncated hdrl
    # clipping only the trailing idx1 is TOLERATED (frames intact)...
    assert decode_avi(p[:-20]) is not None
    # ...but clipping into the movi frame data is not (idx1 is 24
    # bytes here; the single 00db chunk is 8+36): no partial frames
    assert decode_avi(p[:-70]) is None
    bad = bytearray(p)
    bad[8:12] = b"WAVE"
    assert decode_avi(bytes(bad)) is None             # wrong form type


def test_avi_roundtrip_features(spark):
    """synth_avi encodes real RIFF AVI containers; avi_features must
    decode them back to the exact analytic per-pixel statistics,
    including the consecutive-frame motion mean."""
    from gofaiss_spark.operators.multimodal import avi_features, synth_avi

    ids = spark.range(0, 20).select(F.col("id"))
    out = {r.id: r for r in avi_features(synth_avi(ids)).collect()}
    assert set(out) == set(range(20))
    for d, r in out.items():
        w, h, nf = 4 + d % 5, 3 + d % 4, 2 + d % 3
        assert (r.width, r.height, r.n_frames) == (w, h, nf)
        assert r.duration_us == nf * 100_000
        x = np.arange(w, dtype=np.int64)[None, None, :]
        y = np.arange(h, dtype=np.int64)[None, :, None]
        t = np.arange(nf, dtype=np.int64)[:, None, None]
        rr = (7 * d + 3 * x + 5 * y + 17 * t) % 256
        gg = (11 * d + 5 * x + 7 * y + 19 * t) % 256
        bb = (13 * d + 7 * x + 3 * y + 23 * t) % 256
        n = nf * w * h
        assert r.mean_r == rr.sum() / n
        assert r.mean_g == gg.sum() / n
        assert r.mean_b == bb.sum() / n
        luma = (299 * rr + 587 * gg + 114 * bb) // 1000
        assert r.luma_mean == luma.sum() / n
        if nf > 1:
            motion = np.abs(luma[1:] - luma[:-1]).sum() / ((nf - 1) * w * h)
        else:
            motion = 0.0
        assert r.motion_mean == motion


def test_avi_features_skips_corrupt_payloads(spark):
    from gofaiss_spark.operators.multimodal import avi_features, synth_avi

    good = synth_avi(spark.range(5, 6)).collect()[0]
    df = spark.createDataFrame(
        [
            (1, b"RIFFbogus"),
            (2, None),
            (3, bytes(good.content)),
            (4, bytes(good.content)[:60]),
        ],
        schema="id long, content binary",
    )
    rows = avi_features(df).collect()
    assert [r.id for r in rows] == [3]
    assert (rows[0].width, rows[0].height, rows[0].n_frames) == (
        4 + 5 % 5, 3 + 5 % 4, 2 + 5 % 3)


def test_avi_frames_extraction_roundtrip(spark):
    """avi_frames is a REAL video->image step: every extracted frame,
    decoded back through the BMP codec, must equal the analytic pixel
    grid for its (id, frame_idx); every_nth/max_frames bound the
    fan-out; outputs feed bmp_features unchanged."""
    from gofaiss_spark.operators.multimodal import (
        avi_frames,
        bmp_features,
        decode_bmp,
        synth_avi,
    )

    vids = synth_avi(spark.range(0, 12))
    out = avi_frames(vids).collect()
    # fan-out cardinality: sum over ids of n_frames = 2 + d%3
    assert len(out) == sum(2 + d % 3 for d in range(12))
    for r in out:
        d, t = r.id, r.frame_idx
        w, h = 4 + d % 5, 3 + d % 4
        assert (r.width, r.height) == (w, h)
        img = decode_bmp(bytes(r.content))
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        rr = (7 * d + 3 * x + 5 * y + 17 * t) % 256
        gg = (11 * d + 5 * x + 7 * y + 19 * t) % 256
        bb = (13 * d + 7 * x + 3 * y + 23 * t) % 256
        want = np.stack([bb, gg, rr], axis=-1).astype(np.uint8)
        assert np.array_equal(img, want)
    # every_nth=2 keeps frames 0, 2; max_frames=1 keeps only frame 0
    sub = avi_frames(vids, every_nth=2).collect()
    assert all(r.frame_idx % 2 == 0 for r in sub)
    one = avi_frames(vids, max_frames=1).collect()
    assert len(one) == 12 and all(r.frame_idx == 0 for r in one)
    with pytest.raises(ValueError, match="every_nth"):
        avi_frames(vids, every_nth=0)
    # extracted frames feed the image feature extractor unchanged
    feats = bmp_features(
        avi_frames(vids, max_frames=1).drop("frame_idx")).collect()
    assert len(feats) == 12


def test_avi_encode_validates_header_domains():
    """ADVICE r11 (low): legal-looking inputs that overflow AVI
    header fields raise a descriptive ValueError up front instead of
    a struct.error mid-pack; the advisory dwMaxBytesPerSec is clamped
    rather than overflowed."""
    from gofaiss_spark.operators.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(0)
    f = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="uint16"):
        encode_avi([np.zeros((70_000, 4, 3), dtype=np.uint8)])
    with pytest.raises(ValueError, match="micro_sec_per_frame"):
        encode_avi([f], micro_sec_per_frame=0)
    with pytest.raises(ValueError, match="micro_sec_per_frame"):
        encode_avi([f], micro_sec_per_frame=1 << 32)
    # spf=1 with any frame would overflow dwMaxBytesPerSec unclamped
    got = decode_avi(encode_avi([f], micro_sec_per_frame=1))
    assert got is not None and len(got[0]) == 1
    assert np.array_equal(got[0][0], f)


def test_avi_decode_filters_non_vids_stream_chunks():
    """ADVICE r11 (low): movi chunks are accepted only when their
    two-digit stream prefix matches the vids stream from hdrl strl
    order — a second stream's chunks must not interleave into the
    frame sequence (same-size chunks silently mixed frames before)."""
    import struct

    from gofaiss_spark.operators.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
              for _ in range(2)]
    p = bytearray(encode_avi(frames, 40_000))
    # splice a same-size '01dc' chunk (a hypothetical second stream)
    # into movi, right after the first '00db' chunk
    h, w = 3, 4
    stride = (w * 3 + 3) // 4 * 4
    fb = stride * h
    first = bytes(p).index(b"00db")
    insert_at = first + 8 + fb
    alien = b"01dc" + struct.pack("<I", fb) + bytes(fb)
    spliced = bytes(p[:insert_at]) + alien + bytes(p[insert_at:])
    # grow the RIFF and movi LIST sizes to stay well-formed
    spliced = bytearray(spliced)
    (riff_sz,) = struct.unpack_from("<I", spliced, 4)
    struct.pack_into("<I", spliced, 4, riff_sz + len(alien))
    movi_hdr = bytes(spliced).index(b"LIST", 12)
    while spliced[movi_hdr + 8:movi_hdr + 12] != b"movi":
        movi_hdr = bytes(spliced).index(b"LIST", movi_hdr + 1)
    (movi_sz,) = struct.unpack_from("<I", spliced, movi_hdr + 4)
    struct.pack_into("<I", spliced, movi_hdr + 4, movi_sz + len(alien))
    got = decode_avi(bytes(spliced))
    assert got is not None
    dec, _spf = got
    assert len(dec) == 2  # the alien chunk did NOT become frame 2
    assert np.array_equal(dec[0], frames[0])
    assert np.array_equal(dec[1], frames[1])


# --- PNG: the first compressed-format codec (round 12) ---------------


def test_png_codec_roundtrip_exact_pixels_all_filters():
    from gofaiss_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(3)
    for _ in range(40):
        h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for filters in (None, [0] * h, [1] * h, [2] * h, [3] * h,
                        [4] * h, list(rng.integers(0, 5, h))):
            got = decode_png(encode_png(img, filters))
            assert got is not None and got.dtype == np.uint8
            assert np.array_equal(got, img), (h, w, filters)


def test_png_decode_rejects_poison():
    """CRC corruption, truncation, wrong profile, missing IEND — all
    decode to None, never raise (poison-blob tolerance)."""
    import struct
    import zlib

    from gofaiss_spark.operators.multimodal import (
        _png_chunk, _PNG_SIG, decode_png, encode_png,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    p = encode_png(img)
    assert decode_png(b"junk") is None
    assert decode_png(p[:20]) is None               # truncated IHDR
    bad = bytearray(p)
    bad[30] ^= 0xFF                                  # IHDR data bit flip
    assert decode_png(bytes(bad)) is None            # CRC catches it
    bad = bytearray(p)
    bad[-30] ^= 0xFF                                 # IDAT bit flip
    assert decode_png(bytes(bad)) is None
    # grayscale (color type 0) is outside the supported profile
    gp = (_PNG_SIG
          + _png_chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 7, 5, 8, 0, 0, 0, 0))
          + _png_chunk(b"IDAT", zlib.compress(bytes(5 * 8)))
          + _png_chunk(b"IEND", b""))
    assert decode_png(gp) is None
    # missing IEND (stream cut between chunks, CRCs intact)
    assert decode_png(p[:p.rindex(b"IEND") - 4]) is None
    # bad filter byte inside a CRC-valid IDAT
    raw = bytearray(b"\x07" + bytes(7 * 3)) * 5
    bp = (_PNG_SIG
          + _png_chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0))
          + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
          + _png_chunk(b"IEND", b""))
    assert decode_png(bp) is None


def test_png_multiple_idat_chunks_concatenate():
    import struct
    import zlib

    from gofaiss_spark.operators.multimodal import (
        _png_chunk, _PNG_SIG, decode_png, encode_png,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    p = encode_png(img, [0] * 6)
    # re-chunk the IDAT payload into 3 chunks
    pos = p.index(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", p, pos)
    data = p[pos + 8:pos + 8 + ln]
    head, tail = p[:pos], p[pos + 8 + ln + 4:]
    third = max(1, len(data) // 3)
    rechunked = head + b"".join(
        _png_chunk(b"IDAT", data[i:i + third])
        for i in range(0, len(data), third)) + tail
    got = decode_png(rechunked)
    assert got is not None and np.array_equal(got, img)


def test_png_java_imageio_cross_validation(tmp_path):
    """Spec-compliance evidence from an INDEPENDENT codec: Java
    ImageIO (ships with the JDK Spark already requires) must read
    our PNGs pixel-exact, and we must read ImageIO's. Skipped when
    no JDK with a compiler is available."""
    import os
    import shutil
    import struct
    import subprocess

    from gofaiss_spark.operators.multimodal import decode_png, encode_png

    java_home = os.environ.get("JAVA_HOME", "")
    javac = os.path.join(java_home, "bin", "javac")
    java = os.path.join(java_home, "bin", "java")
    if not (os.path.exists(javac) and os.path.exists(java)):
        javac, java = shutil.which("javac"), shutil.which("java")
    if not javac or not java:
        pytest.skip("no JDK available for the cross-validation")
    src = tmp_path / "PngX.java"
    src.write_text(
        'import javax.imageio.ImageIO;\n'
        'import java.awt.image.BufferedImage;\n'
        'import java.io.*;\n'
        'public class PngX {\n'
        '  public static void main(String[] a) throws Exception {\n'
        '    if (a[0].equals("encode")) {\n'
        '      DataInputStream in = new DataInputStream(System.in);\n'
        '      int w = in.readInt(), h = in.readInt();\n'
        '      BufferedImage im = new BufferedImage(w, h, '
        'BufferedImage.TYPE_INT_RGB);\n'
        '      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {\n'
        '        int r = in.readUnsignedByte(), g = in.readUnsignedByte(), '
        'b = in.readUnsignedByte();\n'
        '        im.setRGB(x, y, (r << 16) | (g << 8) | b); }\n'
        '      ImageIO.write(im, "png", System.out);\n'
        '    } else {\n'
        '      BufferedImage im = ImageIO.read(System.in);\n'
        '      DataOutputStream o = new DataOutputStream(System.out);\n'
        '      o.writeInt(im.getWidth()); o.writeInt(im.getHeight());\n'
        '      for (int y = 0; y < im.getHeight(); y++) '
        'for (int x = 0; x < im.getWidth(); x++) {\n'
        '        int p = im.getRGB(x, y);\n'
        '        o.writeByte((p >> 16) & 255); o.writeByte((p >> 8) & 255); '
        'o.writeByte(p & 255); }\n'
        '      o.flush(); } } }\n')
    subprocess.run([javac, str(src)], check=True, cwd=tmp_path,
                   capture_output=True)
    rng = np.random.default_rng(6)
    for _ in range(3):
        h, w = int(rng.integers(1, 16)), int(rng.integers(1, 16))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        # ours (all-filters encode) -> Java
        jd = subprocess.run(
            [java, "-cp", str(tmp_path), "PngX", "decode"],
            input=encode_png(img), capture_output=True, check=True)
        jw, jh = struct.unpack(">II", jd.stdout[:8])
        assert (jw, jh) == (w, h)
        assert np.array_equal(
            np.frombuffer(jd.stdout[8:], np.uint8).reshape(h, w, 3), img)
        # Java -> ours
        je = subprocess.run(
            [java, "-cp", str(tmp_path), "PngX", "encode"],
            input=struct.pack(">II", w, h) + img.tobytes(),
            capture_output=True, check=True)
        got = decode_png(je.stdout)
        assert got is not None and np.array_equal(got, img)


def test_png_synth_features_roundtrip(spark):
    """synth_png payloads decode through the REAL compressed codec
    and the features match the analytic per-pixel formulas exactly
    (the driver-row construction)."""
    from gofaiss_spark.operators.multimodal import (
        png_features, synth_png,
    )

    ids = spark.range(0, 40).select(F.col("id"))
    out = png_features(synth_png(ids)).orderBy("id").collect()
    assert len(out) == 40
    for row in out:
        d = int(row.id)
        w, h = 5 + d % 6, 4 + d % 5
        assert (row.width, row.height) == (w, h)
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        r = (17 * d + 5 * x + 3 * y) % 256
        g = (19 * d + 7 * x + 5 * y) % 256
        b = (23 * d + 3 * x + 7 * y) % 256
        n = w * h
        assert row.mean_r == float(int(r.sum())) / n
        assert row.mean_g == float(int(g.sum())) / n
        assert row.mean_b == float(int(b.sum())) / n
        luma = (299 * r + 587 * g + 114 * b) // 1000
        assert row.luma_mean == float(int(luma.sum())) / n
        hist = np.bincount(luma.ravel() // 64, minlength=4)
        assert [row.luma_h0, row.luma_h1, row.luma_h2,
                row.luma_h3] == hist.tolist()


def test_png_features_skips_corrupt_payloads(spark):
    from gofaiss_spark.operators.multimodal import (
        png_features, synth_png,
    )

    good = synth_png(spark.range(0, 6))
    poison = spark.createDataFrame(
        [(100, "image", bytearray(b"not a png")),
         (101, "image", None)],
        "id long, modality string, content binary")
    out = png_features(good.unionByName(poison)).collect()
    assert sorted(r.id for r in out) == list(range(6))
