"""Multimodal column plumbing: BinaryType + meta struct through
mapInPandas (decode stubbed — no codec libs in this container)."""

from __future__ import annotations

import hashlib

import pytest

from kinesis_handler_spark.io.multimodal import (
    MULTIMODAL_SCHEMA,
    _decode_stub,
    decode_and_featurize,
    make_multimodal_df,
)


def test_schema_round_trips_parquet(spark, sf_dir, tmp_path):
    mm = make_multimodal_df(spark, sf_dir)
    mm.write.mode("overwrite").parquet(str(tmp_path / "mm"))
    back = spark.read.parquet(str(tmp_path / "mm"))
    assert dict(back.dtypes)["content"] == "binary"
    assert back.count() == 500
    row = back.filter("media_id = 0").collect()[0]
    assert row["meta"]["mime"] == "image/fake"
    assert isinstance(row["content"], (bytes, bytearray))


def test_decode_and_featurize_fake(spark, sf_dir):
    out = decode_and_featurize(make_multimodal_df(spark, sf_dir), fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 500
    # features are deterministic: recompute one row's stub locally
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id = 3")
    text = src.collect()[0]["text"].encode()
    expect = _decode_stub(text, "image/fake", fake=True)
    assert rows[3]["feature"] == pytest.approx(expect)
    assert rows[3]["content_sha256"] == hashlib.sha256(text).hexdigest()
    assert rows[3]["n_bytes"] == len(text)


def test_real_decode_is_explicitly_stubbed():
    # video-class mimes remain stub-gated (JPEG has a real codec now)...
    with pytest.raises(NotImplementedError, match="no codec"):
        _decode_stub(b"\x00\x00\x00\x18ftypmp42", "video/mp4", fake=False)
    # ...while a decodable mime with corrupt bytes is a DATA error
    # (dead-letter ValueError), never silently faked
    with pytest.raises(ValueError, match="not a PNG"):
        _decode_stub(b"\x89PNG", "image/png", fake=True)
    with pytest.raises(ValueError, match="no SOI"):
        _decode_stub(b"\x89PNG\r\n\x1a\n", "image/jpeg", fake=True)


def test_envelope_schema_fields():
    names = [f.name for f in MULTIMODAL_SCHEMA.fields]
    assert names == ["media_id", "content", "meta"]


def test_resize_media_constant_dims(spark, sf_dir):
    from kinesis_handler_spark.io.multimodal import make_multimodal_df, resize_media

    mm = make_multimodal_df(spark, sf_dir).limit(20)
    out = resize_media(mm, 8, 6).collect()
    assert len(out) == 20
    for r in out:
        assert (r.width, r.height) == (8, 6)
        assert len(r.content) == 8 * 6
    # deterministic: same input -> same bytes
    again = resize_media(mm, 8, 6).collect()
    assert {(r.media_id, bytes(r.content)) for r in out} == {
        (r.media_id, bytes(r.content)) for r in again
    }


def test_sample_frames_expansion_and_cap(spark, sf_dir):
    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import make_multimodal_df, sample_frames

    mm = (
        make_multimodal_df(spark, sf_dir, mime="video/fake")
        .limit(10)
        # duration 0..9s by media_id: exercises 1-frame minimum and the cap
        .withColumn(
            "meta",
            F.struct(
                F.col("meta.mime").alias("mime"),
                F.col("meta.width").alias("width"),
                F.col("meta.height").alias("height"),
                (F.col("media_id").cast("int") % 10 * 1000).alias("duration_ms"),
            ),
        )
    )
    rows = sample_frames(mm, every_ms=1000, max_frames=4).collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r)
    for mid, frames in per.items():
        expect = min(4, max(1, (mid % 10 * 1000) // 1000))
        assert len(frames) == expect, (mid, len(frames))
        assert sorted(f.frame_idx for f in frames) == list(range(expect))
        for f in frames:
            assert f.ts_ms == f.frame_idx * 1000
            assert len(f.frame) == 32


def test_codec_boundary_raises_without_fake(spark, sf_dir):
    import pytest

    from kinesis_handler_spark.io.multimodal import make_multimodal_df, resize_media

    mm = make_multimodal_df(spark, sf_dir).limit(1)
    # fail-fast is DRIVER-side now: the error surfaces before any job runs
    with pytest.raises(NotImplementedError, match="no real codec path"):
        resize_media(mm, 4, 4, fake=False)


def test_decode_bmp_roundtrip_and_dead_letter(spark, sf_dir):
    # real decode: build one BMP executor-side, decode driver-side with
    # the same function, check a few pixels against the generator
    from kinesis_handler_spark.io.multimodal import (
        BMP_H,
        BMP_W,
        _bmp_pixel,
        decode_bmp,
        make_bmp_media_df,
    )

    row = make_bmp_media_df(spark, sf_dir).filter("media_id = 3").first()
    w, h, bpp, px = decode_bmp(bytes(row["content"]))
    assert (w, h, bpp) == (BMP_W, BMP_H, 24)
    for x, y in [(0, 0), (9, 5), (4, 2)]:
        for c in range(3):
            assert px[y, x, c] == _bmp_pixel(3, x, y, c)
    # malformed inputs raise (the dead-letter contract), never misparse
    import pytest as _pytest

    for bad in [b"", b"XX" + bytes(60), bytes(row["content"])[:40]]:
        with _pytest.raises(ValueError):
            decode_bmp(bad)


def test_decode_wav_roundtrip_and_dead_letter(spark, sf_dir):
    from kinesis_handler_spark.io.multimodal import (
        WAV_N,
        WAV_RATE,
        _wav_sample,
        decode_wav,
        make_wav_media_df,
    )

    row = make_wav_media_df(spark, sf_dir).filter("media_id = 7").first()
    rate, ch, s = decode_wav(bytes(row["content"]))
    assert (rate, ch, len(s)) == (WAV_RATE, 1, WAV_N)
    for i in [0, 1, 100, WAV_N - 1]:
        assert int(s[i]) == _wav_sample(7, i)
    import pytest as _pytest

    for bad in [b"", b"RIFFxxxxWAVX" + bytes(60), bytes(row["content"])[:30]]:
        with _pytest.raises(ValueError):
            decode_wav(bad)


# -- real PNG codec (stdlib zlib + numpy) ------------------------------------

def test_png_round_trip_is_pixel_exact(spark, sf_dir):
    import numpy as np

    from kinesis_handler_spark.io.multimodal import (
        PNG_H,
        PNG_W,
        _png_pixel,
        decode_png,
        make_png_media_df,
    )

    rows = make_png_media_df(spark, sf_dir).limit(4).collect()
    assert rows
    for r in rows:
        w, h, ct, px = decode_png(bytes(r["content"]))
        assert (w, h, ct) == (PNG_W, PNG_H, 2)
        expect = np.array(
            [
                [[_png_pixel(int(r["media_id"]), x, y, c) for c in range(3)]
                 for x in range(w)]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        # byte-exact through DEFLATE + all five filter types (the encoder
        # cycles y % 5, so None/Sub/Up/Average/Paeth are all exercised)
        assert (px == expect).all()


def test_png_decode_rejects_corruption(spark, sf_dir):
    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        decode_png,
        make_png_media_df,
    )

    blob = bytearray(
        bytes(make_png_media_df(spark, sf_dir).limit(1).collect()[0]["content"])
    )
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + bytes(blob[4:]))
    corrupted = bytearray(blob)
    corrupted[45] ^= 0xFF  # inside IDAT payload -> CRC must catch it
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    with _pytest.raises(ValueError, match="truncated|missing"):
        decode_png(bytes(blob[:40]))


def test_decode_and_featurize_real_png_no_fake(spark, sf_dir):
    # the generic codec boundary now really decodes PNG (stdlib zlib):
    # fake=False must succeed for PNG media and the feature must be the
    # true per-channel mean, not the sha256 stand-in
    import numpy as np
    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        decode_and_featurize,
        decode_png,
        make_png_media_df,
    )

    media = make_png_media_df(spark, sf_dir).limit(3).withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(12).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    rows = {r["media_id"]: r for r in decode_and_featurize(media, fake=False).collect()}
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, r in rows.items():
        _w, _h, _ct, px = decode_png(raw[mid])
        expect = [float(px[:, :, c].mean()) / 255.0 for c in range(3)]
        assert np.allclose(r["feature"], expect)


def test_decode_and_featurize_unknown_mime_still_gates(spark, sf_dir):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        decode_and_featurize,
        make_png_media_df,
    )

    media = make_png_media_df(spark, sf_dir).limit(1).withColumn(
        "meta",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    with _pytest.raises(Exception, match="no codec for 'video/mp4'"):
        decode_and_featurize(media, fake=False).collect()
    # a mime the codec layer DOES cover, with bytes of a different
    # format, is a data error (dead-letter), never silently faked
    mislabeled = media.withColumn(
        "meta",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    with _pytest.raises(Exception, match="no SOI"):
        decode_and_featurize(mislabeled, fake=False).collect()


def test_jpeg_round_trip_is_coefficient_exact_and_pixel_exact(spark, sf_dir):
    """The lossless layer (Huffman + DPCM + dequant) must recover the
    generator's quantized coefficients EXACTLY; the lossy tail (IDCT +
    color transform) must match an independent direct-form IDCT
    reference (bit-identical here; the conformance-style bound is ±1)."""
    import math

    import numpy as np

    from kinesis_handler_spark.io.multimodal import (
        JPEG_AC_POSITIONS,
        JPEG_QTABLES,
        _ZIGZAG,
        _decode_jpeg_impl,
        _jpeg_ac,
        _jpeg_dc,
        _jpeg_dims,
        make_jpeg_media_df,
    )

    media = {
        r["media_id"]: bytes(r["content"])
        for r in make_jpeg_media_df(spark, sf_dir).limit(5).collect()
    }
    assert media
    for mid, blob in media.items():
        w, h, ncomp, px, coeffs = _decode_jpeg_impl(blob)
        d = mid % 256
        wb, hb = _jpeg_dims(d)
        assert (w, h, ncomp) == (8 * wb, 8 * hb, 3)
        # lossless layer: exact coefficient recovery
        for comp in range(3):
            for blk in range(wb * hb):
                assert coeffs[comp][blk][0] == _jpeg_dc(d, comp, blk)
                for zz in range(1, 64):
                    want = (
                        _jpeg_ac(d, comp, blk, zz)
                        if zz in JPEG_AC_POSITIONS
                        else 0
                    )
                    assert coeffs[comp][blk][zz] == want
        # lossy tail: independent direct-form IDCT reference
        planes = np.zeros((3, h, w))
        for comp in range(3):
            q = JPEG_QTABLES[0] if comp == 0 else JPEG_QTABLES[1]
            for blk in range(wb * hb):
                fmat = np.zeros((8, 8))
                for i, (r, c) in enumerate(_ZIGZAG):
                    fmat[r, c] = coeffs[comp][blk][i] * q
                out = np.zeros((8, 8))
                for x in range(8):
                    for y in range(8):
                        s = 0.0
                        for u in range(8):
                            for v in range(8):
                                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                                s += (
                                    cu * cv * fmat[u, v]
                                    * math.cos((2 * x + 1) * u * math.pi / 16)
                                    * math.cos((2 * y + 1) * v * math.pi / 16)
                                )
                        out[x, y] = s / 4 + 128
                by, bx = divmod(blk, wb)
                planes[comp, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = out
        yy, cb, cr = planes[0], planes[1] - 128, planes[2] - 128
        ref = np.clip(
            np.round(
                np.stack(
                    [
                        yy + 1.402 * cr,
                        yy - 0.344136 * cb - 0.714136 * cr,
                        yy + 1.772 * cb,
                    ],
                    axis=-1,
                )
            ),
            0,
            255,
        ).astype(np.uint8)
        assert np.abs(ref.astype(int) - px.astype(int)).max() <= 1


def test_jpeg_decode_rejects_corruption():
    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        decode_jpeg,
        encode_jpeg_fixture,
    )

    good = encode_jpeg_fixture(7)
    assert decode_jpeg(good)[2] == 3
    with _pytest.raises(ValueError, match="no SOI"):
        decode_jpeg(b"")
    with _pytest.raises(ValueError, match="no SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-segment
    with _pytest.raises(ValueError, match="truncated entropy"):
        decode_jpeg(good[:-24])  # scan data cut mid-MCU
    # declare 2x2 subsampling in SOF0 -> unsupported-variant error
    broken = bytearray(good)
    broken[good.index(b"\xff\xc0") + 11] = 0x22
    with _pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(broken))
    # ADVICE r8: malformed segments must surface as the dead-letter
    # ValueError, never as struct.error / IndexError.
    sof = good.index(b"\xff\xc0")
    # SOF0 whose declared length covers <6 payload bytes
    short_sof = good[:sof] + b"\xff\xc0\x00\x05" + good[sof + 4 : sof + 7]
    with _pytest.raises(ValueError):
        decode_jpeg(short_sof + good[sof + 7 :])
    # SOF0 declaring 3 components but with the component list cut:
    # shrink the declared seglen so the comps slice runs short
    cut = bytearray(good)
    cut[sof + 2 : sof + 4] = (8 + 2).to_bytes(2, "big")  # 6 hdr + 1 comp
    with _pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(cut))
    # DHT whose BITS counts exceed the HUFFVAL bytes present
    dht = good.index(b"\xff\xc4")
    (dht_len,) = __import__("struct").unpack(">H", good[dht + 2 : dht + 4])
    bad_dht = bytearray(good)
    bad_dht[dht + 5] = 0xFF  # bits[0]=255 values, far beyond the segment
    with _pytest.raises(ValueError, match="HUFFVAL"):
        decode_jpeg(bytes(bad_dht))


def test_decode_and_featurize_real_jpeg_no_fake(spark, sf_dir):
    """The r7 verdict's done-criterion: multimodal_features-style
    featurization handles a JPEG fixture WITHOUT fake=True."""
    import numpy as np
    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        decode_jpeg,
        make_jpeg_media_df,
    )

    media = make_jpeg_media_df(spark, sf_dir).limit(3).withColumn(
        "meta",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    rows = {
        r["media_id"]: r
        for r in decode_and_featurize(media, fake=False).collect()
    }
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert rows
    for mid, r in rows.items():
        _w, _h, _n, px = decode_jpeg(raw[mid])
        expect = [float(px[:, :, c].mean()) / 255.0 for c in range(3)]
        assert np.allclose(r["feature"], expect)


def test_avi_mjpeg_round_trip_and_metadata():
    """MJPEG-AVI container codec (r8 verdict item 4): the RIFF walk
    recovers geometry, timing and every frame, and each frame decodes
    through the full baseline-JPEG pipeline to the seeded coefficient
    formulas."""
    from kinesis_handler_spark.io.multimodal import (
        VIDEO_FRAME_SEED_STEP,
        VIDEO_USEC_PER_FRAME,
        _jpeg_dc,
        _jpeg_dims,
        _decode_jpeg_impl,
        _video_n_frames,
        decode_avi_mjpeg,
        encode_avi_mjpeg_fixture,
        encode_jpeg_fixture,
    )

    for doc_id in (0, 5, 42, 255, 100000007):
        d0 = doc_id % 256
        wb, hb = _jpeg_dims(d0)
        blob = encode_avi_mjpeg_fixture(doc_id)
        w, h, usec, frames = decode_avi_mjpeg(blob)
        assert (w, h) == (8 * wb, 8 * hb)
        assert usec == VIDEO_USEC_PER_FRAME
        assert len(frames) == _video_n_frames(d0)
        for f, payload in enumerate(frames):
            fw, fh, ncomp, _px, coeffs = _decode_jpeg_impl(payload)
            assert (fw, fh, ncomp) == (w, h, 3)
            df = (d0 + VIDEO_FRAME_SEED_STEP * (f + 1)) % 256
            # every DC coefficient matches the seed formula — the
            # lossless layers round-tripped through the container
            for comp in range(3):
                for blk in range(wb * hb):
                    assert coeffs[comp][blk][0] == _jpeg_dc(df, comp, blk)
    # a frame is a *plain* baseline JPEG: byte-identical to the still
    # generator at the same seed/dims when dims coincide
    d0 = 4  # _jpeg_dims(4) == _jpeg_dims((4 + 37) % 256)?  assert inside
    still_seed = (d0 + VIDEO_FRAME_SEED_STEP) % 256
    if _jpeg_dims(still_seed) == _jpeg_dims(d0):
        _w, _h, _u, frames = decode_avi_mjpeg(encode_avi_mjpeg_fixture(d0))
        assert frames[0] == encode_jpeg_fixture(still_seed)


def test_avi_mjpeg_rejects_corruption():
    import struct

    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg_fixture,
    )

    good = encode_avi_mjpeg_fixture(9)
    assert decode_avi_mjpeg(good)[3]
    with _pytest.raises(ValueError, match="bad magic"):
        decode_avi_mjpeg(b"")
    with _pytest.raises(ValueError, match="bad magic"):
        decode_avi_mjpeg(b"\xff\xd8" + good)
    with _pytest.raises(ValueError, match="truncated RIFF"):
        decode_avi_mjpeg(good[:40])
    with _pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(good[:8] + b"WAVE" + good[12:])
    # declare a non-MJPG codec in strh
    broken = bytearray(good)
    at = good.index(b"vidsMJPG")
    broken[at + 4 : at + 8] = b"H264"
    with _pytest.raises(ValueError, match="MJPG only"):
        decode_avi_mjpeg(bytes(broken))
    # frame-count mismatch between avih and movi
    broken = bytearray(good)
    at = good.index(b"avih") + 8  # fourcc + size -> payload
    declared = struct.unpack("<I", good[at + 16 : at + 20])[0]
    broken[at + 16 : at + 20] = struct.pack("<I", declared + 1)
    with _pytest.raises(ValueError, match="declares"):
        decode_avi_mjpeg(bytes(broken))
    # a movi chunk that is not a JPEG
    broken = bytearray(good)
    at = good.index(b"00dc") + 8
    broken[at : at + 2] = b"PK"
    with _pytest.raises(ValueError, match="no SOI"):
        decode_avi_mjpeg(bytes(broken))


def test_sample_mjpeg_rejects_zero_rate_container():
    """A parseable AVI declaring dwMicroSecPerFrame=0 must surface a
    diagnostic ValueError from the shared sampling helper, not a
    ZeroDivisionError (dead-letter contract; r9 advice)."""
    import struct

    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        encode_avi_mjpeg_fixture,
        sample_mjpeg_payloads,
    )

    good = encode_avi_mjpeg_fixture(9)
    assert sample_mjpeg_payloads(good, 1000, 8)
    broken = bytearray(good)
    at = good.index(b"avih") + 8  # first avih field = dwMicroSecPerFrame
    broken[at : at + 4] = struct.pack("<I", 0)
    with _pytest.raises(ValueError, match="zero-rate"):
        sample_mjpeg_payloads(bytes(broken), 1000, 8)


def test_sample_frames_real_path(spark, sf_dir):
    """sample_frames(fake=False) returns the ACTUAL JPEG payloads from
    the MJPEG container at the sampled timestamps."""
    import hashlib

    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        decode_avi_mjpeg,
        make_avi_media_df,
        sample_frames,
    )

    media = make_avi_media_df(spark, sf_dir).limit(4).withColumn(
        "meta",
        F.struct(
            F.lit("video/x-msvideo").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    out = sample_frames(media, every_ms=100, max_frames=8, fake=False)
    rows = out.collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        _w, _h, usec, payloads = decode_avi_mjpeg(raw[mid])
        # 100 ms sampling at 10 fps = every frame, capped at 8
        assert len(rs) == min(8, len(payloads))
        for r in sorted(rs, key=lambda r: r["frame_idx"]):
            src = min(int(r["ts_ms"] / (usec / 1000.0)), len(payloads) - 1)
            assert bytes(r["frame"]) == payloads[src]
            assert r["frame_sha256"] == hashlib.sha256(
                payloads[src]
            ).hexdigest()


def test_decode_and_featurize_real_video_no_fake(spark, sf_dir):
    """decode_and_featurize handles MJPEG-AVI WITHOUT fake=True: the
    feature is the per-channel pixel mean across ALL frames."""
    import numpy as np
    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        decode_avi_mjpeg,
        decode_jpeg,
        make_avi_media_df,
    )

    media = make_avi_media_df(spark, sf_dir).limit(3).withColumn(
        "meta",
        F.struct(
            F.lit("video/x-msvideo").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    rows = {
        r["media_id"]: r
        for r in decode_and_featurize(media, fake=False).collect()
    }
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert rows
    for mid, r in rows.items():
        _w, _h, _usec, payloads = decode_avi_mjpeg(raw[mid])
        stack = np.stack([decode_jpeg(p)[3] for p in payloads])
        expect = [float(stack[..., c].mean()) / 255.0 for c in range(3)]
        assert np.allclose(r["feature"], expect)


def test_frame_sample_decodes_subset(spark, sf_dir):
    """The frame-sampling operator decodes strictly FEWER frames than
    the container holds for every multi-frame video (nf >= 3 at
    every_ms=150/frame_ms=100) — the whole point of index-driven
    sampling at scale — and the sampled DC anchors equal a direct
    decode of the corresponding source frames."""
    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        _decode_jpeg_impl,
        decode_avi_mjpeg,
        make_avi_media_df,
        sample_frames,
    )
    import kinesis_handler_spark.queries  # noqa: F401 — registers queries
    from kinesis_handler_spark.registry import QUERIES

    out = {
        r["media_id"]: r
        for r in QUERIES["multimodal_frame_sample"].fn(spark, sf_dir)
        .filter(F.col("media_id") < 12)
        .collect()
    }
    media = make_avi_media_df(spark, sf_dir).filter(F.col("media_id") < 12)
    for r in media.collect():
        mid = r["media_id"]
        _w, _h, usec, payloads = decode_avi_mjpeg(bytes(r["content"]))
        nf = len(payloads)
        got = out[mid]
        expect_ns = min(8, max(1, int((100.0 * nf) // 150)))
        assert got["n_sampled"] == expect_ns
        if nf >= 3:
            assert got["n_sampled"] < nf, (
                f"video {mid}: sampled {got['n_sampled']} of {nf} — "
                "sampling decoded everything"
            )
        dc = 0
        for i in range(expect_ns):
            src = min(int(i * 150 / 100.0), nf - 1)
            dc += int(_decode_jpeg_impl(payloads[src])[4][0][0][0])
        assert got["dc00_sum"] == dc


# ---------------------------------------------------------------------------
# GIF / LZW (r11 verdict ask #6)
# ---------------------------------------------------------------------------


def test_gif_lzw_matches_hand_derived_spec_stream():
    """Conformance pin independent of the round-trip: the code stream
    for pixels [0,1,1,2,2] at min_code_size=2, derived BY HAND from the
    GIF89a LZW rules (clear first, widths 3->4 at next_code==8 on the
    decode side / ==9 on the encode side, LSB-first packing), is
    exactly 44 22 52 — a matched-but-wrong encoder/decoder pair cannot
    fake this."""
    from kinesis_handler_spark.io.multimodal import (
        gif_lzw_decode,
        gif_lzw_encode,
    )

    assert gif_lzw_encode([0, 1, 1, 2, 2], 2) == bytes([0x44, 0x22, 0x52])
    assert gif_lzw_decode(bytes([0x44, 0x22, 0x52]), 2) == [0, 1, 1, 2, 2]


def test_gif_lzw_round_trip_through_table_resets():
    """20k-symbol streams overflow the 4096-entry table, forcing the
    mid-stream CLEAR/reset path; runs force the KwKwK special case;
    corrupt streams raise (dead-letter)."""
    import random

    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        gif_lzw_decode,
        gif_lzw_encode,
    )

    rng = random.Random(12)
    for mcs in (2, 4, 6, 8):
        data = [rng.randrange(1 << mcs) for _ in range(20000)]
        data[100:140] = [data[100]] * 40  # KwKwK fodder
        assert gif_lzw_decode(gif_lzw_encode(data, mcs), mcs) == data
    with _pytest.raises(ValueError, match="out of range"):
        gif_lzw_decode(b"\xff\xff", 2)
    with _pytest.raises(ValueError, match="before EOI"):
        gif_lzw_decode(gif_lzw_encode([1, 2, 3], 2)[:-1] + b"", 6)


def test_gif_round_trip_is_pixel_exact(spark, sf_dir):
    import numpy as np

    from kinesis_handler_spark.io.multimodal import (
        GIF_H,
        GIF_W,
        _gif_palette_channel,
        _gif_pixel_index,
        decode_gif,
        make_gif_media_df,
    )

    rows = make_gif_media_df(spark, sf_dir).limit(4).collect()
    assert rows
    for r in rows:
        w, h, pb, px = decode_gif(bytes(r["content"]))
        assert (w, h, pb) == (GIF_W, GIF_H, 6)
        mid = int(r["media_id"])
        expect = np.array(
            [
                [
                    [
                        _gif_palette_channel(
                            _gif_pixel_index(mid, x, y), c
                        )
                        for c in range(3)
                    ]
                    for x in range(w)
                ]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        # byte-exact through adaptive LZW + palette mapping
        assert (px == expect).all()


def test_gif_decode_rejects_corruption(spark, sf_dir):
    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        decode_gif,
        make_gif_media_df,
    )

    blob = bytes(
        make_gif_media_df(spark, sf_dir).limit(1).collect()[0]["content"]
    )
    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF00a" + blob[6:])
    with _pytest.raises(ValueError, match="trailer|truncated|EOI"):
        decode_gif(blob[:-2])
    # flip a byte inside the LZW stream: either an invalid code or a
    # pixel-count mismatch must surface, never silent garbage
    corrupted = bytearray(blob)
    corrupted[-10] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_gif(bytes(corrupted))


def test_decode_and_featurize_real_gif_no_fake(spark, sf_dir):
    """image/gif now decodes for REAL through the fake=False gate —
    the per-channel mean feature comes from actual LZW-decoded
    palette-mapped pixels."""
    import numpy as np

    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        _gif_palette_channel,
        _gif_pixel_index,
        decode_and_featurize,
        make_gif_media_df,
    )

    media = make_gif_media_df(spark, sf_dir).limit(3).select(
        "media_id",
        "content",
        F.struct(
            F.lit("image/gif").alias("mime"),
            F.lit(12).alias("width"),
            F.lit(8).alias("height"),
            F.lit(0).alias("duration_ms"),
        ).alias("meta"),
    )
    feats = {
        r["media_id"]: r["feature"]
        for r in decode_and_featurize(media, fake=False).collect()
    }
    assert len(feats) == 3
    for mid, feat in feats.items():
        px = np.array(
            [
                [
                    [
                        _gif_palette_channel(
                            _gif_pixel_index(int(mid), x, y), c
                        )
                        for c in range(3)
                    ]
                    for x in range(12)
                ]
                for y in range(8)
            ],
            dtype=np.float64,
        )
        for c in range(3):
            assert abs(feat[c] - px[:, :, c].mean() / 255.0) < 1e-12


# ---------------------------------------------------------------------------
# IMA ADPCM (r11 verdict ask #6, second codec family)
# ---------------------------------------------------------------------------


def _ref_ima_decode(pred, idx, nibbles):
    """Independent reference IMA decoder for the pin: same spec rules,
    structurally different implementation (bit-weight loop instead of
    the codec's unrolled shift-adds)."""
    steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
             34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
             130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
             408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060,
             1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749,
             3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
             7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
             18500, 20350, 22385, 24623, 27086, 29794, 32767]
    adjust = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = [pred]
    for nib in nibbles:
        step = steps[idx]
        diff = step >> 3
        for bit, shift in ((4, 0), (2, 1), (1, 2)):
            if nib & bit:
                diff += step >> shift
        pred += -diff if nib & 8 else diff
        pred = min(32767, max(-32768, pred))
        idx = min(88, max(0, idx + adjust[nib & 7]))
        out.append(pred)
    return out


def test_adpcm_sample_chain_matches_reference_and_clamps():
    from kinesis_handler_spark.io.multimodal import ima_adpcm_decode_block

    # saturating upward run from near the ceiling: clamp must hold
    up = ima_adpcm_decode_block(32000, 88, [7] * 20)
    assert max(up) == 32767 and up == _ref_ima_decode(32000, 88, [7] * 20)
    # saturating downward run from the floor
    down = ima_adpcm_decode_block(-32000, 88, [15] * 20)
    assert min(down) == -32768
    # index clamp at 0 (nibbles 0..3 adjust -1)
    low = ima_adpcm_decode_block(0, 0, [0, 1, 2, 3] * 10)
    assert low == _ref_ima_decode(0, 0, [0, 1, 2, 3] * 10)
    # full nibble alphabet
    data = [(i * 7 + 3) % 16 for i in range(500)]
    assert ima_adpcm_decode_block(-123, 40, data) == _ref_ima_decode(
        -123, 40, data
    )


def test_adpcm_round_trip_matches_generators(spark, sf_dir):
    from kinesis_handler_spark.io.multimodal import (
        ADPCM_BLOCKS,
        ADPCM_RATE,
        ADPCM_SAMPLES_PER_BLOCK,
        _adpcm_header,
        _adpcm_nibble,
        decode_adpcm_wav,
        ima_adpcm_decode_block,
        make_adpcm_media_df,
    )

    rows = make_adpcm_media_df(spark, sf_dir).limit(4).collect()
    assert rows
    for r in rows:
        mid = int(r["media_id"])
        rate, hdrs, nibs, samples = decode_adpcm_wav(bytes(r["content"]))
        assert rate == ADPCM_RATE
        assert len(samples) == ADPCM_BLOCKS * ADPCM_SAMPLES_PER_BLOCK
        expect_samples = []
        for blk in range(ADPCM_BLOCKS):
            assert hdrs[blk] == _adpcm_header(mid, blk)
            expect_nibs = [
                _adpcm_nibble(mid, blk, i)
                for i in range((256 - 4) * 2)
            ]
            assert nibs[blk] == expect_nibs
            expect_samples.extend(
                ima_adpcm_decode_block(*hdrs[blk], expect_nibs)
            )
        # the full predictor chain, pinned against the independent
        # reference implementation
        ref = []
        for blk in range(ADPCM_BLOCKS):
            ref.extend(_ref_ima_decode(*hdrs[blk], nibs[blk]))
        assert samples == expect_samples == ref


def test_adpcm_decode_rejects_corruption(spark, sf_dir):
    import struct

    import pytest as _pytest

    from kinesis_handler_spark.io.multimodal import (
        decode_adpcm_wav,
        make_adpcm_media_df,
    )

    blob = bytes(
        make_adpcm_media_df(spark, sf_dir).limit(1).collect()[0]["content"]
    )
    with _pytest.raises(ValueError, match="not a RIFF"):
        decode_adpcm_wav(b"RIFX" + blob[4:])
    # PCM fmt tag must be rejected by the ADPCM decoder
    bad_tag = bytearray(blob)
    bad_tag[20:22] = struct.pack("<H", 1)
    with _pytest.raises(ValueError, match="unsupported WAV"):
        decode_adpcm_wav(bytes(bad_tag))
    # fact/sample-count mismatch must surface
    bad_fact = bytearray(blob)
    fact_at = blob.index(b"fact") + 8
    bad_fact[fact_at : fact_at + 4] = struct.pack("<I", 999)
    with _pytest.raises(ValueError, match="fact declares"):
        decode_adpcm_wav(bytes(bad_fact))
    # ragged data chunk (not a whole block)
    with _pytest.raises(ValueError, match="truncated|whole number"):
        decode_adpcm_wav(blob[:-5])


def test_decode_and_featurize_real_adpcm_no_fake(spark, sf_dir):
    import numpy as np

    from pyspark.sql import functions as F

    from kinesis_handler_spark.io.multimodal import (
        decode_adpcm_wav,
        decode_and_featurize,
        make_adpcm_media_df,
    )

    media = make_adpcm_media_df(spark, sf_dir).limit(3).select(
        "media_id",
        "content",
        F.struct(
            F.lit("audio/adpcm").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(126).alias("duration_ms"),
        ).alias("meta"),
    )
    blobs = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    feats = {
        r["media_id"]: r["feature"]
        for r in decode_and_featurize(media, fake=False).collect()
    }
    assert len(feats) == 3
    for mid, feat in feats.items():
        _r, _h, _n, samples = decode_adpcm_wav(blobs[mid])
        expect = float(
            np.abs(np.asarray(samples, dtype=np.int64)).mean()
        ) / 32768.0
        assert abs(feat[0] - expect) < 1e-12


def test_adpcm_batch_kernel_bit_equals_scalar_chain(spark, sf_dir):
    """The vectorized lockstep decoder (what the declared query runs)
    must be bit-equal to the scalar reference chain on every block —
    including clamp-saturating states."""
    import numpy as np

    from kinesis_handler_spark.io.multimodal import (
        ima_adpcm_decode_block,
        ima_adpcm_decode_blocks_batch,
        make_adpcm_media_df,
        parse_adpcm_container,
    )

    rows = make_adpcm_media_df(spark, sf_dir).limit(6).collect()
    preds, idxs, nibs = [], [], []
    for r in rows:
        _rate, hdrs, nbs = parse_adpcm_container(bytes(r["content"]))
        preds.extend(h[0] for h in hdrs)
        idxs.extend(h[1] for h in hdrs)
        nibs.extend(nbs)
    # plus hand-built saturating blocks
    preds += [32000, -32000]
    idxs += [88, 88]
    nibs += [[7] * len(nibs[0]), [15] * len(nibs[0])]
    batch = ima_adpcm_decode_blocks_batch(
        np.asarray(preds), np.asarray(idxs), np.asarray(nibs)
    )
    for b, (p, i, n) in enumerate(zip(preds, idxs, nibs)):
        assert batch[b].tolist() == ima_adpcm_decode_block(p, i, list(n))
