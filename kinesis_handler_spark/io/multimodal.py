"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (SURVEY.md §2.B multimodal row): media travels as a ``BINARY``
column with a metadata struct ``(mime, width, height, duration_ms)``;
decode / feature-extraction / resize / frame-sampling run as Arrow-
batched ``mapInPandas`` stages so bytes never round-trip through
driver-side Python and partitions stream batch-by-batch (bounded
memory even with large blobs).

Decode boundary, two tiers:

* **Real, codec-free**: uncompressed formats decode byte-exactly with
  numpy alone — ``decode_bmp`` parses 24-bit BMP (magic, little-endian
  headers, bottom-up padded BGR rows) and ``decode_wav`` parses
  RIFF/WAVE 16-bit PCM; both are oracle-verified end-to-end by the
  ``multimodal_decode_bmp`` / ``multimodal_decode_wav`` queries.
* **Real, compressed**: PNG decodes for real too — DEFLATE ships in
  the Python standard library (``decode_png``: CRC-verified chunks,
  zlib inflate, all five scanline unfilters), oracle-verified by the
  ``multimodal_decode_png`` / ``multimodal_resize`` queries.
* **Stubbed**: JPEG-class codecs (DCT+Huffman, MP3/AAC video) need
  libraries this container lacks; ``_decode_stub`` raises
  ``NotImplementedError`` unless ``fake=True``, in which case a
  deterministic stand-in exercises the real plumbing — schema, batch
  shape, partitioning.  Swapping in PIL/libav later only replaces the
  inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_handler_spark.tables import table

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, content_sha256 string, "
    "mean_byte double, feature array<double>"
)


def _decode_stub(
    content: bytes, mime: str, fake: bool, digest: bytes | None = None
) -> list[float]:
    """Codec boundary.  Formats the in-repo codecs cover decode for REAL
    regardless of ``fake``: PNG (stdlib zlib, `decode_png`), BMP and
    RIFF/WAVE (numpy) — the feature is the normalized per-channel mean
    (images) or normalized mean |amplitude| (audio).  For everything
    else (JPEG-class: DCT + Huffman) real decoders (PIL, libav) are not
    available in this container; ``fake=True`` substitutes a
    deterministic stand-in (first-16-bytes histogram of the sha256) so
    pipelines stay testable, and ``fake=False`` raises (dead-letter
    contract)."""
    # Dispatch on the CLAIMED mime alone: a blob whose mime names a
    # decodable format but whose bytes are corrupt must surface the
    # codec's ValueError (dead-letter contract), never fall through to
    # the fake stand-in as if decoding succeeded.
    if mime == "image/png":
        _w, _h, _ct, px = decode_png(content)
        return [float(px[:, :, c].mean()) / 255.0 for c in range(3)]
    if mime == "image/bmp":
        _w, _h, _bpp, px = decode_bmp(content)
        return [float(px[:, :, c].mean()) / 255.0 for c in range(3)]
    if mime == "audio/wav":
        _rate, _ch, samples = decode_wav(content)
        import numpy as np

        return [float(np.abs(samples.astype(np.int64)).mean()) / 32768.0]
    if not fake:
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment; pass fake=True "
            "or install the media libraries"
        )
    if digest is None:
        digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:16]]


def decode_and_featurize(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature stage.  One Arrow batch in, one out;
    runs on executors, partition-parallel; blobs never hit the driver."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            contents = pdf["content"]
            metas = pdf["meta"]
            # hash each blob ONCE; the fake-mode feature reuses the
            # digest instead of re-hashing inside the codec boundary
            digests = [hashlib.sha256(b).digest() for b in contents]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in metas],
                    "n_bytes": contents.map(len),
                    "content_sha256": [d.hex() for d in digests],
                    # vectorized byte mean — a per-byte Python sum() is
                    # ~100× slower on the declared hot path
                    "mean_byte": [
                        float(np.frombuffer(b, dtype=np.uint8).mean())
                        if len(b)
                        else 0.0
                        for b in contents
                    ],
                    "feature": [
                        _decode_stub(c, m["mime"], fake, digest=d)
                        for c, m, d in zip(contents, metas, digests)
                    ],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def make_multimodal_df(
    spark: SparkSession, sf_dir: str, mime: str = "image/fake"
) -> DataFrame:
    """Derive a multimodal table from the documents fixture: text bytes
    stand in for media blobs (deterministic), with a typed meta struct.
    At 100 TB the same shape comes straight off parquet with real blobs.
    """
    # Dirty-data contract (tests/test_null_input.py): no id or no text
    # ⇒ no media blob to build — drop, as the matching oracles do.
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(0).alias("duration_ms"),
        ).alias("meta"),
    )

RESIZED_SCHEMA = (
    "media_id long, mime string, width int, height int, content binary"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, frame_sha256 string, "
    "frame binary"
)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize stage (images): binary in → binary out with updated
    dimensions in flat columns.  The pixel work is the stub boundary
    (PIL absent here; ``fake`` derives a deterministic width*height
    byte plane from the content hash), but the 100 TB-relevant parts
    are real: Arrow batch streaming, constant output dimensions for
    downstream batch tensorization, and no driver round-trip."""

    if not fake:
        # no real resize codec path exists for arbitrary mimes — fail at
        # the DRIVER before launching a job whose every task would raise
        # (and be retried) executor-side
        raise NotImplementedError(
            "resize_media has no real codec path; pass fake=True "
            "(real pixel resize exists for PNG via the "
            "multimodal_resize query)"
        )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        plane = width * height
        for pdf in batches:
            out_bytes = []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                seed = hashlib.sha256(content).digest()
                out_bytes.append((seed * (plane // len(seed) + 1))[:plane])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "content": out_bytes,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """Frame-sampling stage (video): 1 media row → N frame rows (the
    UDTF shape, done inside mapInPandas so the expansion happens
    executor-side per Arrow batch).  Frames are taken every
    ``every_ms`` over ``meta.duration_ms``, capped at ``max_frames``
    per video — the cap bounds output skew when one video is hours
    long (the straggler guard at scale)."""
    if not fake:
        # driver-side fail-fast: no real video codec path exists, so
        # don't launch a job whose every task raises and retries
        raise NotImplementedError(
            "sample_frames has no real video codec path; pass fake=True"
        )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes, frames = [], [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                duration = int(meta["duration_ms"] or 0)
                n = min(max_frames, max(1, duration // every_ms))
                for i in range(n):
                    ts = i * every_ms
                    frame = hashlib.sha256(
                        content + ts.to_bytes(8, "little")
                    ).digest()
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    hashes.append(frame.hex())
                    frames.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "frame_sha256": hashes,
                    "frame": frames,
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


PNG_MAGIC_HEX = "89504E470D0A1A0A"
PNG_MAGIC = bytes.fromhex(PNG_MAGIC_HEX)


def make_headered_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture with a REAL parseable header: content = PNG magic
    (8 bytes) ‖ width ‖ height (4-byte big-endian each, derived
    deterministically from doc_id) ‖ payload bytes.  Unlike
    ``make_multimodal_df``'s opaque blobs, these bytes carry structure
    the engine can sniff without any codec library — the header-probe
    stage every multimodal ingest runs BEFORE deciding to decode."""
    # Dirty-data contract (tests/test_null_input.py): no id or no text
    # ⇒ no media blob to build — drop, as the matching oracles do.
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )

    def be4(col: F.Column) -> F.Column:
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    # pmod, not %: dims must stay in [64, 256) for negative ids too (a
    # negative "width" would be nonsense in the header and diverge the
    # engines), and the pre-reduction before *7 keeps the arithmetic
    # int64-safe for full-range ids — both engines raise on int64
    # overflow (r7 extreme-key twin find).  Identical to the old
    # expressions for the fixtures' non-negative ids.
    d192 = F.pmod(F.col("doc_id"), F.lit(192))
    width = (F.lit(64) + d192).cast("int")
    height = (F.lit(64) + (d192 * 7) % 192).cast("int")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.unhex(F.lit(PNG_MAGIC_HEX)),
            be4(width),
            be4(height),
            F.encode("text", "UTF-8"),
        ).alias("content"),
    )


# ---------------------------------------------------------------------------
# Real (codec-free) image decode: BMP is uncompressed, so a byte-exact
# decoder needs only numpy — no external codec library.  This upgrades the
# decode boundary from "stubbed" to "real for uncompressed formats";
# PNG gained a real stdlib-zlib codec below, leaving JPEG-class codecs
# (DCT + Huffman) as the only stubbed frontier.
# ---------------------------------------------------------------------------

BMP_W, BMP_H = 10, 6  # W*3 = 30 bytes/row -> stride 32: exercises row padding


def _bmp_pixel(doc_id: int, x: int, y: int, c: int) -> int:
    """Deterministic pixel value, c in {0,1,2} = R,G,B — the arithmetic
    the DuckDB oracle replays to verify the decode end-to-end."""
    return (doc_id * 7 + x * 3 + y * 5 + c * 11) % 256


def make_bmp_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID 24-bit BMP files built per document id:
    14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up BGR pixel
    rows padded to 4-byte boundaries — every structural feature a real
    BMP decoder must handle.  Built executor-side per Arrow batch (the
    blobs never touch the driver)."""
    import struct

    # Dirty-data contract (tests/test_null_input.py): a NULL doc_id has
    # no derivable media — drop it; matching oracles filter identically.
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride = (BMP_W * 3 + 3) // 4 * 4
        img_size = stride * BMP_H
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rows = bytearray()
                for y in reversed(range(BMP_H)):  # bottom-up storage
                    row = bytearray()
                    for x in range(BMP_W):
                        # BGR on disk
                        row += bytes(
                            (
                                _bmp_pixel(doc_id, x, y, 2),
                                _bmp_pixel(doc_id, x, y, 1),
                                _bmp_pixel(doc_id, x, y, 0),
                            )
                        )
                    row += b"\x00" * (stride - len(row))
                    rows += row
                header = struct.pack(
                    "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII",
                    40, BMP_W, BMP_H, 1, 24, 0, img_size, 2835, 2835, 0, 0,
                )
                blobs.append(bytes(header + rows))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "content": blobs}
            )

    return d.mapInPandas(build, "media_id long, content binary")


def decode_bmp(content: bytes):
    """REAL BMP decode with numpy: validates the magic, reads the
    little-endian header fields, un-pads and un-flips the bottom-up BGR
    rows.  Returns (width, height, bpp, pixels[H,W,3] in RGB order).
    Raises ValueError on malformed input (the dead-letter contract)."""
    import numpy as np

    b = np.frombuffer(content, dtype=np.uint8)
    if len(b) < 54 or bytes(b[:2]) != b"BM":
        raise ValueError("not a BMP")
    offset = int(b[10:14].view("<u4")[0])
    width = int(b[18:22].view("<i4")[0])
    height = int(b[22:26].view("<i4")[0])
    bpp = int(b[28:30].view("<u2")[0])
    if bpp != 24 or height <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp})")
    stride = (width * 3 + 3) // 4 * 4
    rows = b[offset : offset + stride * height].reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)[::-1]  # un-flip
    return width, height, bpp, bgr[:, :, ::-1]  # BGR -> RGB


WAV_RATE, WAV_N = 8000, 240  # 30 ms of 16-bit mono PCM


def _wav_sample(doc_id: int, i: int) -> int:
    """Deterministic 16-bit PCM sample in [-32768, 32767] — a ramp the
    oracle replays: ((doc_id*31 + i*17) % 65536) - 32768 (as
    pmod(doc_id, 65536)*31 — Python's floor-mod here is exact-bignum
    and non-negative, so the oracle pre-reduces the id to match without
    int64 overflow on full-range ids)."""
    return ((doc_id * 31 + i * 17) % 65536) - 32768


def make_wav_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID RIFF/WAVE files (16-bit mono PCM) built
    per document id: RIFF header, fmt chunk, data chunk — the canonical
    uncompressed audio container, decodable with numpy alone."""
    import struct

    # Dirty-data contract (tests/test_null_input.py): a NULL doc_id has
    # no derivable media — drop it; matching oracles filter identically.
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                pcm = b"".join(
                    struct.pack("<h", _wav_sample(doc_id, i))
                    for i in range(WAV_N)
                )
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(pcm))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack(
                        "<IHHIIHH",
                        16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16,
                    )
                    + b"data"
                    + struct.pack("<I", len(pcm))
                )
                blobs.append(hdr + pcm)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "content": blobs}
            )

    return d.mapInPandas(build, "media_id long, content binary")


def decode_wav(content: bytes):
    """REAL WAV decode with numpy: validates RIFF/WAVE magic, reads the
    fmt chunk (PCM only), locates the data chunk, and returns
    (sample_rate, channels, samples int16 ndarray).  Raises ValueError
    on malformed/compressed input (the dead-letter contract)."""
    import numpy as np

    b = np.frombuffer(content, dtype=np.uint8)
    if len(b) < 44 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    if bytes(b[12:16]) != b"fmt ":
        raise ValueError("fmt chunk not first")
    audio_format = int(b[20:22].view("<u2")[0])
    channels = int(b[22:24].view("<u2")[0])
    rate = int(b[24:28].view("<u4")[0])
    bits = int(b[34:36].view("<u2")[0])
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bytes(b[36:40]) != b"data":
        raise ValueError("data chunk not found")
    n_bytes = int(b[40:44].view("<u4")[0])
    if len(b) < 44 + n_bytes:
        raise ValueError(
            f"truncated data chunk: header declares {n_bytes} bytes, "
            f"{len(b) - 44} present"
        )
    samples = b[44 : 44 + n_bytes].view("<i2")
    return rate, channels, samples


# ---------------------------------------------------------------------------
# Real COMPRESSED-format decode: PNG needs only stdlib zlib + numpy — the
# container has no codec libraries, but DEFLATE is in the standard library,
# so a byte-exact PNG codec (all five row filters, CRC-validated chunks)
# upgrades the decode boundary from "real for uncompressed formats only"
# to "real for PNG"; JPEG (DCT + Huffman) remains the stubbed frontier.
# ---------------------------------------------------------------------------

PNG_W, PNG_H = 12, 8


def _png_pixel(doc_id: int, x: int, y: int, c: int) -> int:
    """Deterministic pixel value, c in {0,1,2} = R,G,B — the arithmetic
    the DuckDB oracle replays: (doc_id*11 + x*7 + y*13 + c*5) % 256
    (as pmod(doc_id, 256)*11 — see `_wav_sample` on why the oracle
    pre-reduces the id)."""
    return (doc_id * 11 + x * 7 + y * 13 + c * 5) % 256


def _png_chunk(name: bytes, payload: bytes) -> bytes:
    import struct
    import zlib as _zlib

    return (
        struct.pack(">I", len(payload))
        + name
        + payload
        + struct.pack(">I", _zlib.crc32(name + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def make_png_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID compressed PNG files built per document
    id: signature, IHDR (8-bit RGB, color type 2), one zlib-compressed
    IDAT whose scanlines CYCLE through all five PNG filter types
    (y % 5: None/Sub/Up/Average/Paeth — so the decoder's every
    unfilter path is exercised on every image), and IEND, each chunk
    CRC32-stamped.  Built executor-side per Arrow batch."""
    import struct
    import zlib as _zlib

    # Dirty-data contract (tests/test_null_input.py): a NULL doc_id has
    # no derivable media — drop it; matching oracles filter identically.
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bpp = 3
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                raw = [
                    [
                        _png_pixel(doc_id, x, y, c)
                        for x in range(PNG_W)
                        for c in range(3)
                    ]
                    for y in range(PNG_H)
                ]
                stream = bytearray()
                for y in range(PNG_H):
                    ftype = y % 5
                    cur, prev = raw[y], raw[y - 1] if y else [0] * PNG_W * 3
                    stream.append(ftype)
                    for i, v in enumerate(cur):
                        a = cur[i - bpp] if i >= bpp else 0
                        b = prev[i]
                        cc = prev[i - bpp] if i >= bpp else 0
                        if ftype == 0:
                            f = v
                        elif ftype == 1:
                            f = (v - a) % 256
                        elif ftype == 2:
                            f = (v - b) % 256
                        elif ftype == 3:
                            f = (v - (a + b) // 2) % 256
                        else:
                            f = (v - _paeth(a, b, cc)) % 256
                        stream.append(f)
                ihdr = struct.pack(
                    ">IIBBBBB", PNG_W, PNG_H, 8, 2, 0, 0, 0
                )
                blob = (
                    b"\x89PNG\r\n\x1a\n"
                    + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"IDAT", _zlib.compress(bytes(stream)))
                    + _png_chunk(b"IEND", b"")
                )
                blobs.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "content": blobs}
            )

    return d.mapInPandas(build, "media_id long, content binary")


def decode_png(content: bytes):
    """REAL PNG decode with stdlib zlib + numpy: validates the
    signature, walks the chunk stream verifying every CRC32, parses
    IHDR (8-bit RGB only), inflates the concatenated IDAT payload, and
    reverses the per-scanline filters (None/Sub/Up/Average/Paeth).
    Returns (width, height, color_type, pixels[H,W,3] RGB).  Raises
    ValueError on malformed input (the dead-letter contract)."""
    import struct
    import zlib as _zlib

    import numpy as np

    if len(content) < 8 or content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        name = content[pos + 4 : pos + 8]
        payload = content[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(content):
            raise ValueError(f"truncated {name!r} chunk")
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if _zlib.crc32(name + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {name!r} chunk")
        if name == b"IHDR":
            ihdr = payload
        elif name == b"IDAT":
            idat += payload
        elif name == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype})"
        )
    stream = _zlib.decompress(idat)
    bpp, stride = 3, w * 3
    if len(stream) != h * (stride + 1):
        raise ValueError("inflated size does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = stream[pos]
        row = bytearray(stream[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up: vectorized
            row = bytearray(
                (np.frombuffer(bytes(row), dtype=np.uint8) + prev).astype(
                    np.uint8
                ).tobytes()
            )
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                if ftype == 1:
                    row[i] = (row[i] + a) % 256
                elif ftype == 3:
                    row[i] = (row[i] + (a + b) // 2) % 256
                else:
                    row[i] = (row[i] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    return w, h, ctype, out.reshape(h, w, 3)
