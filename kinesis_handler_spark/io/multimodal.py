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
* **Real, entropy-coded**: baseline sequential JPEG decodes for real
  as well (r7 verdict item 6) — ``decode_jpeg`` implements the full
  ITU T.81 baseline pipeline in numpy + stdlib: marker/segment walk,
  DQT/SOF0/DHT/SOS parsing, canonical Huffman entropy decode with
  byte-unstuffing, DC DPCM reconstruction, dequantize, de-zigzag,
  float IDCT, level shift, and YCbCr→RGB.  The
  ``multimodal_decode_jpeg`` query oracle-verifies the lossless 90%
  (markers + Huffman + DPCM + dequant) by replaying the fixture
  generator's coefficient arithmetic in SQL; the lossy tail (IDCT,
  color transform) is pinned by pytest against an independent
  direct-form IDCT (tests/test_multimodal.py).
* **Real, video**: MJPEG inside a RIFF-AVI container decodes for real
  (r8 verdict item 4) — ``decode_avi_mjpeg`` walks the RIFF chunk
  tree (avih/strh/strf headers, LIST recursion, movi frame chunks,
  idx1) and every frame is a baseline JPEG handled by ``decode_jpeg``;
  frame sampling (``sample_frames(fake=False)``) returns the actual
  JPEG payloads.  Oracle-verified end-to-end by the
  ``multimodal_decode_video`` query.
* **Stubbed**: inter-frame video codecs (H.26x/VP9/AV1) and
  perceptual audio (MP3/AAC) still need libraries this container
  lacks; ``_decode_stub`` raises ``NotImplementedError`` for them
  unless ``fake=True``, in which case a deterministic stand-in
  exercises the real plumbing — schema, batch shape, partitioning.
  Swapping in libav later only replaces the inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_handler_spark.functions.worker_tune import tuned
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


# Per-task granularity of SOURCE-table bytes for a Python media
# build/decode stage: each source byte fans out into ~10²-10³ Python/
# numpy decode operations downstream, so 64 KiB of source per task is
# hundreds of ms of real work — enough to amortize the ~tens-of-ms
# per-task scheduling + Python-worker round-trip overhead.  A width
# sweep at sf0.1 (594 KB documents table) put the optimum at 8-16
# partitions for EVERY codec (bmp 0.41 s @w8 vs 1.11 @w64 and 0.76
# unspread; video 0.94 @w16 vs 1.91 @w64 and 5.55 unspread); this
# divisor lands there (width 10) and grows linearly with the corpus to
# the 2×cores cap, so larger inputs saturate the cluster exactly when
# they have the work to fill it.
_SPREAD_SRC_BYTES_PER_TASK = 64 << 10


def _spread(d: DataFrame) -> DataFrame:
    """Hash-repartition the tiny doc_id frame across the cluster before
    a Python-heavy mapInPandas build/decode stage.

    The fixture tables arrive as a handful of small parquet files, so
    the scan is 1-2 tasks and, without this, the ENTIRE per-document
    encode+decode pipeline runs serially on one core (optimization
    guide §2.5 — unsplittable input: repartition immediately after the
    read; measured r12: multimodal_decode_video 5.6 s → ~0.9 s at
    sf0.1).  The exchange moves only the 8-byte ids, never media bytes.

    Width is derived from the SOURCE TABLE'S BYTES (guide §2: derive
    partitioning from input size, not a constant): ceil(scan bytes /
    ``_SPREAD_SRC_BYTES_PER_TASK``) clamped to [2, 2× cluster cores].
    The first r12 cut used a flat 2×cores and a width sweep showed that
    over-widens small inputs — at sf0.1 the ~0.5-1 s of extra-stage +
    64-task + Python-worker overhead cost MORE than the decode for the
    cheap codecs (bmp/wav/gif) and even slowed the heavy ones (numbers
    on ``_SPREAD_SRC_BYTES_PER_TASK``).  File sizes come from the
    driver-side file index (``inputFiles`` + one FileSystem.getFileStatus
    per file — no Spark job); a source with no listable files (e.g. an
    in-memory test frame) falls back to the 2×cores cap, as before.
    Deliberately NOT derived from the input's own partition count:
    probing ``d.rdd.getNumPartitions()`` at plan-build time measured
    ~0.7 s per query invocation (it forces a separate QueryExecution),
    and AQE must not coalesce this exchange by bytes — the downstream
    stage is CPU-bound Python, not shuffle-bound, so 8-byte id
    partitions that look "too small" to AQE are exactly right.  Hash on
    doc_id keeps the assignment deterministic under task retry (guide
    §2.5's rand-repartition hazard) and the per-doc build makes row
    placement semantically irrelevant."""
    sc = d.sparkSession.sparkContext
    cap = 2 * sc.defaultParallelism
    width = cap
    try:
        files = d.inputFiles()
        if files:
            jvm = sc._jvm
            hconf = sc._jsc.hadoopConfiguration()
            total = 0
            for p in files:
                path = jvm.org.apache.hadoop.fs.Path(p)
                fs = path.getFileSystem(hconf)
                total += fs.getFileStatus(path).getLen()
            width = max(
                2,
                min(
                    cap,
                    -(-total // _SPREAD_SRC_BYTES_PER_TASK),
                ),
            )
    except Exception:  # noqa: BLE001 - sizing is a hint, never a failure
        width = cap
    return d.repartition(width, "doc_id")


def _decode_stub(
    content: bytes, mime: str, fake: bool, digest: bytes | None = None
) -> list[float]:
    """Codec boundary.  Formats the in-repo codecs cover decode for REAL
    regardless of ``fake``: PNG (stdlib zlib, `decode_png`), baseline
    JPEG (`decode_jpeg` — Huffman + IDCT, r7 verdict item 6), BMP and
    RIFF/WAVE (numpy), and MJPEG-AVI video (`decode_avi_mjpeg` +
    per-frame `decode_jpeg`, r8 verdict item 4) — the feature is the
    normalized per-channel mean (images: one frame; video: across all
    frames) or normalized mean |amplitude| (audio).  For everything
    else (inter-frame video codecs: H.26x/VP9/AV1, perceptual audio:
    MP3/AAC) real decoders (libav) are not available in this container;
    ``fake=True`` substitutes a deterministic stand-in (first-16-bytes
    histogram of the sha256) so pipelines stay testable, and
    ``fake=False`` raises (dead-letter contract)."""
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
    if mime == "image/gif":
        _w, _h, _pb, px = decode_gif(content)
        return [float(px[:, :, c].mean()) / 255.0 for c in range(3)]
    if mime == "audio/wav":
        _rate, _ch, samples = decode_wav(content)
        import numpy as np

        return [float(np.abs(samples.astype(np.int64)).mean()) / 32768.0]
    if mime == "audio/adpcm":
        import numpy as np

        _rate, _hdrs, _nibs, adpcm_samples = decode_adpcm_wav(content)
        return [
            float(np.abs(np.asarray(adpcm_samples, dtype=np.int64)).mean())
            / 32768.0
        ]
    if mime == "image/jpeg":
        _w, _h, _n, px = decode_jpeg(content)
        return [float(px[:, :, c].mean()) / 255.0 for c in range(3)]
    if mime == "video/x-msvideo":
        import numpy as np

        _w, _h, _usec, frames = decode_avi_mjpeg(content)
        stack = np.stack([decode_jpeg(fr)[3] for fr in frames])
        return [float(stack[..., c].mean()) / 255.0 for c in range(3)]
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

    return df.mapInPandas(tuned(run), FEATURE_SCHEMA)


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

    return df.mapInPandas(tuned(run), RESIZED_SCHEMA)


def sample_mjpeg_payloads(
    content: bytes, every_ms: int, max_frames: int
) -> list[tuple[int, int, bytes]]:
    """Index-driven frame sampling over one MJPEG-AVI container: the
    sampled (sample_idx, ts_ms, jpeg_payload) triples at every
    ``every_ms``, capped at ``max_frames``.  Source frame =
    floor(ts / frame_ms) clamped to the last frame.  Only the RETURNED
    payloads are ever handed to a decoder — skipped frames cost a
    chunk-walk skip, never an entropy decode.  Shared core of
    ``sample_frames(fake=False)`` and the ``multimodal_frame_sample``
    query so the sampling arithmetic cannot drift between them."""
    _w, _h, usec, payloads = decode_avi_mjpeg(content)
    if usec <= 0 or not payloads:
        # Parseable container but no playable stream: surface a diagnostic
        # instead of the raw ZeroDivisionError/IndexError the arithmetic
        # below would throw (dead-letter contract: per-blob errors must
        # say WHAT was wrong with the blob).
        raise ValueError("empty or zero-rate MJPEG container")
    frame_ms = usec / 1000.0
    duration = frame_ms * len(payloads)
    n = min(max_frames, max(1, int(duration // every_ms)))
    out = []
    for i in range(n):
        ts = i * every_ms
        src = min(int(ts / frame_ms), len(payloads) - 1)
        out.append((i, ts, payloads[src]))
    return out


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """Frame-sampling stage (video): 1 media row → N frame rows (the
    UDTF shape, done inside mapInPandas so the expansion happens
    executor-side per Arrow batch).  Frames are taken every
    ``every_ms`` over ``meta.duration_ms``, capped at ``max_frames``
    per video — the cap bounds output skew when one video is hours
    long (the straggler guard at scale).

    ``fake=False`` is the REAL path (r8 verdict item 4): MJPEG-AVI
    containers are parsed by ``decode_avi_mjpeg`` and the sampled
    frames are the actual JPEG payloads at the nearest timestamps —
    any other mime raises the dead-letter NotImplementedError
    executor-side per blob.  ``fake=True`` keeps the deterministic
    hash stand-in for inter-frame codecs this container can't decode."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes, frames = [], [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                if not fake:
                    if meta["mime"] != "video/x-msvideo":
                        raise NotImplementedError(
                            f"no real frame codec for {meta['mime']!r}; "
                            "pass fake=True"
                        )
                    for i, ts, blob in sample_mjpeg_payloads(
                        bytes(content), every_ms, max_frames
                    ):
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(ts)
                        hashes.append(hashlib.sha256(blob).hexdigest())
                        frames.append(blob)
                    continue
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

    return df.mapInPandas(tuned(run), FRAME_SCHEMA)


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
        .transform(_spread)
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

    return d.mapInPandas(tuned(build), "media_id long, content binary")


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
        .transform(_spread)
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

    return d.mapInPandas(tuned(build), "media_id long, content binary")


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
# Real COMPRESSED audio decode: IMA ADPCM (WAV format tag 0x0011) is pure
# integer arithmetic — a 4-bit nibble stream driven through the 89-entry
# step table with per-block predictor/step-index headers — so a byte-
# exact decoder needs no library (r11 verdict ask #6's second family).
# Oracle strategy mirrors JPEG: the fixture is built in the NIBBLE
# domain (deterministic per doc), the container/header/nibble layer is
# lossless and DuckDB-replayable, and the recursive predictor chain
# (the sample domain) is pytest-pinned against an independent pure-
# Python reference decoder.  Perceptual audio (MP3/AAC) remains the
# stubbed audio frontier.
# ---------------------------------------------------------------------------

#: IMA/DVI ADPCM step-size table (89 entries) and index-adjust table —
#: constants from the IMA ADPCM specification.
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)

ADPCM_RATE = 8000
ADPCM_BLOCK_ALIGN = 256  # bytes: 4-byte header + 252 nibble bytes
ADPCM_SAMPLES_PER_BLOCK = 1 + (ADPCM_BLOCK_ALIGN - 4) * 2  # 505
ADPCM_BLOCKS = 2


def _adpcm_header(doc_id: int, blk: int) -> tuple[int, int]:
    """Deterministic per-block (predictor, step_index) — the arithmetic
    the DuckDB oracle replays from the stored block headers."""
    return ((doc_id * 37 + blk * 11) % 4096) - 2048, (doc_id + blk * 3) % 89


def _adpcm_nibble(doc_id: int, blk: int, i: int) -> int:
    """Deterministic nibble i of block blk — oracle-replayable."""
    return (doc_id * 7 + blk * 13 + i * 5) % 16


def ima_adpcm_decode_block(
    predictor: int, index: int, nibbles
) -> list[int]:
    """Decode one IMA ADPCM block: the header's predictor is the first
    output sample; each nibble then advances the (predictor, step
    index) state through the spec tables with int16 clamping.  Pure
    integer arithmetic — bit-exact on every platform."""
    out = [predictor]
    for nib in nibbles:
        step = _IMA_STEPS[index]
        diff = step >> 3
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        predictor = predictor - diff if nib & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IMA_INDEX_ADJUST[nib & 7]))
        out.append(predictor)
    return out


def ima_adpcm_decode_blocks_batch(preds, idxs, nibs):
    """Vectorized IMA decode of MANY blocks in lockstep: the predictor
    chain is inherently sequential WITHIN a block, but every block in
    an Arrow batch advances independently — so the loop runs once per
    nibble POSITION (504 numpy steps) over a (n_blocks,) state vector
    instead of once per (block, nibble) pair in Python (~10-50× on
    real batches).  ``preds``/``idxs``: (B,) int arrays; ``nibs``:
    (B, N) int array.  Returns (B, N+1) int64 samples — bit-equal to
    ``ima_adpcm_decode_block`` per row (pinned in
    tests/test_multimodal.py)."""
    import numpy as np

    steps = np.asarray(_IMA_STEPS, dtype=np.int64)
    adj = np.asarray(_IMA_INDEX_ADJUST, dtype=np.int64)
    nibs = np.asarray(nibs, dtype=np.int64)
    n_blocks, n = nibs.shape
    out = np.empty((n_blocks, n + 1), dtype=np.int64)
    pred = np.asarray(preds, dtype=np.int64).copy()
    idx = np.asarray(idxs, dtype=np.int64).copy()
    out[:, 0] = pred
    for i in range(n):
        nib = nibs[:, i]
        step = steps[idx]
        diff = (
            (step >> 3)
            + np.where(nib & 4, step, 0)
            + np.where(nib & 2, step >> 1, 0)
            + np.where(nib & 1, step >> 2, 0)
        )
        pred = np.where(nib & 8, pred - diff, pred + diff)
        np.clip(pred, -32768, 32767, out=pred)
        idx = np.clip(idx + adj[nib & 7], 0, 88)
        out[:, i + 1] = pred
    return out


def make_adpcm_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID IMA-ADPCM WAV files built per document
    id: RIFF/WAVE container with a 20-byte fmt chunk (wFormatTag
    0x0011, cbSize 2, wSamplesPerBlock), a fact chunk (total sample
    count — mandatory for compressed WAV), and a data chunk of
    ``ADPCM_BLOCKS`` fixed-align blocks, each a 4-byte
    (predictor, step-index) header plus 252 packed nibble bytes (low
    nibble first).  Built executor-side per Arrow batch."""
    import struct

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .transform(_spread)
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_nibs = (ADPCM_BLOCK_ALIGN - 4) * 2
        i_arr = np.arange(n_nibs, dtype=np.int64)
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                data = bytearray()
                for blk in range(ADPCM_BLOCKS):
                    pred, idx = _adpcm_header(doc_id, blk)
                    data += struct.pack("<hBB", pred, idx, 0)
                    # vectorized _adpcm_nibble over all positions
                    nibs = (doc_id * 7 + blk * 13 + i_arr * 5) % 16
                    data += (
                        nibs[0::2] | (nibs[1::2] << 4)
                    ).astype(np.uint8).tobytes()
                n_samples = ADPCM_BLOCKS * ADPCM_SAMPLES_PER_BLOCK
                fmt = struct.pack(
                    "<HHIIHHHH",
                    0x0011, 1, ADPCM_RATE,
                    ADPCM_RATE * ADPCM_BLOCK_ALIGN
                    // ADPCM_SAMPLES_PER_BLOCK,
                    ADPCM_BLOCK_ALIGN, 4, 2, ADPCM_SAMPLES_PER_BLOCK,
                )
                fact = struct.pack("<I", n_samples)
                blob = (
                    b"RIFF"
                    + struct.pack(
                        "<I",
                        4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data),
                    )
                    + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"fact" + struct.pack("<I", len(fact)) + fact
                    + b"data" + struct.pack("<I", len(data)) + bytes(data)
                )
                blobs.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "content": blobs}
            )

    return d.mapInPandas(tuned(build), "media_id long, content binary")


def parse_adpcm_container(content: bytes):
    """The LOSSLESS layer of the IMA-ADPCM decode: RIFF chunk walk
    (fmt/fact/data in any order), wFormatTag 0x0011 / mono / 4-bit
    validation, block split, per-block (predictor, step-index) header
    parse, nibble unpack (low first), and the structural fact-chunk
    sample-count check.  Returns (sample_rate, headers, nibbles).
    Raises ValueError on malformed input (the dead-letter contract).
    Factored from :func:`decode_adpcm_wav` so the declared query can
    feed the batch-vectorized chain kernel."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, fact_samples, data = 12, None, None, None
    while pos + 8 <= len(content):
        name = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        payload = content[pos + 8 : pos + 8 + size]
        if len(payload) != size:
            raise ValueError(f"truncated {name!r} chunk")
        if name == b"fmt ":
            fmt = payload
        elif name == b"fact":
            (fact_samples,) = struct.unpack("<I", payload[:4])
        elif name == b"data":
            data = payload
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 20:
        raise ValueError("fmt chunk too short for ADPCM")
    tag, channels, rate, _bps, align, bits, _cb, spb = struct.unpack(
        "<HHIIHHHH", fmt[:20]
    )
    if tag != 0x0011 or channels != 1 or bits != 4:
        raise ValueError(
            f"unsupported WAV (format={tag:#x}, channels={channels}, "
            f"bits={bits})"
        )
    if len(data) % align:
        raise ValueError("data chunk is not a whole number of blocks")
    if spb != 1 + (align - 4) * 2:
        raise ValueError("wSamplesPerBlock inconsistent with block align")
    import numpy as np

    headers, nibbles = [], []
    for off in range(0, len(data), align):
        block = data[off : off + align]
        pred, idx, _res = struct.unpack("<hBB", block[:4])
        if idx > 88:
            raise ValueError(f"step index {idx} out of range")
        packed = np.frombuffer(block[4:], dtype=np.uint8)
        nibs = np.empty(packed.size * 2, dtype=np.int64)
        nibs[0::2] = packed & 0x0F  # low nibble first (IMA order)
        nibs[1::2] = packed >> 4
        headers.append((pred, idx))
        nibbles.append(nibs.tolist())
    if not headers:
        raise ValueError("empty data chunk: zero ADPCM blocks")
    n_samples = len(headers) * spb
    if fact_samples is not None and fact_samples != n_samples:
        raise ValueError(
            f"fact declares {fact_samples} samples, decoded {n_samples}"
        )
    return rate, headers, nibbles


def decode_adpcm_wav(content: bytes):
    """REAL IMA-ADPCM WAV decode with no library: the container walk of
    :func:`parse_adpcm_container` plus the per-block IMA predictor
    chain.  Returns (sample_rate, block_headers,
    nibbles[n_blocks][...], samples int16 list) — headers and nibbles
    are the lossless layer the DuckDB oracle replays; samples are the
    real decoded audio.  This is the REFERENCE path (scalar chain);
    the declared query decodes the same blocks through the vectorized
    :func:`ima_adpcm_decode_blocks_batch`, pinned bit-equal."""
    rate, headers, nibbles = parse_adpcm_container(content)
    samples: list[int] = []
    for (pred, idx), nibs in zip(headers, nibbles):
        samples.extend(ima_adpcm_decode_block(pred, idx, nibs))
    return rate, headers, nibbles, samples


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
        .transform(_spread)
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

    return d.mapInPandas(tuned(build), "media_id long, content binary")


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


# ---------------------------------------------------------------------------
# Real DICTIONARY-CODED image decode: GIF (r11 verdict ask #6).  LZW is
# pure arithmetic — variable-width codes, a growing string table, clear/
# EOI control codes — so a byte-exact GIF89a codec needs no library at
# all.  The fixture encoder is full ADAPTIVE LZW (not the uncompressed-
# GIF trick), so the decoder's string-table growth, width transitions,
# and table-full reset all run on every image; palette-indexed pixels
# keep the oracle in exact integer arithmetic end-to-end (LZW is
# lossless).  Remaining stubs after this: inter-frame video (H.26x/VP9)
# and perceptual audio (MP3/AAC).
# ---------------------------------------------------------------------------

GIF_W, GIF_H = 12, 8
#: 64-entry global color table => 6-bit pixel indices (min LZW code size
#: 6); palette channel formulas are the DuckDB-replayable arithmetic.
GIF_PALETTE_BITS = 6


def _gif_pixel_index(doc_id: int, x: int, y: int) -> int:
    """Deterministic palette index — the arithmetic the DuckDB oracle
    replays: (doc_id*11 + x*7 + y*13) % 64 (with the oracle pre-reducing
    doc_id mod 256 exactly like `_png_pixel`)."""
    return (doc_id * 11 + x * 7 + y * 13) % 64


def _gif_palette_channel(i: int, c: int) -> int:
    """Palette entry channel c in {0,1,2}=R,G,B for index i."""
    return ((i * 5 + 1) % 256, (i * 7 + 3) % 256, (i * 11 + 5) % 256)[c]


def gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder: variable code width starting at
    ``min_code_size + 1``, LSB-first bit packing, CLEAR emitted first
    and again whenever the table fills (4096), EOI last.  The width
    grows when ``next_code == (1 << width) + 1`` — one entry LATER than
    the decoder's ``== (1 << width)`` rule, because the decoder learns
    each string one code behind the encoder (the classic sync rule;
    tests pin a hand-derived code stream byte-for-byte)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    bitbuf = nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int]:
        return {(i,): i for i in range(clear)}, eoi + 1

    table, next_code = reset()
    emit(clear)
    prefix: tuple = ()
    for k in indices:
        k = int(k)
        cand = prefix + (k,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            width = min_code_size + 1
            table, next_code = reset()
        prefix = (k,)
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW decoder (the spec algorithm): LSB-first variable-
    width code reader, string table rebuilt from the stream, the
    KwKwK special case (``code == next_code``), width growth at
    ``next_code == (1 << width)``, table freeze at 4096 until CLEAR.
    Raises ValueError on out-of-range codes or a missing EOI (the
    dead-letter contract)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(eoi + 1)]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitbuf = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            table = [(i,) for i in range(eoi + 1)]
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):  # clear/eoi were handled above
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _gif_subblocks(data: bytes) -> bytes:
    """Wrap a byte stream into GIF data sub-blocks (<=255 bytes each,
    zero-length terminator)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID GIF89a files built per document id:
    header, logical screen descriptor, 64-entry global color table,
    a graphic control extension AND a comment extension (so the
    decoder's extension-skipping path runs on every image), one
    non-interlaced image descriptor whose pixel indices are fully
    LZW-compressed (adaptive table, variable widths), and the 0x3B
    trailer.  Built executor-side per Arrow batch."""
    import struct

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .transform(_spread)
    )
    palette = bytes(
        _gif_palette_channel(i, c)
        for i in range(1 << GIF_PALETTE_BITS)
        for c in range(3)
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                indices = [
                    _gif_pixel_index(doc_id, x, y)
                    for y in range(GIF_H)
                    for x in range(GIF_W)
                ]
                # flags: GCT present | color resolution 7 | GCT size 64
                lsd = struct.pack(
                    "<HHBBB", GIF_W, GIF_H,
                    0x80 | 0x70 | (GIF_PALETTE_BITS - 1), 0, 0,
                )
                gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
                comment = b"\x21\xfe" + _gif_subblocks(
                    b"doc %d" % doc_id
                )
                idesc = b"\x2c" + struct.pack(
                    "<HHHHB", 0, 0, GIF_W, GIF_H, 0
                )
                lzw = gif_lzw_encode(indices, GIF_PALETTE_BITS)
                blob = (
                    b"GIF89a" + lsd + palette + gce + comment + idesc
                    + bytes([GIF_PALETTE_BITS]) + _gif_subblocks(lzw)
                    + b"\x3b"
                )
                blobs.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "content": blobs}
            )

    return d.mapInPandas(tuned(build), "media_id long, content binary")


def decode_gif(content: bytes):
    """REAL GIF decode with no library: validates the GIF87a/89a
    signature, parses the logical screen descriptor and global color
    table, skips extension blocks (each a label + sub-block chain),
    parses the image descriptor (non-interlaced, no local color table),
    reassembles the LZW stream from its sub-blocks, LZW-decodes the
    pixel indices, and maps them through the palette.  Returns
    (width, height, palette_bits, pixels[H,W,3] RGB).  Raises
    ValueError on malformed input (the dead-letter contract)."""
    import struct

    import numpy as np

    if len(content) < 13 or content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    if not flags & 0x80:
        raise ValueError("missing global color table")
    gct_size = 2 << (flags & 0x07)
    palette = content[pos : pos + 3 * gct_size]
    if len(palette) != 3 * gct_size:
        raise ValueError("truncated global color table")
    pos += 3 * gct_size
    while True:
        if pos >= len(content):
            raise ValueError("no image descriptor before EOF")
        intro = content[pos]
        pos += 1
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(content):
                    raise ValueError("truncated extension")
                n = content[pos]
                pos += 1 + n
                if n == 0:
                    break
        elif intro == 0x2C:
            break
        elif intro == 0x3B:
            raise ValueError("trailer before any image descriptor")
        else:
            raise ValueError(f"unknown block introducer {intro:#x}")
    ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", content[pos : pos + 9])
    pos += 9
    if iflags & 0x80:
        raise ValueError("local color tables unsupported")
    if iflags & 0x40:
        raise ValueError("interlaced images unsupported")
    if (ix, iy, iw, ih) != (0, 0, w, h):
        raise ValueError("sub-rectangle images unsupported")
    min_code_size = content[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(content):
            raise ValueError("truncated image data")
        n = content[pos]
        pos += 1
        if n == 0:
            break
        lzw += content[pos : pos + n]
        pos += n
    if pos >= len(content) or content[pos] != 0x3B:
        raise ValueError("missing trailer")
    indices = gif_lzw_decode(bytes(lzw), min_code_size)
    if len(indices) != w * h:
        raise ValueError(
            f"decoded {len(indices)} pixels for a {w}x{h} image"
        )
    idx = np.asarray(indices, dtype=np.int64)
    if idx.max() >= gct_size:
        raise ValueError("pixel index outside the color table")
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(gct_size, 3)
    return w, h, int(flags & 0x07) + 1, pal[idx].reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Real ENTROPY-CODED image decode: baseline sequential JPEG (ITU T.81)
# needs no external library either — the entropy layer is canonical
# Huffman over a bit stream (pure arithmetic), and the transform layer
# is an 8×8 IDCT (one numpy matrix product per block).  This retires
# the JPEG stub (r7 verdict item 6): a real multimodal corpus is
# mostly JPEG, and the engine now decodes it for real.  Video codecs
# remain the only stubbed frontier.
#
# Oracle strategy (the make_jpeg_media_df fixture): the encoder works
# in the QUANTIZED-COEFFICIENT domain — block coefficients are chosen
# by modular arithmetic over doc_id, then Huffman/DPCM-encoded.  The
# decoder's marker+Huffman+DPCM+dequant path recovers those integers
# EXACTLY (that layer of JPEG is lossless), so the
# multimodal_decode_jpeg query emits coefficient aggregates a DuckDB
# oracle replays from the same formulas — end-to-end bit evidence for
# everything except the float IDCT/color tail, which pytest pins
# against an independent direct-form IDCT (IEEE-1180-style ±1 bound)
# plus exact determinism checks.
# ---------------------------------------------------------------------------

# Zigzag scan order: _ZIGZAG[i] = (row, col) of the i-th coefficient.
_ZIGZAG: list[tuple[int, int]] = []


def _build_zigzag() -> None:
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag if s % 2 else diag[::-1])
    _ZIGZAG.extend(order)


_build_zigzag()

# Fixture quantization tables (constant — the dequant multiply is still
# real; per-frequency tables would only change the constants the oracle
# replays) and the fixture's AC coefficient positions in zigzag order:
# 1 (run 0), 4 (run 2), 9 (run 4), 17 (run 7), 33 (run 15 — the 0xF_
# max-run symbol), 62 (gap 28 → ZRL + run 12), then EOB: every AC
# symbol class a baseline decoder must handle appears in every block.
JPEG_QTABLES = (16, 17)
JPEG_AC_POSITIONS = (1, 4, 9, 17, 33, 62)


def _jpeg_dims(d: int) -> tuple[int, int]:
    """Fixture dims in BLOCKS from the reduced id d = pmod(doc_id, 256):
    1-2 blocks each axis, so the MCU loop, multi-block DPCM chains and
    dimension parsing are all exercised (and the oracle replays it)."""
    return 1 + d % 2, 1 + (d * 3 + 1) % 2  # (width_blocks, height_blocks)


def _jpeg_dc(d: int, comp: int, blk: int) -> int:
    return (d * 7 + comp * 13 + blk * 5) % 21 - 10


def _jpeg_ac(d: int, comp: int, blk: int, zz: int) -> int:
    return (d * 11 + comp * 3 + zz * 7 + blk) % 13 - 6


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81
        return bytes(self.out)


# Fixture Huffman tables, canonical and minimal: all 12 DC categories at
# 5 bits, all 162 AC (run,size) symbols at 8 bits.  Deliberately NOT the
# Annex K defaults — the decoder must honor whatever DHT declares, and a
# flat table keeps the encoder trivial while remaining a fully valid
# baseline stream (Kraft: 12 ≤ 2^5, 162 ≤ 2^8).
_DC_SYMBOLS = tuple(range(12))
_AC_SYMBOLS = tuple(
    sym
    for run in range(16)
    for sym in ((run << 4 | size) for size in range(1, 11))
) + (0x00, 0xF0)  # EOB and ZRL


def _canonical_codes(symbols, length: int) -> dict[int, tuple[int, int]]:
    return {s: (i, length) for i, s in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, 5)
_AC_CODES = _canonical_codes(sorted(_AC_SYMBOLS), 8)


def _dht_segment(tc: int, th: int, symbols, length: int) -> bytes:
    import struct

    bits = [0] * 16
    bits[length - 1] = len(symbols)
    payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _amplitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, appended bits)."""
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def encode_jpeg_fixture(doc_id: int) -> bytes:
    """Valid baseline-sequential JPEG (SOI, JFIF APP0, DQT×2, SOF0
    8-bit 4:4:4 three-component, DHT×2, SOS, entropy-coded MCUs, EOI)
    whose quantized coefficients come from the modular formulas above —
    the lossless layers round-trip them exactly, which is what the SQL
    oracle replays."""
    d = doc_id % 256
    return _encode_jpeg_frame(d, *_jpeg_dims(d))


def _encode_jpeg_frame(d: int, wb: int, hb: int) -> bytes:
    """One baseline JPEG with coefficient seed ``d`` at explicit block
    dims — the shared generator behind the still-image fixture (dims
    derived from d) and the MJPEG video fixture (dims fixed per video
    while d varies per frame, as real video frames share geometry)."""
    import struct

    w, h = 8 * wb, 8 * hb
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
        + b"\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    )
    for tid, q in enumerate(JPEG_QTABLES):
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes([q] * 64)
        )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, qid])  # 1x1 sampling: 4:4:4
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_SYMBOLS, 5)
    out += _dht_segment(1, 0, sorted(_AC_SYMBOLS), 8)
    sos = bytes([3]) + b"".join(
        bytes([cid, 0x00]) for cid in (1, 2, 3)
    ) + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for blk in range(wb * hb):  # MCU row-major == blk row-major at 4:4:4
        for comp in range(3):
            dc = _jpeg_dc(d, comp, blk)
            size, bits = _amplitude(dc - prev_dc[comp])
            prev_dc[comp] = dc
            code, length = _DC_CODES[size]
            bw.write(code, length)
            bw.write(bits, size)
            coef = {zz: _jpeg_ac(d, comp, blk, zz)
                    for zz in JPEG_AC_POSITIONS}
            run = 0
            last_nonzero = max(
                (zz for zz, v in coef.items() if v), default=0
            )
            for zz in range(1, 64):
                v = coef.get(zz, 0)
                if zz > last_nonzero:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _AC_CODES[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _amplitude(v)
                code, length = _AC_CODES[run << 4 | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last_nonzero < 63:
                code, length = _AC_CODES[0x00]  # EOB
                bw.write(code, length)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def make_jpeg_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID baseline JPEGs built per document id,
    executor-side per Arrow batch (blobs never touch the driver)."""
    # Dirty-data contract (tests/test_null_input.py): a NULL doc_id has
    # no derivable media — drop it; matching oracles filter identically.
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .transform(_spread)
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "content": [
                        encode_jpeg_fixture(int(i)) for i in pdf["doc_id"]
                    ],
                }
            )

    return d.mapInPandas(tuned(build), "media_id long, content binary")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; any other 0xFFxx marker mid-stream is malformed input
    (we emit no restart intervals) → ValueError (dead-letter).

    Un-stuffing happens ONCE in bulk at construction (``bytes.find`` /
    slice concatenation run in C) instead of per consumed byte, and
    ``decode`` resolves a whole Huffman symbol from one 16-bit
    lookahead against a flat table instead of per-bit dict probes —
    the r12 per-task rewrite (optimization guide §4.2) that took the
    fixture frame decode from 1.5 ms to 0.5 ms with bit-identical
    output and error classes (validated over all 256 fixture seeds and
    the truncation/marker corpus)."""

    __slots__ = ("data", "n", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int) -> None:
        # Bulk un-stuff from `pos`: 0xFF 0x00 → 0xFF; stop at the first
        # real marker (recorded — only an error if bits are still
        # NEEDED past it, matching the lazy per-byte reader this
        # replaces).  A trailing lone 0xFF is likewise only an error
        # when a read actually starves on it.
        parts = []
        i = pos
        marker = None
        find = data.find
        total = len(data)
        while True:
            j = find(b"\xff", i)
            if j < 0:
                parts.append(data[i:])
                break
            parts.append(data[i:j])
            if j + 1 >= total:
                break
            nxt = data[j + 1]
            if nxt == 0x00:
                parts.append(b"\xff")  # stuffed 0xFF data byte
                i = j + 2
            else:
                marker = nxt
                break
        self.data = b"".join(parts)
        self.n = len(self.data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.marker = marker

    def _starve(self):
        """A read needed bits past the un-stuffed region: the same two
        failure classes (and messages) as the per-byte reader."""
        if self.marker is not None:
            raise ValueError(
                f"unexpected marker 0xFF{self.marker:02X} in scan"
            )
        raise ValueError("truncated entropy stream")

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= self.n:
                self._starve()
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode(self, flat: list[int]) -> int:
        """Decode one Huffman symbol via a 16-bit flat-table lookahead
        (zero-padded past end of stream; the pad can only complete a
        code whose real bits ran out, which is exactly the per-bit
        reader's starvation point)."""
        while self.nbits < 16 and self.pos < self.n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        nbits = self.nbits
        if nbits >= 16:
            entry = flat[(self.acc >> (nbits - 16)) & 0xFFFF]
            if entry == 0:
                raise ValueError("invalid Huffman code in scan")
        else:
            entry = flat[(self.acc << (16 - nbits)) & 0xFFFF]
            if entry == 0 or (entry >> 8) > nbits:
                self._starve()
        length = entry >> 8
        self.nbits = nbits - length
        self.acc &= (1 << self.nbits) - 1
        return entry & 0xFF


#: (BITS, HUFFVAL) → flat 16-bit-prefix lookup, shared across frames and
#: tasks (reused Python workers keep it warm — guide §4.5); entries are
#: ``(code_length << 8) | symbol``, 0 = no code owns the prefix.
_HUFF_FLAT_CACHE: dict[tuple[bytes, bytes], list[int]] = {}


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT segment's BITS/HUFFVAL,
    compiled to a flat 2^16 prefix-lookup list (cached per table
    content: every frame of a video and every fixture JPEG with the
    same symbol set reuses one build)."""

    __slots__ = ("flat",)

    def __init__(self, bits: list[int], vals: bytes) -> None:
        key = (bytes(bits), bytes(vals))
        flat = _HUFF_FLAT_CACHE.get(key)
        if flat is None:
            flat = [0] * 65536
            code, k = 0, 0
            for length in range(1, 17):
                for _ in range(bits[length - 1]):
                    lo = code << (16 - length)
                    hi = lo + (1 << (16 - length))
                    flat[lo:hi] = [(length << 8) | vals[k]] * (hi - lo)
                    code += 1
                    k += 1
                code <<= 1
            _HUFF_FLAT_CACHE[key] = flat
        self.flat = flat

    def decode(self, br: _BitReader) -> int:
        return br.decode(self.flat)


_IDCT_BASIS = None
_ZZ_RC = None


def _zigzag_rc():
    """Zigzag order as (rows, cols) index arrays for the vectorized
    de-zigzag scatter."""
    global _ZZ_RC
    if _ZZ_RC is None:
        import numpy as np

        _ZZ_RC = (
            np.array([r for r, _ in _ZIGZAG]),
            np.array([c for _, c in _ZIGZAG]),
        )
    return _ZZ_RC


def _idct_basis():
    global _IDCT_BASIS
    if _IDCT_BASIS is None:
        import numpy as np

        u = np.arange(8)
        c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
        _IDCT_BASIS = (
            c[:, None]
            / 2.0
            * np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16.0)
        )
    return _IDCT_BASIS


def _decode_jpeg_impl(content: bytes):
    """Full baseline decode; returns (w, h, ncomp, pixels[H,W,3] uint8,
    coeffs) where coeffs[comp][blk][zz] is the QUANTIZED coefficient
    exactly as entropy-decoded (blk row-major) — the lossless layer the
    oracle verifies."""
    import struct

    import numpy as np

    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        seg = content[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                if len(seg) < off + 65:
                    raise ValueError("truncated DQT segment")
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(seg[off + 1 : off + 65])
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                if len(seg) < off + 17:
                    raise ValueError("truncated DHT segment")
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                # BITS counts must be backed by that many HUFFVAL
                # bytes, else the short slice surfaces later as an
                # IndexError inside _HuffTable instead of the
                # dead-letter ValueError contract.
                if len(seg) < off + 17 + n:
                    raise ValueError("DHT BITS exceed available HUFFVAL")
                vals = seg[off + 17 : off + 17 + n]
                htables[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ValueError("truncated SOF0 segment")
            prec, h, w, nf = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * nf:
                raise ValueError("truncated SOF0 component list")
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled JPEG unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0xFF{marker:02X}")
        elif marker == 0xDA:  # SOS
            if not seg:
                raise ValueError("truncated SOS segment")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated SOS component list")
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i]) for i in range(ns)]
            pos += 2 + seglen
            break
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        # APPn / COM / others: skip
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    w, h, comps = frame
    if len(scan) != len(comps):
        raise ValueError("scan/frame component mismatch")
    wb, hb = (w + 7) // 8, (h + 7) // 8
    br = _BitReader(content, pos)
    ncomp = len(comps)
    # Resolve each component's tables ONCE (not per block).
    ctabs = []
    for ci in range(ncomp):
        td, ta = scan[ci][1] >> 4, scan[ci][1] & 0xF
        dct = htables.get((0, td))
        act = htables.get((1, ta))
        if dct is None or act is None:
            raise ValueError("scan references undefined Huffman table")
        ctabs.append((dct.flat, act.flat))
    coeffs = [[] for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    rd = br.read
    dec = br.decode
    for _blk in range(wb * hb):
        for ci in range(ncomp):
            dflat, aflat = ctabs[ci]
            block = [0] * 64
            # DC: Huffman size class, then T.81 EXTEND (inlined).
            size = dec(dflat)
            if size:
                bits = rd(size)
                d = (
                    bits
                    if bits >= (1 << (size - 1))
                    else bits - (1 << size) + 1
                )
            else:
                d = 0
            block[0] = prev_dc[ci] + d
            prev_dc[ci] = block[0]
            zz = 1
            while zz < 64:
                sym = dec(aflat)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    zz += 16  # ZRL
                    continue
                zz += run
                if zz > 63:
                    raise ValueError("AC run overflows block")
                bits = rd(size)
                block[zz] = (
                    bits
                    if bits >= (1 << (size - 1))
                    else bits - (1 << size) + 1
                )
                zz += 1
            coeffs[ci].append(block)
    # Transform tail: dequantize -> de-zigzag -> IDCT -> level shift,
    # vectorized ACROSS BLOCKS (one fancy-index scatter + one batched
    # (basis.T @ F) @ basis per component — the same left-associated
    # float64 op order as the per-block form, verified bit-identical
    # over all 256 fixture seeds).
    basis = _idct_basis()
    zz_r, zz_c = _zigzag_rc()
    nblk = wb * hb
    planes = np.empty((ncomp, hb * 8, wb * 8), dtype=np.float64)
    for ci, (_cid, tq) in enumerate(comps):
        q = np.array(qtables[tq], dtype=np.float64)
        dq = np.array(coeffs[ci], dtype=np.float64) * q
        fmat = np.zeros((nblk, 8, 8), dtype=np.float64)
        fmat[:, zz_r, zz_c] = dq
        px = (basis.T @ fmat) @ basis + 128.0
        planes[ci] = (
            px.reshape(hb, wb, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(hb * 8, wb * 8)
        )
    planes = planes[:, :h, :w]
    if ncomp == 3:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    elif ncomp == 1:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=-1)
    else:
        raise ValueError(f"unsupported component count {ncomp}")
    pixels = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, ncomp, pixels, coeffs


def decode_jpeg(content: bytes):
    """REAL baseline-sequential JPEG decode (stdlib + numpy): marker
    walk, DQT/SOF0/DHT/SOS, canonical Huffman entropy decode with
    un-stuffing, DPCM DC chains, dequantize, de-zigzag, IDCT, YCbCr→
    RGB.  Returns (width, height, n_components, pixels[H,W,3] RGB).
    Raises ValueError on malformed/progressive/subsampled input (the
    dead-letter contract)."""
    w, h, ncomp, pixels, _ = _decode_jpeg_impl(content)
    return w, h, ncomp, pixels


# ---------------------------------------------------------------------------
# Video: MJPEG inside a RIFF-AVI container (r8 verdict item 4 — the last
# stub-gated modality).  Motion-JPEG is the one video codec whose frames
# are plain baseline JPEGs, so the r8 entropy decoder IS the frame
# decoder; the container layer below is a spec-faithful RIFF walk
# (chunks, LIST recursion, avih/strh/strf headers, movi payload, idx1),
# written from the public AVI RIFF specification.  No compression
# *between* frames — each '00dc' chunk is independent, which is exactly
# what makes MJPEG the archival/intermediate format real pipelines
# frame-sample from.

VIDEO_FPS_RATE = 10  # fixture: 10 fps (dwScale=1, dwRate=10)
VIDEO_USEC_PER_FRAME = 1_000_000 // VIDEO_FPS_RATE
VIDEO_FRAME_SEED_STEP = 37  # frame f's JPEG seed: (d0 + 37*(f+1)) % 256


def _video_n_frames(d0: int) -> int:
    """Fixture frame count from the reduced id: 2-4 frames, so the
    multi-frame walk, per-frame DPCM restarts and the idx1 table are
    all exercised (and the oracle replays it)."""
    return 2 + d0 % 3


def encode_avi_mjpeg_fixture(doc_id: int) -> bytes:
    """Valid RIFF-AVI MJPEG container: 'avih' main header, one 'vids'
    stream ('strh' handler MJPG + 'strf' BITMAPINFOHEADER), a 'movi'
    list of '00dc' chunks each holding one complete baseline JPEG from
    ``_encode_jpeg_frame``, and a full 'idx1' keyframe index.  All
    frames share the video's geometry (blocks from ``_jpeg_dims(d0)``)
    while the coefficient seed varies per frame."""
    import struct

    d0 = doc_id % 256
    wb, hb = _jpeg_dims(d0)
    w, h = 8 * wb, 8 * hb
    n_frames = _video_n_frames(d0)
    frames = [
        _encode_jpeg_frame((d0 + VIDEO_FRAME_SEED_STEP * (f + 1)) % 256,
                           wb, hb)
        for f in range(n_frames)
    ]
    max_bytes = max(len(fr) for fr in frames)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack(
        "<14I",
        VIDEO_USEC_PER_FRAME,       # dwMicroSecPerFrame
        max_bytes * VIDEO_FPS_RATE, # dwMaxBytesPerSec
        0,                          # dwPaddingGranularity
        0x10,                       # dwFlags: AVIF_HASINDEX
        n_frames,                   # dwTotalFrames
        0,                          # dwInitialFrames
        1,                          # dwStreams
        max_bytes,                  # dwSuggestedBufferSize
        w, h,                       # dwWidth, dwHeight
        0, 0, 0, 0,                 # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            1,                 # dwScale
            VIDEO_FPS_RATE,    # dwRate
            0,                 # dwStart
            n_frames,          # dwLength (in frames)
            max_bytes,         # dwSuggestedBufferSize
            0,                 # dwQuality
            0,                 # dwSampleSize
            0, 0, w, h,        # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",
        sum(len(fr) for fr in frames) // n_frames,
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx_entries = []
    for fr in frames:
        # idx1 offsets are relative to the first byte after the 'movi'
        # list-type fourcc, pointing at the chunk's own fourcc.
        idx_entries.append((len(movi_payload) + 4, len(fr)))
        movi_payload += chunk(b"00dc", fr)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)
            for off, size in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(content: bytes):
    """REAL RIFF-AVI MJPEG container parse (stdlib only): RIFF/AVI
    magic, chunk walk with LIST recursion, 'avih' main header, 'vids'
    stream header validated as MJPG, and the 'movi' frame chunks
    extracted in stream order.  Returns ``(width, height,
    usec_per_frame, frames)`` with ``frames`` the list of raw JPEG
    payloads (decode each with ``decode_jpeg``).  Raises ValueError on
    malformed/truncated containers and non-MJPEG streams (dead-letter
    contract, same as the image codecs)."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF":
        raise ValueError("not a RIFF file (bad magic)")
    (riff_size,) = struct.unpack("<I", content[4:8])
    if riff_size + 8 > len(content):
        raise ValueError("truncated RIFF payload")
    if content[8:12] != b"AVI ":
        raise ValueError(f"not an AVI container ({content[8:12]!r})")

    def walk(buf: bytes):
        """Yield (fourcc, payload) for each top-level chunk in buf."""
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            payload = buf[pos + 8 : pos + 8 + size]
            if len(payload) != size:
                raise ValueError(f"truncated {fourcc!r} chunk")
            yield fourcc, payload
            pos += 8 + size + (size % 2)
        if pos != len(buf):
            raise ValueError("trailing bytes after last chunk")

    avih = None
    stream_ok = False
    frames: list[bytes] = []
    for fourcc, payload in walk(content[12 : 8 + riff_size]):
        if fourcc != b"LIST":
            continue  # idx1 / JUNK: optional, frames come from movi
        list_type, body = payload[:4], payload[4:]
        if list_type == b"hdrl":
            for c4, p in walk(body):
                if c4 == b"avih":
                    if len(p) < 40:
                        raise ValueError("truncated avih header")
                    avih = struct.unpack("<10I", p[:40])
                elif c4 == b"LIST" and p[:4] == b"strl":
                    for s4, sp in walk(p[4:]):
                        if s4 != b"strh":
                            continue
                        if len(sp) < 8:
                            raise ValueError("truncated strh header")
                        if sp[:4] != b"vids":
                            continue
                        if sp[4:8] != b"MJPG":
                            raise ValueError(
                                "unsupported video codec "
                                f"{sp[4:8]!r} (MJPG only)"
                            )
                        stream_ok = True
        elif list_type == b"movi":
            for c4, p in walk(body):
                # '##dc' compressed / '##db' uncompressed video chunk
                if c4[2:4] in (b"dc", b"db"):
                    if p[:2] != b"\xff\xd8":
                        raise ValueError(
                            "movi video chunk is not a JPEG (no SOI)"
                        )
                    frames.append(p)
    if avih is None:
        raise ValueError("missing avih main header")
    if not stream_ok:
        raise ValueError("no MJPG 'vids' stream declared")
    if not frames:
        raise ValueError("empty movi list (no video frames)")
    usec, _, _, _, total, _, _, _, w, h = avih
    if total != len(frames):
        raise ValueError(
            f"avih declares {total} frames, movi holds {len(frames)}"
        )
    return int(w), int(h), int(usec), frames


def make_avi_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture of VALID MJPEG-AVI videos built per document id,
    executor-side per Arrow batch (blobs never touch the driver)."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .transform(_spread)
    )

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "content": [
                        encode_avi_mjpeg_fixture(int(i))
                        for i in pdf["doc_id"]
                    ],
                }
            )

    return d.mapInPandas(tuned(build), "media_id long, content binary")
