"""Multimodal column plumbing (SURVEY §2.6).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, exactly as a 100 TB multimodal corpus stores them (the
bytes live inline in parquet or as object-store references).  The
Spark-side plumbing — schema, partition-sized Arrow batches through
``mapInPandas``, UDF signatures — is real and tested; the *decoder*
itself (PIL/ffmpeg are not in this container) is stubbed behind
``decode_stub`` with a clearly-marked deterministic fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("sha", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def to_multimodal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap the documents table as a multimodal corpus: payload =
    utf-8 bytes (stand-in for image bytes), typed metadata columns.
    All JVM-side expressions."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("byte_len"),
        F.sha2(payload, 256).alias("sha"),
    )


def decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake decoder.

    A real deployment decodes image/audio here (PIL / torchaudio /
    ffmpeg — not available in this container).  The fake derives
    (width, height, n_frames) from the payload hash so the pipeline
    shape, schema, and partitioning are exercised end-to-end.
    Raise-path kept for parity with a failed decode:
    ``NotImplementedError`` if payload is empty.
    """
    if not payload:
        raise NotImplementedError("real decoder not available in this container")
    h = hashlib.sha256(payload).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 16)


def _real_image_decoder():
    """Resolve the OPTIONAL real decoder: a callable
    ``payload -> (width, height, n_frames)`` backed by PIL when the
    library is importable, else ``None``.  Called on the EXECUTOR
    (inside the mapInPandas generator), so a cluster whose workers
    ship Pillow gets real pixel decode with zero code change — the
    Spark plumbing (schema, batching, UDF signature) is identical
    either way."""
    try:
        from PIL import Image  # optional dependency, absent here
    except Exception:
        return None
    import io

    def decode(payload: bytes) -> tuple[int, int, int]:
        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, int(getattr(im, "n_frames", 1))

    return decode


def _stdlib_png_decoder():
    """Second optional real backend (r8 verdict task 4): the
    pure-stdlib PNG codec — FULL pixel reconstruction (zlib inflate +
    filter reversal), not header sniffing — for PNG payloads, falling
    through to ``decode_stub`` for every other format.  This is the
    branch that lets the real-decode path run green in a container
    with no codec library."""
    from terminus_server_spark.operators.png_codec import is_png, png_decode

    def decode(payload: bytes) -> tuple[int, int, int]:
        if payload and is_png(payload):
            w, h, _ch, _rows = png_decode(payload)
            return w, h, 1
        return decode_stub(payload)

    return decode


def _stdlib_png_resizer():
    """Stdlib resize backend: nearest-neighbor resample + PNG
    re-encode for PNG payloads, ``resize_stub`` otherwise."""
    from terminus_server_spark.operators.png_codec import (
        is_png,
        png_resize_nearest,
    )

    def resize(payload: bytes, target: int) -> tuple[bytes, int, int]:
        if payload and is_png(payload):
            return png_resize_nearest(payload, target), target, target
        return resize_stub(payload, target)

    return resize


def _real_image_resizer():
    """Optional real resizer (PIL), mirroring ``_real_image_decoder``:
    ``(payload, target) -> (bytes, w, h)`` or ``None``."""
    try:
        from PIL import Image  # optional dependency, absent here
    except Exception:
        return None
    import io

    def resize(payload: bytes, target: int) -> tuple[bytes, int, int]:
        with Image.open(io.BytesIO(payload)) as im:
            fmt = im.format or "PNG"
            out = im.resize((target, target))
            buf = io.BytesIO()
            out.save(buf, format=fmt)
            return buf.getvalue(), target, target

    return resize


def extract_features(mm: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction via ``mapInPandas`` — the
    production shape for Python-side decoders: one Python worker per
    partition, whole Arrow batches in/out, no per-row pickling.

    ``decoder``: explicit ``payload -> (w, h, n_frames)`` callable;
    ``None`` auto-resolves PER WORKER: the real PIL decoder when
    importable, else the stdlib PNG codec for PNG payloads (full
    pixel reconstruction, stub for other formats — see
    ``_stdlib_png_decoder``).  Fixtures pin ``decode_stub``
    explicitly so oracles stay environment-free."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decoder if decoder is not None else (
            _real_image_decoder() or _stdlib_png_decoder()
        )
        for pdf in batches:
            feats = [dec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": pdf["byte_len"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return mm.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def resize_stub(payload: bytes, target: int) -> tuple[bytes, int, int]:
    """STUB — deterministic fake resizer (PIL not in container).
    Fake output bytes are a hash-derived prefix so payload size really
    shrinks through the pipeline; real deployments swap in
    ``PIL.Image.resize`` without touching the Spark plumbing."""
    if not payload:
        raise NotImplementedError("real resizer not available in this container")
    digest = hashlib.sha256(payload + target.to_bytes(4, "big")).digest()
    return digest * (target * target // len(digest) + 1), target, target


def resize_images(mm: DataFrame, target: int = 64, resizer=None) -> DataFrame:
    """Arrow-batched resize via ``mapInPandas``: same shape a real
    image pipeline uses (decode → resize → re-encode per batch).
    ``resizer`` resolves like ``extract_features``'s decoder: explicit
    callable > worker-side PIL when importable > stdlib PNG codec for
    PNG payloads (``resize_stub`` for other formats)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rz = resizer if resizer is not None else (
            _real_image_resizer() or _stdlib_png_resizer()
        )
        for pdf in batches:
            out = [rz(p, target) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "payload": [o[0] for o in out],
                    "width": [o[1] for o in out],
                    "height": [o[2] for o in out],
                }
            )

    return mm.mapInPandas(run, RESIZE_SCHEMA)


def _hx(p, pos: int, n: int):
    return F.hex(F.substring(p, pos, n))


def _be(p, pos: int, n: int):
    """Big-endian unsigned int from n payload bytes at 1-based pos."""
    return F.conv(_hx(p, pos, n), 16, 10).cast("bigint")


def _le(p, pos: int, n: int):
    """Little-endian unsigned int: reverse the hex byte pairs, then
    parse as base-16 — still a pure JVM expression."""
    h = _hx(p, pos, n)
    pairs = [F.substring(h, i * 2 + 1, 2) for i in range(n)][::-1]
    return F.conv(F.concat(*pairs), 16, 10).cast("bigint")


def sniff_headers(mm: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format sniffing + header-field extraction over
    opaque binary payloads with BUILT-IN byte expressions only
    (``substring`` on binary, ``hex``, ``conv``) — no codec library,
    no Python worker: the real 100 TB path for "what is this blob"
    classification, which must run on every object before any decode
    is scheduled.  Magic numbers are the public container specs:

    - PNG  ``89 50 4E 47 0D 0A 1A 0A``; width/height are the IHDR
      chunk's first two big-endian u32s (bytes 17-24).
    - GIF  ``GIF87a`` or ``GIF89a`` (same header layout, so both
      variants share the dim extraction); width/height are
      little-endian u16s at 7-10.
    - WAV  ``RIFF`` .... ``WAVE``; sample rate is the fmt chunk's
      little-endian u32 at bytes 25-28.
    - JPEG ``FF D8 FF``; dimensions live in a variable-offset SOF
      marker, so mime is detected but dims stay NULL (a real scan
      walks the marker chain — decoder territory, not sniffing).

    Unknown payloads keep ``application/octet-stream`` with NULL
    fields.  Output: (doc_id, mime, width, height, sample_rate)."""
    p = F.col(payload_col)
    is_png = _hx(p, 1, 8) == "89504E470D0A1A0A"
    is_gif = (_hx(p, 1, 4) == "47494638") & _hx(p, 5, 2).isin("3761", "3961")
    is_wav = (_hx(p, 1, 4) == "52494646") & (_hx(p, 9, 4) == "57415645")
    is_jpg = _hx(p, 1, 3) == "FFD8FF"
    null_i = F.lit(None).cast("bigint")
    return mm.select(
        "doc_id",
        F.when(is_png, F.lit("image/png"))
        .when(is_gif, F.lit("image/gif"))
        .when(is_wav, F.lit("audio/wav"))
        .when(is_jpg, F.lit("image/jpeg"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.when(is_png, _be(p, 17, 4)).when(is_gif, _le(p, 7, 2)).otherwise(null_i).alias("width"),
        F.when(is_png, _be(p, 21, 4)).when(is_gif, _le(p, 9, 2)).otherwise(null_i).alias("height"),
        F.when(is_wav, _le(p, 25, 4)).otherwise(null_i).alias("sample_rate"),
    )


def sniff_headers2(mm: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format sniffing tranche 2 — PDF / MP3 (ID3v2) / MP4
    — same built-in byte-expression discipline as
    :func:`sniff_headers` (``substring`` on binary, ``hex``, ``conv``,
    ``decode``): no codec library, no Python worker.  Public container
    specs:

    - PDF  ``%PDF-`` magic; version is the ASCII ``d.d`` right after
      (``%PDF-1.7``).
    - MP3  ``ID3`` tag header; the total tag size is the four
      SYNC-SAFE bytes at 7-10 — 7 payload bits per byte, high bit
      zero by spec, so size = b₇·2²¹ + b₈·2¹⁴ + b₉·2⁷ + b₁₀.
    - MP4  ISO-BMFF: bytes 5-8 are the ``ftyp`` box tag; the major
      brand is the ASCII 4-cc at 9-12 (isom / mp42 / avc1 ...).

    Unknown payloads keep ``application/octet-stream`` with NULL
    fields.  Output: (doc_id, mime, pdf_version, id3_size,
    mp4_brand)."""
    p = F.col(payload_col)
    is_pdf = _hx(p, 1, 5) == "255044462D"
    is_mp3 = _hx(p, 1, 3) == "494433"
    is_mp4 = _hx(p, 5, 4) == "66747970"
    null_i = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    id3_size = (
        _be(p, 7, 1) * F.lit(2097152)
        + _be(p, 8, 1) * F.lit(16384)
        + _be(p, 9, 1) * F.lit(128)
        + _be(p, 10, 1)
    )
    return mm.select(
        "doc_id",
        F.when(is_pdf, F.lit("application/pdf"))
        .when(is_mp3, F.lit("audio/mpeg"))
        .when(is_mp4, F.lit("video/mp4"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.when(is_pdf, F.decode(F.substring(p, 6, 3), "UTF-8"))
        .otherwise(null_s)
        .alias("pdf_version"),
        F.when(is_mp3, id3_size).otherwise(null_i).alias("id3_size"),
        F.when(is_mp4, F.decode(F.substring(p, 9, 4), "UTF-8"))
        .otherwise(null_s)
        .alias("mp4_brand"),
    )


def sniff_headers3(mm: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format sniffing tranche 3 — TIFF / BMP / FLAC — same
    built-in byte-expression discipline as :func:`sniff_headers`:

    - TIFF  ``II 2A 00`` (little-endian) or ``MM 00 2A``
      (big-endian); the byte order itself is the classification
      payoff (dimensions live in IFD tags — decoder territory).
    - BMP   ``BM``; width/height are the BITMAPINFOHEADER's
      little-endian i32s at bytes 19-22 / 23-26 — height is SIGNED
      by spec (negative = top-down row order), so both fields decode
      two's-complement and a top-down BMP reports its true magnitude
      as a negative height instead of a ~4.29e9 garbage value.
    - FLAC  ``fLaC``; STREAMINFO's sample rate is the 20-bit field
      spanning bytes 19-21 (16 high bits, then the top nibble).

    Output: (doc_id, mime, byte_order, width, height, sample_rate)."""
    p = F.col(payload_col)
    is_tif_le = _hx(p, 1, 4) == "49492A00"
    is_tif_be = _hx(p, 1, 4) == "4D4D002A"
    is_bmp = _hx(p, 1, 2) == "424D"
    is_flac = _hx(p, 1, 4) == "664C6143"
    null_i = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    flac_rate = _be(p, 19, 2) * F.lit(16) + F.floor(
        _be(p, 21, 1) / F.lit(16)
    ).cast("bigint")
    return mm.select(
        "doc_id",
        F.when(is_tif_le | is_tif_be, F.lit("image/tiff"))
        .when(is_bmp, F.lit("image/bmp"))
        .when(is_flac, F.lit("audio/flac"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.when(is_tif_le, F.lit("little"))
        .when(is_tif_be, F.lit("big"))
        .otherwise(null_s)
        .alias("byte_order"),
        F.when(is_bmp, _le_i32(p, 19)).otherwise(null_i).alias("width"),
        F.when(is_bmp, _le_i32(p, 23)).otherwise(null_i).alias("height"),
        F.when(is_flac, flac_rate).otherwise(null_i).alias("sample_rate"),
    )


def _le_i32(p, pos: int):
    """Signed little-endian i32: two's-complement fold of the
    unsigned parse."""
    u = _le(p, pos, 4)
    return F.when(u >= F.lit(2_147_483_648), u - F.lit(4_294_967_296)).otherwise(u)


def sample_frames(mm: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emit one row per k-th frame
    — a row-count-*increasing* ``mapInPandas`` (the batch shape real
    frame extraction needs; ffmpeg slots into the stub).  Frame count
    comes from the (stubbed) decode; frame identity is a
    deterministic hash of (payload, frame index)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, n_frames = decode_stub(payload)
                for i in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return mm.mapInPandas(run, FRAME_SCHEMA)


def sniff_headers4(mm: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format sniffing tranche 4 — WEBP / OGG / ZIP / GZIP —
    same built-in byte-expression discipline as :func:`sniff_headers`
    (no codec, no Python worker).  Public container specs:

    - WEBP  RIFF container (``RIFF....WEBP``); the VP8X extended
      header carries canvas width−1 / height−1 as 24-bit
      little-endian fields at bytes 25-27 / 28-30.
    - OGG   ``OggS`` capture pattern; the bitstream serial number is
      the little-endian u32 at bytes 15-18.
    - ZIP   ``PK\\x03\\x04`` local-file header; version-needed is the
      little-endian u16 at bytes 5-6 (20 = deflate era, 45 = Zip64).
    - GZIP  ``1F 8B`` magic + method 08; MTIME is the little-endian
      u32 at bytes 5-8.

    Output: (doc_id, mime, width, height, serial, version_needed,
    mtime)."""
    p = F.col(payload_col)
    is_webp = (_hx(p, 1, 4) == "52494646") & (_hx(p, 9, 4) == "57454250")
    is_webp_x = is_webp & (_hx(p, 13, 4) == "56503858")
    is_ogg = _hx(p, 1, 4) == "4F676753"
    is_zip = _hx(p, 1, 4) == "504B0304"
    is_gzip = _hx(p, 1, 3) == "1F8B08"
    null_i = F.lit(None).cast("bigint")
    return mm.select(
        "doc_id",
        F.when(is_webp, F.lit("image/webp"))
        .when(is_ogg, F.lit("audio/ogg"))
        .when(is_zip, F.lit("application/zip"))
        .when(is_gzip, F.lit("application/gzip"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.when(is_webp_x, _le(p, 25, 3) + 1).otherwise(null_i).alias("width"),
        F.when(is_webp_x, _le(p, 28, 3) + 1).otherwise(null_i).alias("height"),
        F.when(is_ogg, _le(p, 15, 4)).otherwise(null_i).alias("serial"),
        F.when(is_zip, _le(p, 5, 2)).otherwise(null_i).alias("version_needed"),
        F.when(is_gzip, _le(p, 5, 4)).otherwise(null_i).alias("mtime"),
    )


def sniff_headers5(mm: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format sniffing tranche 5 — TIFF (both byte orders) /
    FLAC / ICO / MIDI — same built-in byte-expression discipline as
    :func:`sniff_headers` (no codec, no Python worker).  Public specs:

    - TIFF  ``II*\\0`` (little-endian) or ``MM\\0*`` (big-endian);
      the first-IFD offset is the u32 at bytes 5-8 in the header's
      own byte order — the one format whose ENDIANNESS is data.
    - FLAC  ``fLaC`` then the STREAMINFO metadata block: the sample
      rate is the top 20 bits of the big-endian u24 at bytes 19-21
      (after 2+2 blocksize and 3+3 framesize bytes of the block body).
    - ICO   reserved 0, type 1; image count is the LE u16 at 5-6.
    - MIDI  ``MThd`` + u32 length 6; track count and time division
      are the big-endian u16s at bytes 11-12 / 13-14.

    Output: (doc_id, mime, byte_order, ifd_offset, sample_rate,
    n_images, n_tracks, division)."""
    p = F.col(payload_col)
    is_tiff_le = _hx(p, 1, 4) == "49492A00"
    is_tiff_be = _hx(p, 1, 4) == "4D4D002A"
    is_flac = _hx(p, 1, 4) == "664C6143"
    is_ico = _hx(p, 1, 4) == "00000100"
    is_midi = (_hx(p, 1, 4) == "4D546864") & (_be(p, 5, 4) == 6)
    null_i = F.lit(None).cast("bigint")
    return mm.select(
        "doc_id",
        F.when(is_tiff_le | is_tiff_be, F.lit("image/tiff"))
        .when(is_flac, F.lit("audio/flac"))
        .when(is_ico, F.lit("image/x-icon"))
        .when(is_midi, F.lit("audio/midi"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.when(is_tiff_le, F.lit("II"))
        .when(is_tiff_be, F.lit("MM"))
        .otherwise(F.lit(None).cast("string"))
        .alias("byte_order"),
        F.when(is_tiff_le, _le(p, 5, 4))
        .when(is_tiff_be, _be(p, 5, 4))
        .otherwise(null_i)
        .alias("ifd_offset"),
        F.when(is_flac, F.shiftright(_be(p, 19, 3), 4)).otherwise(null_i).alias(
            "sample_rate"
        ),
        F.when(is_ico, _le(p, 5, 2)).otherwise(null_i).alias("n_images"),
        F.when(is_midi, _be(p, 11, 2)).otherwise(null_i).alias("n_tracks"),
        F.when(is_midi, _be(p, 13, 2)).otherwise(null_i).alias("division"),
    )


def sniff_headers6(mm: DataFrame, payload_col: str = "payload", max_entries: int = 8) -> DataFrame:
    """Container-format sniffing tranche 6 — JPEG/Exif ORIENTATION
    (the rotate-before-train normalization every image pipeline runs
    before decode is scheduled), same built-in byte-expression
    discipline as the earlier tranches: no codec, no Python.  Public
    spec (Exif 2.x over TIFF 6.0):

    - SOI ``FF D8`` + APP1 ``FF E1`` + u16 length + ``Exif\\0\\0``;
    - the embedded TIFF starts at byte 13 (1-based): ``II*\\0`` or
      ``MM\\0*`` picks the byte order for EVERY later field, then a
      u32 IFD0 offset (relative to the TIFF start);
    - IFD0: u16 entry count, then 12-byte entries
      (tag, type, count, value); orientation is tag 0x0112, a SHORT
      whose value sits in the value field's first two bytes — in the
      header's byte order.

    The entry scan unrolls ``max_entries`` F.when branches (IFD0
    entry counts are single digits in practice; deeper tags are
    decoder territory).  Output: (doc_id, mime, byte_order,
    n_entries, orientation) — non-Exif payloads keep
    application/octet-stream and NULLs."""
    p = F.col(payload_col)
    t0 = 13  # 1-based offset of the embedded TIFF header
    # stage 1: order flag + IFD location as PROJECTED columns — the
    # unrolled entry scan below references them by name, so codegen
    # computes each once instead of re-deriving the whole
    # conv(hex(substring)) chain inside every branch (the naive
    # inlined form measured ~7x slower: expression-tree blowup)
    base = mm.select(
        "*",
        (
            (_hx(p, 1, 3) == "FFD8FF")
            & (_hx(p, 3, 2) == "FFE1")
            & (_hx(p, 7, 6) == "457869660000")
        ).alias("__jfx"),
        (_hx(p, t0, 4) == "49492A00").alias("__le"),
        (_hx(p, t0, 4) == "4D4D002A").alias("__be"),
    )
    le = F.col("__le")

    def u16(pos):
        return F.when(le, _le(p, pos, 2)).otherwise(_be(p, pos, 2))

    def u32(pos):
        return F.when(le, _le(p, pos, 4)).otherwise(_be(p, pos, 4))

    base = base.select(
        "*",
        (F.col("__jfx") & (le | F.col("__be"))).alias("__ok"),
        (t0 + u32(t0 + 4)).cast("int").alias("__ifd"),
    )
    ifd = F.col("__ifd")
    base = base.select("*", u16(ifd).alias("__n"))
    n_entries = F.col("__n")
    orientation = F.lit(None).cast("bigint")
    for i in range(max_entries):
        entry = ifd + 2 + 12 * i
        hit = (F.lit(i) < n_entries) & (u16(entry) == 0x0112)
        orientation = F.when(
            orientation.isNotNull(), orientation
        ).otherwise(F.when(hit, u16(entry + 8)))
    null_i = F.lit(None).cast("bigint")
    ok = F.col("__ok")
    return base.select(
        "doc_id",
        F.when(ok, F.lit("image/jpeg"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.when(ok & le, F.lit("II"))
        .when(ok & F.col("__be"), F.lit("MM"))
        .otherwise(F.lit(None).cast("string"))
        .alias("byte_order"),
        F.when(ok, n_entries).otherwise(null_i).alias("n_entries"),
        F.when(ok, orientation).otherwise(null_i).alias("orientation"),
    )


def wav_pcm_energy(
    mm: DataFrame,
    payload_col: str = "payload",
    window_samples: int = 16,
) -> DataFrame:
    """(…, sample_rate, n_channels, n_samples, window_id, energy_ssq):
    decode canonical 16-bit PCM WAV payloads (44-byte RIFF header,
    mono, the format every TTS/ASR corpus normalizes to) and compute
    per-window signal ENERGY — the sum of squared samples over fixed
    windows of ``window_samples`` — the primitive behind silence
    trimming, voice-activity gating, and clip detection in an audio
    training pipeline.  NO codec, NO Python: byte access is one
    hex() of the payload + substring/conv expressions (the
    sniff_headers discipline extended from header fields to the DATA
    chunk), samples are two's-complement LE16 recovered with integer
    arithmetic, and the window sum-of-squares is an integer
    aggregate over a per-window sequence — whole-stage codegen end
    to end, windows exploded to rows only after the fold.

    Integer energies are exact (|sample| ≤ 2^15 ⇒ a window of 2^16
    samples still fits bigint), so the output is engine-portable
    with no float in sight.  Non-PCM / non-mono payloads pass
    through with NULL windows rather than mis-decoding: the caller
    routes them to the real decoder seam (extract_features)."""
    p = F.col(payload_col)
    hx = F.hex(p)

    def byte_at(i):
        # i: 1-based byte position, as a COLUMN
        return F.conv(F.substring(hx, (i - 1) * 2 + 1, 2), 16, 10).cast(
            "bigint"
        )

    is_wav = (_hx(p, 1, 4) == F.lit("52494646")) & (
        _hx(p, 9, 4) == F.lit("57415645")
    )
    audio_fmt = _le(p, 21, 2)
    n_channels = _le(p, 23, 2)
    sample_rate = _le(p, 25, 4)
    bits = _le(p, 35, 2)
    data_size = _le(p, 41, 4)
    decodable = (
        is_wav
        & (audio_fmt == 1)
        & (n_channels == 1)
        & (bits == 16)
        & (_hx(p, 37, 4) == F.lit("64617461"))
    )
    n_samples = (data_size / 2).cast("bigint")
    w = F.lit(window_samples).cast("bigint")
    n_windows = F.ceil(n_samples / w).cast("int")

    def sample(i):
        # i: 0-based sample index column; data starts at byte 45
        lo = byte_at(F.lit(45) + 2 * i)
        hi = byte_at(F.lit(46) + 2 * i)
        v = lo + 256 * hi
        return v - F.when(v >= 32768, F.lit(65536)).otherwise(F.lit(0))

    def window_ssq(wi):
        first = wi.cast("bigint") * w
        count = F.least(w, n_samples - first)
        return F.aggregate(
            F.sequence(F.lit(0).cast("bigint"), count - 1),
            F.lit(0).cast("bigint"),
            lambda acc, j: acc + F.pow(sample(first + j), 2).cast("bigint"),
        )

    windows = F.when(
        decodable,
        F.transform(
            F.sequence(F.lit(0), n_windows - 1),
            lambda wi: F.struct(
                wi.cast("int").alias("window_id"),
                window_ssq(wi).alias("energy_ssq"),
            ),
        ),
    )
    out = mm.select(
        *[c for c in mm.columns if c != payload_col],
        F.when(decodable, sample_rate).alias("sample_rate"),
        F.when(decodable, n_channels).alias("n_channels"),
        F.when(decodable, n_samples).alias("n_samples"),
        windows.alias("_w"),
    )
    return out.select(
        *[c for c in out.columns if c != "_w"],
        F.explode_outer("_w").alias("_win"),
    ).select(
        *[c for c in out.columns if c != "_w"],
        F.col("_win.window_id").alias("window_id"),
        F.col("_win.energy_ssq").alias("energy_ssq"),
    )
