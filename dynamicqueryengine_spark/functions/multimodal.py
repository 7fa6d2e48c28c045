"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7 Phase 4).

Media payloads are opaque ``binary`` columns plus a typed metadata struct —
the Spark-native shape for a 100 TB multimodal corpus (payload bytes stay in
Parquet/columnar storage; metadata prunes without touching payloads).

The Spark-side mechanics here are REAL and tested: schemas, Arrow-batched
``mapInPandas`` feature extraction, partition-preserving pipelines. The
actual media decoding is STUBBED behind ``NotImplementedError`` /
deterministic fakes because no image/audio libraries exist in this
container — swap ``_decode_stub`` for a real decoder (PIL/torchaudio/ffmpeg)
without touching any of the distributed plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

from ..util import spread_pinned as spread
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_METADATA_SCHEMA = StructType(
    [
        StructField("format", StringType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("source", StringType(), True),
    ]
)

BLOB_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("payload_md5", StringType(), False),
        StructField("head_byte", IntegerType(), True),
        StructField("decoded", StringType(), False),
    ]
)


def attach_blob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped table from a text table: payload =
    utf-8 bytes (a deterministic stand-in for image/audio bytes), metadata =
    typed struct. Pure Column ops — this is the ingestion shape a real
    media pipeline produces."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).cast("long").alias("size_bytes"),
            F.col("source").alias("source") if "source" in df.columns else F.lit(None).cast("string").alias("source"),
        ).alias("metadata"),
    )


# --- decoders: real where a library (or the stdlib) allows, loud stubs
# otherwise. Import-guarded so the same code is a working decoder in a
# container WITH media libraries and a clearly-marked NotImplementedError
# in one without — never a silent fake.


def decode_image(payload: bytes, fmt: str) -> "object":
    """Decode an image payload to (width, height, mode, pixel bytes).

    Real when Pillow is importable (any PIL-supported format); otherwise
    raises NotImplementedError so pipelines fail loudly rather than fake
    image decoding silently. (This container ships no media libraries —
    tests importorskip accordingly.)"""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, not present in this container; "
            "pip install Pillow to activate this path"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    img.load()
    return {
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
        "pixels": img.tobytes(),
    }


def decode_audio(payload: bytes, fmt: str) -> "object":
    """Decode an audio payload to (rate, channels, width, samples).

    REAL for PCM WAV via the stdlib ``wave`` module (no external library
    needed); other formats use soundfile when importable, else raise
    NotImplementedError."""
    import io

    if fmt.lower() in ("wav", "audio/wav", "audio/x-wav"):
        import struct
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            n, width = w.getnframes(), w.getsampwidth()
            raw = w.readframes(n)
            if width == 2:
                samples = list(
                    struct.unpack(f"<{len(raw) // 2}h", raw)
                )
            elif width == 1:  # unsigned 8-bit PCM
                samples = [b - 128 for b in raw]
            else:
                samples = list(raw)  # pass bytes through for exotic widths
            return {
                "rate": w.getframerate(),
                "channels": w.getnchannels(),
                "sample_width": width,
                "samples": samples,
            }
    try:
        import soundfile as sf
    except ImportError as exc:
        raise NotImplementedError(
            f"decoding {fmt!r} requires soundfile, not present in this "
            "container (WAV decodes via the stdlib regardless)"
        ) from exc
    data, rate = sf.read(io.BytesIO(payload))
    return {
        "rate": rate,
        "channels": 1 if data.ndim == 1 else data.shape[1],
        "sample_width": None,
        "samples": data.tolist(),
    }


def sample_frames(payload: bytes, fmt: str, every_n: int = 30) -> "list":
    """Sample every ``every_n``-th frame from a multi-frame payload.

    Real for multi-frame formats Pillow handles (GIF/TIFF) when Pillow is
    importable; true video containers need ffmpeg-class tooling, so
    anything else raises NotImplementedError."""
    try:
        import io

        from PIL import Image, ImageSequence
    except ImportError as exc:
        raise NotImplementedError(
            "frame sampling requires Pillow (GIF/TIFF) or ffmpeg-class "
            "tooling (video), not present in this container"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    return [
        frame.copy()
        for i, frame in enumerate(ImageSequence.Iterator(img))
        if i % every_n == 0
    ]


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': cheap byte-level features standing in for
    real decoded-media features (dimensions, duration, ...). md5 keeps the
    checksum oracle-checkable (DuckDB ships md5; crc32 it does not)."""
    return {
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "head_byte": payload[0] if payload else None,
    }


def extract_blob_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    The ``mapInPandas`` shape is exactly what a real decoder needs: batches
    arrive as pandas DataFrames with ``bytes`` payload cells; output rows are
    a flat typed feature table. Batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
    batch_rows × payload_size fits executor memory at the target scale.
    """
    import pandas as pd  # deferred: executors import lazily

    def extract(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["metadata"]],
                    "size_bytes": [m["size_bytes"] for m in pdf["metadata"]],
                    "payload_md5": [f["payload_md5"] for f in feats],
                    "head_byte": [f["head_byte"] for f in feats],
                    "decoded": "stub",
                }
            )

    return spread(blobs).mapInPandas(extract, schema=BLOB_FEATURES_SCHEMA)


# --- a REAL decodable format: PNG ----------------------------------------
# The container has no media libraries, but PNG needs only zlib + struct
# (stdlib), so this path exercises genuine binary encode → decode round
# trips through the Arrow plumbing instead of a stub.

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal valid 8-bit grayscale PNG (filter 0 scanlines, one IDAT)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def synthesize_png(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nchars_col: str = "n_chars",
) -> DataFrame:
    """Deterministic REAL PNG payload per document: an 8-bit grayscale image
    whose dimensions derive from the row (width = 1 + n_chars % 16,
    height = 1 + id % 16) and whose pixels tile md5(text). Stands in for an
    image-ingest source while remaining bit-reproducible, so downstream
    parsing is value-oracle-checkable from the source table alone."""
    import hashlib as _h

    import pandas as pd

    def synth(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id, text, n_chars in zip(
                pdf[id_col], pdf[text_col], pdf[nchars_col]
            ):
                w = 1 + int(n_chars) % 16
                h = 1 + int(doc_id) % 16
                digest = _h.md5(str(text).encode()).digest()
                pixels = (digest * ((w * h) // len(digest) + 1))[: w * h]
                payloads.append(_encode_png(w, h, pixels))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return spread(df.select(id_col, text_col, nchars_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def parse_png_metadata(blobs: DataFrame) -> DataFrame:
    """Real PNG metadata decode in the Arrow batch path: validates the
    signature, walks the chunk stream, reads IHDR (width, height, bit depth,
    color type), and verifies every chunk CRC against the actual bytes.
    Corrupt/non-PNG payloads produce NULL fields and crc_ok='bad' rather
    than failing the batch — the behavior a 100 TB ingest needs."""
    import struct
    import zlib

    import pandas as pd

    def parse_one(p: bytes):
        if p is None or not p.startswith(PNG_SIG):
            return (None, None, None, None, None, "not_png")
        off = len(PNG_SIG)
        width = height = depth = color = None
        n_chunks = 0
        ok = True
        while off + 8 <= len(p):
            (length,) = struct.unpack(">I", p[off : off + 4])
            tag = p[off + 4 : off + 8]
            body = p[off + 8 : off + 8 + length]
            (crc,) = struct.unpack(">I", p[off + 8 + length : off + 12 + length])
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                ok = False
            n_chunks += 1
            if tag == b"IHDR":
                width, height, depth, color = struct.unpack(">IIBB", body[:10])
            off += 12 + length
            if tag == b"IEND":
                break
        return (width, height, depth, color, n_chunks, "ok" if ok else "bad")

    def parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [parse_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "bit_depth": [r[2] for r in rows],
                    "color_type": [r[3] for r in rows],
                    "n_chunks": [r[4] for r in rows],
                    "crc_ok": [r[5] for r in rows],
                }
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, width int, height int, bit_depth int, "
            "color_type int, n_chunks int, crc_ok string"
        ),
    )


# --- a REAL decodable audio format: WAV (RIFF/PCM) -----------------------
# Like the PNG path: stdlib-only (struct), so encode → decode is a genuine
# binary round trip through the Arrow plumbing, and every parsed field is
# predictable from the source row — value-oracle-checkable end to end.


def _encode_wav(channels: int, sample_rate: int, samples: bytes) -> bytes:
    """Minimal valid PCM WAV: RIFF header + fmt chunk + data chunk."""
    import struct

    bits = 16
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nchars_col: str = "n_chars",
) -> DataFrame:
    """Deterministic REAL PCM WAV payload per document: channels/rate/length
    derive from the row (channels = 1 + id % 2, rate = 8000·(1 + id % 3),
    n_samples = 16 + n_chars % 241) and sample bytes tile md5(text). The
    audio twin of :func:`synthesize_png`."""
    import hashlib as _h

    import pandas as pd

    def synth(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id, text, n_chars in zip(
                pdf[id_col], pdf[text_col], pdf[nchars_col]
            ):
                channels = 1 + int(doc_id) % 2
                rate = 8000 * (1 + int(doc_id) % 3)
                n_samples = 16 + int(n_chars) % 241
                nbytes = n_samples * channels * 2
                digest = _h.md5(str(text).encode()).digest()
                samples = (digest * (nbytes // len(digest) + 1))[:nbytes]
                payloads.append(_encode_wav(channels, rate, samples))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return spread(df.select(id_col, text_col, nchars_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def parse_wav_metadata(blobs: DataFrame) -> DataFrame:
    """Real WAV header decode in the Arrow batch path: validates the RIFF
    signature, walks the chunk stream (fmt / data / any others), and derives
    sample count + duration from the header fields and actual data length.
    Non-WAV / truncated payloads produce NULL fields and status='not_wav'
    instead of failing the batch."""
    import struct

    import pandas as pd

    def parse_one(p: bytes):
        if p is None or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return (None, None, None, None, None, None, "not_wav")
        off = 12
        audio_format = channels = rate = bits = None
        block_align = data_len = None
        while off + 8 <= len(p):
            tag = p[off : off + 4]
            (length,) = struct.unpack("<I", p[off + 4 : off + 8])
            body = p[off + 8 : off + 8 + length]
            # a truncated payload can declare more bytes than exist; trust
            # only what's actually present
            if tag == b"fmt " and len(body) >= 16:
                audio_format, channels, rate, _byte_rate, block_align, bits = (
                    struct.unpack("<HHIIHH", body[:16])
                )
            elif tag == b"data":
                data_len = len(body)
            off += 8 + length + (length % 2)  # RIFF chunks pad to even
        if channels is None or data_len is None or not block_align:
            return (audio_format, channels, rate, bits, None, None, "bad")
        n_samples = data_len // block_align
        duration_ms = n_samples * 1000.0 / rate if rate else None
        return (audio_format, channels, rate, bits, n_samples, duration_ms, "ok")

    def parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [parse_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "audio_format": [r[0] for r in rows],
                    "channels": [r[1] for r in rows],
                    "sample_rate": [r[2] for r in rows],
                    "bits_per_sample": [r[3] for r in rows],
                    "n_samples": [r[4] for r in rows],
                    "duration_ms": [r[5] for r in rows],
                    "status": [r[6] for r in rows],
                }
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, audio_format int, channels int, sample_rate int, "
            "bits_per_sample int, n_samples int, duration_ms double, "
            "status string"
        ),
    )


# --- frame sampling over a deterministic video-like container -------------
# A real video decoder (ffmpeg) is not in this container, so the container
# format is a transparent stand-in: magic + frame count + frame size +
# fixed-size frames. Frame PAYLOADS are ascii md5-hex tiles, so the sampled
# frames' checksums are predictable from the source table by the SQL oracle
# — the frame-slicing arithmetic, every-Nth selection, and Arrow batch
# mechanics are exactly what an ffmpeg-backed version would keep.

VIDEO_MAGIC = b"VID0"
_FRAME_TILE = 4  # frame payload = md5-hex (32 ascii bytes) × 4 = 128 bytes


def synthesize_video(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic multi-frame container per document: n_frames =
    1 + doc_id % 8 fixed-size frames; frame i's bytes are the ascii md5 hex
    of ``text:i`` tiled ×4."""
    import hashlib as _h
    import struct

    import pandas as pd

    def synth(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n_frames = 1 + int(doc_id) % 8
                frames = b"".join(
                    _h.md5(f"{text}:{i}".encode()).hexdigest().encode()
                    * _FRAME_TILE
                    for i in range(n_frames)
                )
                payloads.append(
                    VIDEO_MAGIC
                    + struct.pack("<II", n_frames, 32 * _FRAME_TILE)
                    + frames
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return spread(df.select(id_col, text_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def sample_video_frames(blobs: DataFrame, every_n: int = 2) -> DataFrame:
    """Every-Nth frame sampling: parse the container header, slice out
    frames 0, N, 2N, … and emit one row per sampled frame with its md5.
    One input row fans out to ceil(n_frames/N) output rows inside the same
    Arrow batch — no shuffle, no driver involvement, linear in corpus size."""
    import hashlib as _h
    import struct

    import pandas as pd

    def sample(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, totals, md5s = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None or p[:4] != VIDEO_MAGIC or len(p) < 12:
                    continue
                n_frames, frame_size = struct.unpack("<II", p[4:12])
                for i in range(0, n_frames, every_n):
                    start = 12 + i * frame_size
                    frame = p[start : start + frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
                    md5s.append(_h.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return blobs.mapInPandas(
        sample,
        schema="doc_id long, frame_idx int, n_frames int, frame_md5 string",
    )


# --- a REAL decodable image format #2: JPEG/JFIF marker stream -----------
# Baseline JPEG metadata lives in the marker stream (SOI → APP0 → [DQT] →
# SOF0 → SOS → entropy data → EOI); real ingest extracts dimensions from
# SOF0 without entropy-decoding the scan. The synthesis writes a
# structurally valid JFIF marker sequence (entropy bytes are deterministic
# md5 filler with 0xFF masked out so no spurious markers appear), and the
# parser does the genuine marker walk every JPEG tool does.


def _encode_jpeg(width: int, height: int, n_comp: int, with_dqt: bool, fill: bytes) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b""
    if with_dqt:
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(range(1, 65))
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * n_comp)
        + struct.pack(">BHHB", 8, height, width, n_comp)
        + b"".join(struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_comp))
    )
    sos = (
        b"\xff\xda"
        + struct.pack(">H", 6 + 2 * n_comp)
        + struct.pack(">B", n_comp)
        + b"".join(struct.pack(">BB", i + 1, 0) for i in range(n_comp))
        + b"\x00\x3f\x00"
    )
    entropy = bytes(b & 0x7F for b in fill)
    return b"\xff\xd8" + app0 + dqt + sof + sos + entropy + b"\xff\xd9"


def synthesize_jpeg(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nchars_col: str = "n_chars",
) -> DataFrame:
    """Deterministic structurally-valid JFIF payload per document:
    width = 1 + n_chars % 32, height = 1 + id % 24, components =
    1 + 2·(id % 2) (grayscale/YCbCr), DQT present iff id % 3 == 0 —
    every parsed field is predictable from the source row."""
    import hashlib as _h

    import pandas as pd

    def synth(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id, text, n_chars in zip(
                pdf[id_col], pdf[text_col], pdf[nchars_col]
            ):
                payloads.append(
                    _encode_jpeg(
                        1 + int(n_chars) % 32,
                        1 + int(doc_id) % 24,
                        1 + 2 * (int(doc_id) % 2),
                        int(doc_id) % 3 == 0,
                        _h.md5(str(text).encode()).digest(),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return spread(df.select(id_col, text_col, nchars_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def parse_jpeg_metadata(blobs: DataFrame) -> DataFrame:
    """Real JPEG marker walk in the Arrow batch path: validate SOI framing,
    step marker segments by their declared lengths, pull dimensions/
    precision/component count from SOF0, count header segments up to SOS,
    and check the payload terminates with EOI. Malformed payloads yield
    NULL fields and framing='bad' instead of failing the batch."""
    import struct

    import pandas as pd

    def parse_one(p: bytes):
        if p is None or len(p) < 4 or p[:2] != b"\xff\xd8":
            return (None, None, None, None, None, "not_jpeg")
        off = 2
        width = height = precision = n_comp = None
        n_segments = 0
        while off + 4 <= len(p):
            if p[off] != 0xFF:
                return (width, height, precision, n_comp, n_segments, "bad")
            marker = p[off + 1]
            (length,) = struct.unpack(">H", p[off + 2 : off + 4])
            body = p[off + 4 : off + 2 + length]
            n_segments += 1
            if marker == 0xC0:  # SOF0
                precision, height, width, n_comp = struct.unpack(
                    ">BHHB", body[:6]
                )
            off += 2 + length
            if marker == 0xDA:  # SOS: entropy data follows, runs to EOI
                break
        framing = "ok" if p.endswith(b"\xff\xd9") else "bad"
        return (width, height, precision, n_comp, n_segments, framing)

    def parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [parse_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([r[0] for r in rows], dtype="Int32"),
                    "height": pd.Series([r[1] for r in rows], dtype="Int32"),
                    "precision": pd.Series([r[2] for r in rows], dtype="Int32"),
                    "n_components": pd.Series([r[3] for r in rows], dtype="Int32"),
                    "n_segments": pd.Series([r[4] for r in rows], dtype="Int32"),
                    "framing": [r[5] for r in rows],
                }
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, width int, height int, precision int, "
            "n_components int, n_segments int, framing string"
        ),
    )


def filter_by_metadata(
    blobs: DataFrame, max_size_bytes: int | None = None, formats: list[str] | None = None
) -> DataFrame:
    """Metadata-only pruning — never touches payload bytes, so Parquet
    column pruning keeps the scan narrow (the 100 TB win of the
    payload/metadata split)."""
    out = blobs
    if max_size_bytes is not None:
        out = out.filter(F.col("metadata.size_bytes") <= max_size_bytes)
    if formats:
        out = out.filter(F.col("metadata.format").isin(formats))
    return out


# --- BMP (DIB): the second REAL in-container pixel decoder (r7) ----------
#
# 24-bit uncompressed BMP is fully decodable with the stdlib: fixed
# little-endian headers, BGR triples, rows padded to 4 bytes and stored
# BOTTOM-UP. That makes it the image twin of the stdlib WAV PCM path —
# real pixels decoded in the Arrow stream with no Pillow — and the
# row-flip + padding make the decode genuinely checkable (a decoder that
# forgets either produces different checksums, which the value oracle
# would catch).


def _encode_bmp(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Minimal valid 24-bpp bottom-up BMP. ``pixels_bgr`` is the LOGICAL
    top-down row-major byte stream (height·width·3 bytes); rows are
    written bottom-up with zero padding to 4-byte boundaries, exactly
    per the BITMAPINFOHEADER spec."""
    import struct

    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    pad = b"\x00" * (stride - row_bytes)
    body = b"".join(
        pixels_bgr[r * row_bytes : (r + 1) * row_bytes] + pad
        for r in range(height - 1, -1, -1)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    return header + info + body


def decode_bmp(payload: bytes) -> dict:
    """REAL BMP pixel decode (stdlib only): validates the BM signature
    and 24-bpp uncompressed info header, then undoes the physical layout
    — bottom-up row order and 4-byte row padding — returning the LOGICAL
    top-down pixel byte stream. Raises on anything that is not a plain
    24-bit BI_RGB DIB (loud, like the other real decoders here)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, width, height = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size} planes={planes} "
            f"bpp={bpp} compression={compression})"
        )
    if height <= 0:
        raise ValueError("top-down BMPs (negative height) not supported")
    if width <= 0:
        raise ValueError(f"invalid BMP width {width}")
    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    # the decoder only reads up to the LAST row's pixel bytes — some
    # encoders omit the final row's trailing padding, and such files are
    # fully decodable, so the bound is (height-1)·stride + row_bytes,
    # not height·stride (r8 advisor)
    need = offset + (height - 1) * stride + row_bytes
    if len(payload) < need:
        # Python slicing past the end returns SHORT bytes, which would
        # silently truncate pixel rows — reject like the header checks
        raise ValueError(
            f"truncated BMP: need {need} bytes "
            f"for {width}x{height}, got {len(payload)}"
        )
    rows = []
    for r in range(height):  # physical bottom-up → logical top-down
        start = offset + (height - 1 - r) * stride
        rows.append(payload[start : start + row_bytes])
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "pixels": b"".join(rows),
    }


def synthesize_bmp(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nchars_col: str = "n_chars",
) -> DataFrame:
    """Deterministic REAL BMP payload per document: width = 4 + id % 5
    (so the row padding 0-3 actually varies), height = 3 + n_chars % 7,
    logical pixel bytes tile md5(text) — the image twin of
    :func:`synthesize_wav`."""
    import hashlib as _h

    import pandas as pd

    def synth(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for doc_id, text, n_chars in zip(
                pdf[id_col], pdf[text_col], pdf[nchars_col]
            ):
                width = 4 + int(doc_id) % 5
                height = 3 + int(n_chars) % 7
                nbytes = width * height * 3
                digest = _h.md5(str(text).encode()).digest()
                pixels = (digest * (nbytes // len(digest) + 1))[:nbytes]
                payloads.append(_encode_bmp(width, height, pixels))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return spread(df.select(id_col, text_col, nchars_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )
