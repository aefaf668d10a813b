"""Multimodal column plumbing (engine extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side machinery — schema,
partition-friendly batching, Arrow-batched decode UDFs over
``mapInPandas`` — is real and tested. The codec layer is tiered:

- UNCOMPRESSED formats (BMP, binary PPM, PCM WAV) are decoded for
  REAL with stdlib-only ``struct`` header parsers — no external
  libraries needed (:func:`decode_real_media`, the ``_parse_*``
  functions).
- Compressed formats (JPEG/PNG/MP4/...) need codec libraries the
  container lacks; there ``decode_media`` falls back to a
  deterministic digest stand-in (``_fake_decode``) or raises
  ``NotImplementedError`` when ``strict=True``.

At 100 TB: payloads stay columnar in parquet; mapInPandas streams Arrow
record batches through the decoder so peak memory is one batch per
task, and ``spark.sql.files.maxPartitionBytes`` bounds task input.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real codec: derives (w, h, frames)
    from the payload digest. Replace with PIL/av/librosa in production."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 32


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real image decode via Pillow (only reachable when PIL is
    importable on the executors — not in this container; recorded
    environment constraint, the plumbing below is codec-agnostic)."""
    import io

    from PIL import Image  # pragma: no cover - not installed here

    with Image.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return im.width, im.height, getattr(im, "n_frames", 1)


# ---------------------------------------------------------------------------
# Real stdlib codecs for uncompressed formats (no external libraries)
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniffing for the stdlib-decodable formats."""
    if payload[:2] == b"BM" and len(payload) >= 26:
        return "bmp"
    if payload[:2] in (b"P6", b"P5") and len(payload) > 2 and payload[2:3].isspace():
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def _parse_bmp(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, duration_ms=None) from a BITMAPINFOHEADER BMP.

    Width/height are little-endian signed i32 at offsets 18/22; a
    negative height encodes top-down row order, so abs() is the pixel
    height. Pure ``struct`` — a real decode, not a stand-in."""
    w, h = struct.unpack_from("<ii", payload, 18)
    return int(w), abs(int(h)), None


def _parse_ppm(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, None) from a binary PGM/PPM (P5/P6) header:
    ASCII tokens (magic, width, height, maxval) with ``#`` comments."""
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    w, h = int(tokens[0]), int(tokens[1])
    return w, h, None


def _parse_wav(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """(None, None, duration_ms) from a RIFF/WAVE file: walk the chunk
    list for ``fmt `` (byte rate) and ``data`` (payload size);
    duration_ms = data_size * 1000 // byte_rate. Handles arbitrary
    chunk order and odd-size padding per the RIFF spec."""
    pos, byte_rate, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            byte_rate = struct.unpack_from("<I", payload, pos + 16)[0]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if not byte_rate or data_size is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    return None, None, int(data_size) * 1000 // int(byte_rate)


_STDLIB_PARSERS = {"bmp": _parse_bmp, "ppm": _parse_ppm, "wav": _parse_wav}

REAL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def decode_real_media(media: DataFrame, strict: bool = True) -> DataFrame:
    """REAL metadata decode via Arrow-batched mapInPandas: sniffs each
    payload's magic bytes and parses BMP/PPM/WAV headers with the
    stdlib codecs above. Unknown formats raise when ``strict`` (the
    default — this is the production contract) or emit NULL metadata.

    Scale shape mirrors decode_media: one Arrow batch of payloads in
    flight per task, no shuffle, output is a narrow metadata frame
    (the bytes never leave the scan stage)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                fmt = sniff_format(raw)
                if fmt is None:
                    if strict:
                        raise NotImplementedError(
                            "compressed/unknown media format: stdlib "
                            "codecs cover BMP/PPM/WAV only; install "
                            "PIL/av for the rest"
                        )
                    rows.append((int(mid), None, None, None, None, len(raw)))
                    continue
                w, h, dur = _STDLIB_PARSERS[fmt](raw)
                rows.append((int(mid), fmt, w, h, dur, len(raw)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in REAL_DECODE_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        decode, REAL_DECODE_SCHEMA
    )


def _bmp_bytes(w: int, h: int, fill: int) -> bytes:
    """Minimal valid 24bpp BI_RGB BMP (54-byte header + padded rows)."""
    stride = (3 * w + 3) // 4 * 4
    size = 54 + stride * h
    return (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
        + bytes([fill]) * (stride * h)
    )


def _ppm_bytes(w: int, h: int, fill: int) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + bytes([fill]) * (3 * w * h)


def _wav_bytes(n_samples: int, rate: int = 8000, fill: int = 0) -> bytes:
    """Minimal PCM-16 mono WAV (44-byte header)."""
    data = bytes([fill]) * (2 * n_samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_real_media(docs: DataFrame) -> DataFrame:
    """Synthesize REAL media payloads (valid BMP/PPM/WAV bytes) from the
    documents table, deterministically from doc_id — the test-input
    builder for decode_real_media. doc_id%3: 0 -> WAV, 1 -> BMP,
    2 -> PPM; dimensions are closed-form in doc_id so a SQL oracle can
    replay the expected metadata AND the exact byte size without
    parsing binaries. In production this frame comes straight off a
    parquet scan; the builder exists because the container has no real
    media files."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fill = did % 251
                if did % 3 == 0:
                    payload = _wav_bytes(16 + (did * 13) % 480, fill=fill)
                elif did % 3 == 1:
                    payload = _bmp_bytes(
                        1 + (did * 7) % 31, 1 + (did * 11) % 17, fill
                    )
                else:
                    payload = _ppm_bytes(
                        1 + (did * 5) % 29, 1 + (did * 3) % 13, fill
                    )
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return docs.select("doc_id").mapInPandas(
        build, "media_id long, payload binary"
    )


def decode_media(
    media: DataFrame, strict: bool = False, codec: str = "auto"
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    mapInPandas.

    ``codec``: ``"stub"`` forces the deterministic digest stand-in
    (what the digest-feature queries use — their oracles replay it);
    ``"auto"`` decodes for REAL when it can — stdlib header parsers
    for BMP/PPM magic, then Pillow for other images when it imports on
    the executor — and falls back to the stub otherwise (the PIL
    availability decision is made once per batch, the magic sniff per
    payload); ``strict=True`` raises NotImplementedError instead of
    falling back (surface the missing codec loudly)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = None
        if codec == "auto":
            try:
                from PIL import Image  # noqa: F401

                pil = _pil_decode
            except ImportError:
                pil = None
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload)
                fmt = sniff_format(raw) if codec == "auto" else None
                if fmt in ("bmp", "ppm"):
                    w, h, _ = _STDLIB_PARSERS[fmt](raw)
                    nf = 1
                elif fmt == "wav":
                    # _parse_wav validates + yields duration; this
                    # schema has no duration column so only the
                    # decode succeeding matters (width/height are
                    # meaningless for audio) — round-4 advice: auto
                    # must not fall through to strict/fake when a
                    # stdlib codec can decode.
                    _parse_wav(raw)
                    w, h, nf = None, None, 1
                elif pil is not None and kind == "image":
                    w, h, nf = pil(raw)
                elif strict:
                    raise NotImplementedError(
                        "no real codec for this payload: stdlib parsers "
                        "cover BMP/PPM/WAV; PIL/av not importable on "
                        "this executor"
                    )
                else:
                    w, h, nf = _fake_decode(raw)
                rows.append(
                    (
                        int(mid),
                        str(kind),
                        len(raw),
                        hashlib.sha256(raw).hexdigest(),
                        w,
                        h,
                        nf if kind == "video" else 1,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode, DECODE_SCHEMA
    )


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plan over decoded video metadata: one row per
    sampled frame index (JVM-side explode — no Python)."""
    return decoded.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Build a MEDIA-shaped frame from the documents table (test input:
    payload = utf-8 bytes of the text)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)


def resize_media(decoded: DataFrame, box: int = 64) -> DataFrame:
    """Aspect-preserving fit-into-``box`` resize plan over decoded
    image metadata, via Arrow-batched mapInPandas (the pixel resample
    itself is the stubbed codec step — the batching, schema, and
    dimension arithmetic are the real Spark plumbing).

    out = floor(dim * box / max(w, h) + 0.5) — explicit half-up so a
    SQL oracle reproduces the rounding (Python's round() is
    banker's)."""
    import math

    def scale(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"]):
                m = max(int(w), int(h))
                ow = int(math.floor(int(w) * box / m + 0.5))
                oh = int(math.floor(int(h) * box / m + 0.5))
                rows.append((int(mid), int(w), int(h), ow, oh))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return decoded.filter(F.col("kind") == "image").select(
        "media_id", "width", "height"
    ).mapInPandas(scale, RESIZE_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("unit_sum", T.LongType()),
    ]
)


def extract_media_features(media: DataFrame, strict: bool = True) -> DataFrame:
    """REAL content-level feature extraction (beyond headers): decodes
    the actual pixel/sample data with stdlib parsing inside the same
    Arrow-batched mapInPandas plumbing.

    - BMP: walks the 4-aligned pixel rows bottom-up, summing ONLY the
      3*w payload bytes per row (padding excluded) — n_units = pixels,
      unit_sum = sum of channel bytes;
    - PPM (P6): sums the 3*w*h raster bytes after the ASCII header;
    - WAV: decodes PCM-16LE samples (signed), n_units = samples,
      unit_sum = integer sum of sample values.

    Integer sums (not float means) so results are exact and
    order-independent — the oracle replays them in closed form from
    the synthesized payload recipe, making even the pixel loop
    value-hash-checked."""
    import struct as _struct

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                fmt = sniff_format(raw)
                if fmt == "bmp":
                    w, h, _ = _parse_bmp(raw)
                    off = _struct.unpack_from("<I", raw, 10)[0]
                    stride = (3 * w + 3) // 4 * 4
                    total = 0
                    for r in range(h):
                        row = raw[off + r * stride : off + r * stride + 3 * w]
                        total += sum(row)
                    rows.append((int(mid), fmt, 3 * w * h, total))
                elif fmt == "ppm":
                    w, h, _ = _parse_ppm(raw)
                    raster = raw[len(raw) - 3 * w * h :]
                    rows.append((int(mid), fmt, 3 * w * h, sum(raster)))
                elif fmt == "wav":
                    pos, data = 12, b""
                    while pos + 8 <= len(raw):
                        cid = raw[pos : pos + 4]
                        size = _struct.unpack_from("<I", raw, pos + 4)[0]
                        if cid == b"data":
                            data = raw[pos + 8 : pos + 8 + size]
                        pos += 8 + size + (size & 1)
                    n = len(data) // 2
                    total = sum(
                        _struct.unpack_from("<h", data, 2 * i)[0]
                        for i in range(n)
                    )
                    rows.append((int(mid), fmt, n, total))
                elif strict:
                    raise NotImplementedError(
                        "content features need a stdlib-decodable format "
                        "(BMP/PPM/WAV)"
                    )
                else:
                    rows.append((int(mid), None, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        feats, FEATURES_SCHEMA
    )
