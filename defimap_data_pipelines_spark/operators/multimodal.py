"""Multimodal column plumbing (engine extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side machinery — schema,
partition-friendly batching, Arrow-batched decode UDFs over
``mapInPandas`` — is real and tested; the actual codec step is STUBBED
(the container has no image/audio libraries): ``decode_media`` computes
deterministic fake features derived from the payload bytes, and raises
``NotImplementedError`` when ``strict=True``.

At 100 TB: payloads stay columnar in parquet; mapInPandas streams Arrow
record batches through the decoder so peak memory is one batch per
task, and ``spark.sql.files.maxPartitionBytes`` bounds task input.
"""

from __future__ import annotations

import hashlib
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


def decode_media(
    media: DataFrame, strict: bool = False, codec: str = "auto"
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    mapInPandas.

    ``codec``: ``"stub"`` forces the deterministic digest stand-in
    (what the registered queries use — their oracles replay it);
    ``"auto"`` uses Pillow for images when it imports on the executor
    and falls back to the stub otherwise (the fallback decision is
    made once per batch from library availability, never from data);
    ``strict=True`` raises NotImplementedError instead of falling
    back (surface the missing codec loudly)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = None
        if codec == "auto":
            try:
                from PIL import Image  # noqa: F401

                real = _pil_decode
            except ImportError:
                real = None
        for pdf in batches:
            if strict and real is None:
                raise NotImplementedError(
                    "real media decoding needs codec libraries (PIL/av); "
                    "none are importable on this executor"
                )
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload)
                if real is not None and kind == "image":
                    w, h, nf = real(raw)
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
