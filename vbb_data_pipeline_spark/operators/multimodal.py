"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``BinaryType`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The container has no
image/audio libraries, so the actual decoders are stubbed
(deterministic fake or NotImplementedError behind an import-try) —
the Spark-side plumbing (schema, batch iteration, partitioning) is
real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

#: Output schema of the decode stage.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("content_digest", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture adapter: treat UTF-8 bytes of a text column as the
    opaque binary payload (the real pipeline reads
    ``spark.read.format('binaryFile')``)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derive plausible
    (width, height, channels) from the content digest. Replace with a
    real decoder (PIL/libvips) where available."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


#: PNG color type → sample count (PNG spec §11.2.2).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """Real (pure-stdlib) image-dimension extraction from the header
    bytes of PNG / GIF / JPEG payloads; ``None`` when the magic bytes
    match no known format.

    This replaces a full decoder for the metadata stage: at 100 TB the
    decode job reads only the first KB per object to build the image
    catalog, deferring pixel decode to the (stubbed) resize stage.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 26:
        # IHDR is always the first chunk: width/height at bytes 16-23,
        # bit depth + color type right after.
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return w, h, _PNG_CHANNELS.get(color_type, 3)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, 3
    if payload[:2] == b"\xff\xd8":  # JPEG SOI: walk segments to a SOF
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            # SOF0-SOF15 except DHT(C4)/DAC(CC)/RST/... carry dims
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                channels = payload[i + 9] if i + 9 < len(payload) else 3
                return w, h, channels
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def decode_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode stage: binary payload → typed image metadata.

    Arrow-batched ``mapInPandas``: each task receives pandas batches,
    never single rows; output is columnar. With a real decoder this is
    also where pixel tensors would be produced (as flattened
    array<float> columns or further binary blocks).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # Real header parse for recognized formats (PNG/GIF/JPEG);
            # deterministic fake for unrecognized payloads so the stage
            # stays total and oracle-checkable on text fixtures.
            dims = [
                parse_image_header(p) or _fake_decode(p) for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "content_digest": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, DECODED_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage placeholder: requires a real image library."""
    if not HAS_PIL:
        raise NotImplementedError(
            "resize requires PIL/libvips — not available in this container; "
            "plumbing: mapInPandas over (doc_id, payload) yielding resized "
            "payload bytes with updated width/height metadata"
        )
    raise NotImplementedError("real decoder wiring lands with the image libs")


def frame_sample_stub(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling placeholder (same contract as resize)."""
    raise NotImplementedError(
        "frame sampling requires a video decoder — not available; "
        "plumbing: mapInPandas yielding one row per sampled frame "
        "(doc_id, frame_idx, payload)"
    )
