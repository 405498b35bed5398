"""Multimodal payload plumbing: binary columns + typed metadata.

Image/audio/video payloads ride as opaque ``binary`` columns with typed
metadata, exactly like the reference's image bytes
(/root/reference/src/gen-sods-doc-image-ray.py:72): Spark never interprets
the payload; decode/resize/frame-sample run inside Arrow-batched
``mapInPandas`` kernels.

The heavy codecs (PIL/cv2/ffmpeg) are NOT in this container, so the decode
step is a clearly-marked seam: ``decode_image_stub`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which case
it derives metadata (format sniff via magic bytes, fake dimensions) purely
from the bytes — making the Spark-side plumbing (schema, batching,
partitioning, UDF signature) fully real and testable.  Swapping in PIL is
a one-function change.

The reference's grayscale/crop/binarize preprocessing
(/root/reference/src/utils.py:26-50) maps to ``preprocess_spec`` metadata
on each row — the numeric crop box ``(0, 0.05·H, 0.70·W, 0.9·H)`` is
computed here (int-truncated, parity with crop_image) even though the
pixel op itself is stubbed.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("crop_left", T.IntegerType(), True),
        T.StructField("crop_top", T.IntegerType(), True),
        T.StructField("crop_right", T.IntegerType(), True),
        T.StructField("crop_bottom", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

_MAGIC = (
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/webp container
    (b"%PDF-", "pdf"),
)


def sniff_format(payload: bytes) -> Optional[str]:
    for magic, name in _MAGIC:
        if payload[: len(magic)] == magic:
            return name
    return None


def decode_image_stub(payload: bytes, deterministic_fake: bool = False) -> Tuple[int, int]:
    """Decode → (width, height).  STUB: real decode needs PIL/cv2, not in
    this container.  ``deterministic_fake`` derives stable fake dimensions
    from the payload bytes so the distributed plumbing is testable."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2 — plug the real decoder in here"
        )
    w = 320 + (payload[0] if payload else 0) * 4
    h = 240 + (payload[-1] if payload else 0) * 3
    return w, h


def crop_box(width: int, height: int) -> Tuple[int, int, int, int]:
    """The reference's ad-removal crop heuristic, int-truncated
    (parity: /root/reference/src/utils.py:26-39)."""
    return (0, int(height * 0.05), int(width * 0.70), int(0.9 * height))


def media_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """(media_id, payload:binary) → typed metadata rows via mapInPandas.

    Quarantine semantics match the extraction job: a payload the decoder
    rejects produces an ``error`` row, never a task failure."""

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_SCHEMA.fields]
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch[id_col], batch[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    fmt = sniff_format(bytes(payload))
                    w, h = decode_image_stub(bytes(payload), deterministic_fake)
                    left, top, right, bottom = crop_box(w, h)
                    rows.append(
                        (str(media_id), fmt, w, h, len(payload), left, top, right, bottom, None)
                    )
                except Exception as err:  # noqa: BLE001
                    rows.append(
                        (
                            str(media_id),
                            None,
                            None,
                            None,
                            len(payload) if payload is not None else 0,
                            None,
                            None,
                            None,
                            None,
                            f"{type(err).__name__}: {err}",
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(meta_batches, MEDIA_SCHEMA)
