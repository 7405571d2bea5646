"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design per the build brief: image/audio/video travel as ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample run as
vectorized Arrow UDFs over ``mapInArrow``. The decode step itself is STUBBED
(this container ships no image/audio libraries): when PIL/soundfile are
importable the real decoder runs, otherwise a clearly-marked deterministic
fake produces the same schema/batch shape — the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch flow) is real and tested.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, format string, width int, height int, "
    "decoded boolean, feature array<float>"
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!DO": "html",
}


def _sniff_format(prefix: bytes) -> str:
    for magic, name in _MAGIC.items():
        if prefix.startswith(magic):
            return name
    return "unknown"


def _decode_real(blob: bytes):
    """Real decode path — only reachable when an image library exists."""
    from PIL import Image  # noqa: F401  (absent in this container)
    import io as _io

    img = Image.open(_io.BytesIO(blob))
    return img.width, img.height


def _decode_stub(blob: bytes):
    """STUB DECODER (deterministic fake): no image libs in this container.

    Produces stable pseudo-dimensions from a content hash so downstream
    plumbing (schema, joins, aggregations) is exercised with realistic,
    reproducible values. Replace by _decode_real in a full environment."""
    h = hashlib.md5(blob[:256]).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_media_features(df: DataFrame, id_col: str, blob_col: str,
                           n_features: int = 8) -> DataFrame:
    """media table -> typed feature rows (one per media item), vectorized.

    Feature vector = stub embedding (content-hash-seeded, deterministic);
    with a real decoder it would be the model/pixel features at the same
    schema and batch shape.
    """
    sel = df.select(df[id_col].alias("media_id"), df[blob_col].alias("blob"))

    def feature_batches(batches):
        import numpy as np
        import pyarrow as pa

        try:
            import PIL  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        for b in batches:
            ids = b.column("media_id")
            blobs = b.column("blob").to_pylist()
            n = len(blobs)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            fmts = []
            feats = np.zeros((n, n_features), dtype=np.float32)
            for i, blob in enumerate(blobs):
                blob = blob or b""
                fmts.append(_sniff_format(bytes(blob[:4])))
                if have_pil:
                    try:
                        widths[i], heights[i] = _decode_real(bytes(blob))
                        continue
                    except Exception:  # noqa: BLE001 — fall through to stub
                        pass
                widths[i], heights[i] = _decode_stub(bytes(blob))
                seed = np.frombuffer(
                    hashlib.md5(bytes(blob[:256])).digest(), dtype=np.uint8
                )[:n_features]
                feats[i] = (seed.astype(np.float32) - 128.0) / 128.0
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": ids,
                    "n_bytes": pa.array([len(x or b"") for x in blobs], pa.int64()),
                    "format": pa.array(fmts),
                    "width": pa.array(widths, pa.int32()),
                    "height": pa.array(heights, pa.int32()),
                    "decoded": pa.array([have_pil] * n, pa.bool_()),
                    "feature": pa.array(feats.tolist(), pa.list_(pa.float32())),
                }
            )

    return sel.mapInArrow(feature_batches, FEATURE_SCHEMA)
