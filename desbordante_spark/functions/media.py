"""Multimodal (image/audio/video) column plumbing.

Training-data pipeline mandate: treat media as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators. The image/audio codec libraries are
NOT in this container, so the decode kernels are STUBBED — clearly marked —
behind ``use_stub``: the Spark-side plumbing (schemas, batch iteration,
partitioning) is real and tested; swapping in a real decoder is a one-
function change inside the pandas iterator.

Stub semantics (deterministic, so tests can pin values): "decoding" derives
metadata and a fixed-length feature vector from the md5 of the payload
bytes. With ``use_stub=False`` the kernels raise ``NotImplementedError``
until a codec (PIL / torchaudio / decord) is wired in.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

__all__ = [
    "MEDIA_META_SCHEMA",
    "decode_media_metadata",
    "extract_media_features",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, byte_len long,"
    " width int, height int, duration_ms long"
)


def _stub_meta(ref: str, kind: str, payload: bytes):
    h = hashlib.md5(payload or b"").digest()
    width = 160 + h[0] * 8
    height = 120 + h[1] * 8
    duration = (h[2] * 256 + h[3]) * 40 if kind in ("audio", "video") else 0
    return width, height, duration


def decode_media_metadata(
    df: DataFrame,
    ref_col: str = "media_ref",
    kind_col: str = "media_kind",
    bytes_col: str = "payload",
    use_stub: bool = True,
) -> DataFrame:
    """Per-media metadata via ``mapInPandas`` (Arrow batches; one Python
    worker per partition, no per-row overhead)."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for ref, kind, payload in zip(
                pdf[ref_col], pdf[kind_col], pdf[bytes_col]
            ):
                data = bytes(payload) if payload is not None else b""
                if use_stub:
                    w, h, d = _stub_meta(ref, kind, data)
                else:  # pragma: no cover - codec not present in container
                    raise NotImplementedError(
                        "real media decode requires PIL/torchaudio; "
                        "wire it here"
                    )
                rows.append((ref, kind, len(data), w, h, d))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "media_kind", "byte_len", "width",
                         "height", "duration_ms"],
            )

    return df.mapInPandas(op, schema=MEDIA_META_SCHEMA)


def extract_media_features(
    df: DataFrame,
    ref_col: str = "media_ref",
    bytes_col: str = "payload",
    dim: int = 16,
    use_stub: bool = True,
) -> DataFrame:
    """Fixed-dim feature vector per media item (stub: bytes of repeated md5,
    scaled to [0,1]) — the plumbing for an embedding-extraction stage."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            refs, feats = [], []
            for ref, payload in zip(pdf[ref_col], pdf[bytes_col]):
                data = bytes(payload) if payload is not None else b""
                if not use_stub:  # pragma: no cover
                    raise NotImplementedError("real feature extraction TBD")
                raw = b""
                seed = data or ref.encode()
                while len(raw) < dim:
                    seed = hashlib.md5(seed).digest()
                    raw += seed
                feats.append([b / 255.0 for b in raw[:dim]])
                refs.append(ref)
            yield pd.DataFrame({"media_ref": refs, "features": feats})

    return df.mapInPandas(
        op, schema="media_ref string, features array<double>"
    )


def sample_video_frames(
    df: DataFrame,
    ref_col: str = "media_ref",
    bytes_col: str = "payload",
    n_frames: int = 4,
    use_stub: bool = True,
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame with a
    frame-index and an opaque frame payload (stub: sliced md5 chain)."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf[ref_col], pdf[bytes_col]):
                data = bytes(payload) if payload is not None else b""
                if not use_stub:  # pragma: no cover
                    raise NotImplementedError("real frame decode TBD")
                for i in range(n_frames):
                    frame = hashlib.md5(data + i.to_bytes(4, "big")).digest()
                    rows.append((ref, i, frame))
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "frame"]
            )

    return df.mapInPandas(
        op, schema="media_ref string, frame_idx int, frame binary"
    )
