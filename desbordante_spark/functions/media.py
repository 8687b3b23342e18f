"""Multimodal (image/audio/video) column plumbing.

Training-data pipeline mandate: treat media as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

Decode kernels come in two tiers:

- **Real stdlib decoders** (``use_stub=False``): Netpbm images (P1-P6 PPM/
  PGM/PBM headers — plain-text magic + dimensions) and RIFF/WAVE audio
  (``struct``-unpacked ``fmt ``/``data`` chunks → sample rate, channels,
  duration). These formats are fully specified by public documentation and
  need no codec library; any other payload raises ``NotImplementedError``
  (JPEG/PNG/MP4 decode requires PIL/torchaudio/decord, which are not in
  this container).
- **Deterministic stub** (``use_stub=True``, default for fixture
  pipelines): metadata and a fixed-length feature vector derive from the
  md5 of the payload bytes, so tests can pin values without any real
  media. The Spark-side plumbing (schemas, Arrow batch iteration,
  partitioning) is identical in both tiers.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame

__all__ = [
    "MEDIA_META_SCHEMA",
    "decode_ppm_header",
    "decode_wav_header",
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


def decode_ppm_header(data: bytes) -> tuple[int, int]:
    """Parse a Netpbm (P1-P6) header → ``(width, height)``. Pure stdlib:
    the header is ASCII — magic, optional ``#`` comments, then width and
    height tokens separated by whitespace. Raises ``ValueError`` on
    anything that is not a well-formed Netpbm header."""
    if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError("not a Netpbm payload")
    # tokenize the ASCII header, dropping '#'-to-EOL comments
    tokens: list[bytes] = []
    i = 2
    n = len(data)
    while len(tokens) < 2 and i < n:
        c = data[i : i + 1]
        if c == b"#":
            while i < n and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    if len(tokens) < 2:
        raise ValueError("truncated Netpbm header")
    try:
        width, height = int(tokens[0]), int(tokens[1])
    except ValueError as exc:
        raise ValueError("malformed Netpbm dimensions") from exc
    if width <= 0 or height <= 0:
        raise ValueError("non-positive Netpbm dimensions")
    return width, height


def decode_wav_header(data: bytes) -> tuple[int, int, int]:
    """Parse a RIFF/WAVE header → ``(sample_rate, channels, duration_ms)``.
    Walks the chunk list with ``struct``: ``fmt `` gives channels + sample
    rate + byte rate, ``data`` gives the payload size; duration is
    ``data_size / byte_rate``. Raises ``ValueError`` on non-WAV input."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sample_rate = channels = byte_rate = None
    data_size = None
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt " and body + 16 <= n:
            (_fmt, channels, sample_rate, byte_rate,
             _align, _bits) = struct.unpack_from("<HHIIHH", data, body)
        elif cid == b"data":
            data_size = min(csize, n - body)
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if not sample_rate or not channels or not byte_rate or data_size is None:
        raise ValueError("missing fmt/data chunk in WAVE payload")
    duration_ms = data_size * 1000 // byte_rate
    return int(sample_rate), int(channels), int(duration_ms)


def _real_meta(ref: str, kind: str, payload: bytes):
    """Real stdlib decode: Netpbm → (w, h, 0); WAVE → (0, 0, duration).
    Unknown formats raise NotImplementedError — honest partiality, the
    compressed formats need codec libraries this container lacks."""
    if payload[:1] == b"P" and payload[1:2] in b"123456":
        w, h = decode_ppm_header(payload)
        return w, h, 0
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _rate, _ch, duration_ms = decode_wav_header(payload)
        return 0, 0, duration_ms
    raise NotImplementedError(
        f"no stdlib decoder for media_ref={ref!r} kind={kind!r}: only "
        "Netpbm (P1-P6) and RIFF/WAVE decode without codec libraries; "
        "wire PIL/torchaudio here for compressed formats"
    )


def decode_media_metadata(
    df: DataFrame,
    ref_col: str = "media_ref",
    kind_col: str = "media_kind",
    bytes_col: str = "payload",
    use_stub: bool = True,
) -> DataFrame:
    """Per-media metadata via ``mapInPandas`` (Arrow batches; one Python
    worker per partition, no per-row overhead). ``use_stub=False`` decodes
    for real with the stdlib Netpbm/WAVE parsers (see ``_real_meta``);
    the default stub derives deterministic metadata from the payload md5
    for fixture pipelines."""

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
                else:
                    w, h, d = _real_meta(ref, kind, data)
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
