"""Multimodal (image/audio/video) column plumbing.

Training-data pipeline mandate: treat media as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

Decode kernels come in two tiers:

- **Real stdlib decoders** (``use_stub=False``): Netpbm images — P1-P6
  headers AND full rasters (``decode_pnm_pixels``: ASCII, packed-bitmap,
  and 1/2-byte binary samples → per-pixel luma), RIFF/WAVE audio —
  ``struct``-unpacked ``fmt ``/``data`` chunks for metadata and full
  8/16-bit PCM sample decode (``decode_wav_samples``), and concatenated
  binary-Netpbm streams as the uncompressed video container
  (``split_pnm_frames``). Feature extraction (mean-luma / RMS-envelope
  bucket pooling) and frame sampling are REAL over these formats. All are
  fully specified by public documentation and need no codec library; any
  other payload raises ``NotImplementedError`` (JPEG/PNG/MP4 decode
  requires PIL/torchaudio/decord, which are not in this container).
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
    "decode_pnm_pixels",
    "decode_wav_header",
    "decode_wav_samples",
    "decode_media_metadata",
    "extract_media_features",
    "sample_video_frames",
    "split_pnm_frames",
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


def _pnm_header(data: bytes, start: int = 0):
    """Parse one Netpbm header at ``start`` → ``(magic, width, height,
    maxval, raster_pos)``. ``maxval`` is 1 for the P1/P4 bitmaps (no
    maxval token in the format); ``raster_pos`` is the first raster byte
    (for binary formats, exactly one whitespace byte follows the last
    header token — the Netpbm spec's single-delimiter rule)."""
    if data[start:start + 1] != b"P" or data[start + 1:start + 2] not in b"123456":
        raise ValueError("not a Netpbm payload")
    magic = data[start:start + 2].decode()
    want = 2 if magic in ("P1", "P4") else 3
    tokens: list[bytes] = []
    i = start + 2
    n = len(data)
    while len(tokens) < want and i < n:
        c = data[i:i + 1]
        if c == b"#":
            while i < n and data[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j:j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    if len(tokens) < want:
        raise ValueError("truncated Netpbm header")
    try:
        vals = [int(t) for t in tokens]
    except ValueError as exc:
        raise ValueError("malformed Netpbm header") from exc
    width, height = vals[0], vals[1]
    maxval = vals[2] if want == 3 else 1
    if width <= 0 or height <= 0 or maxval <= 0 or maxval > 65535:
        raise ValueError("out-of-range Netpbm dimensions")
    # binary rasters start after ONE whitespace byte past the maxval token
    return magic, width, height, maxval, i + 1


def _pnm_raster_len(magic: str, width: int, height: int, maxval: int) -> int:
    """Raster byte length for the BINARY formats (P4/P5/P6)."""
    if magic == "P4":
        return ((width + 7) // 8) * height
    per = 2 if maxval > 255 else 1
    samples = width * height * (3 if magic == "P6" else 1)
    return samples * per


def decode_pnm_pixels(data: bytes) -> tuple[int, int, list[float]]:
    """REAL stdlib raster decode for all six Netpbm formats →
    ``(width, height, luma)`` with per-pixel luma in [0, 1] (grayscale
    value / maxval; RGB → channel mean; bitmaps → 1.0 white, 0.0 black —
    PBM stores 1 = black). Two-byte samples (maxval > 255) are
    big-endian per the spec. Raises ``ValueError`` on truncation."""
    magic, width, height, maxval, pos = _pnm_header(data)
    n_px = width * height
    if magic in ("P1", "P2", "P3"):  # ASCII rasters
        per = {"P1": 1, "P2": 1, "P3": 3}[magic]
        toks = data[pos - 1:].split()
        vals: list[int] = []
        for t in toks:
            if t.startswith(b"#"):
                continue  # comments are rare in rasters; tolerate bare '#'
            if magic == "P1":
                # PBM ASCII permits unseparated bits ("0110")
                vals.extend(1 if ch == 0x31 else 0 for ch in t)
            else:
                vals.append(int(t))
            if len(vals) >= n_px * per:
                break
        if len(vals) < n_px * per:
            raise ValueError("truncated Netpbm ASCII raster")
        vals = vals[:n_px * per]
        if magic == "P1":
            luma = [1.0 - v for v in vals]
        elif magic == "P2":
            luma = [v / maxval for v in vals]
        else:
            luma = [
                (vals[i] + vals[i + 1] + vals[i + 2]) / (3 * maxval)
                for i in range(0, n_px * 3, 3)
            ]
        return width, height, luma
    need = _pnm_raster_len(magic, width, height, maxval)
    raster = data[pos:pos + need]
    if len(raster) < need:
        raise ValueError("truncated Netpbm binary raster")
    if magic == "P4":
        row_bytes = (width + 7) // 8
        luma = []
        for r in range(height):
            row = raster[r * row_bytes:(r + 1) * row_bytes]
            for c in range(width):
                bit = (row[c >> 3] >> (7 - (c & 7))) & 1
                luma.append(1.0 - bit)
        return width, height, luma
    if maxval > 255:
        samples = [
            v / maxval
            for (v,) in struct.iter_unpack(">H", raster)
        ]
    else:
        samples = [b / maxval for b in raster]
    if magic == "P5":
        return width, height, samples
    luma = [
        (samples[i] + samples[i + 1] + samples[i + 2]) / 3
        for i in range(0, n_px * 3, 3)
    ]
    return width, height, luma


def split_pnm_frames(data: bytes) -> list[tuple[int, int]]:
    """Frame offsets of a CONCATENATED binary-Netpbm stream (the classic
    pbmplus multi-image convention: P4/P5/P6 files appended back to back
    — each header fully determines its raster length, so the stream
    splits deterministically). Returns ``[(start, end), ...]``; raises
    ``ValueError`` if the payload is not wall-to-wall binary Netpbm."""
    frames: list[tuple[int, int]] = []
    pos = 0
    n = len(data)
    while pos < n:
        magic, w, h, maxval, rpos = _pnm_header(data, pos)
        if magic not in ("P4", "P5", "P6"):
            raise ValueError(
                "ASCII Netpbm frames have no defined length — "
                "concatenated streams must be P4/P5/P6"
            )
        end = rpos + _pnm_raster_len(magic, w, h, maxval)
        if end > n:
            raise ValueError("truncated Netpbm frame")
        frames.append((pos, end))
        pos = end
    if not frames:
        raise ValueError("empty Netpbm stream")
    return frames


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


def decode_wav_samples(data: bytes) -> tuple[int, list[float]]:
    """REAL stdlib PCM decode → ``(sample_rate, mono)`` with per-frame
    amplitudes in [-1, 1] (channels averaged). Supports the uncompressed
    PCM encodings that need no codec: 8-bit unsigned and 16-bit
    signed little-endian (audio format tag 1). Raises ``ValueError`` on
    non-WAV input, ``NotImplementedError`` on compressed format tags."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_tag = channels = sample_rate = bits = None
    pcm = b""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt " and body + 16 <= n:
            (fmt_tag, channels, sample_rate, _brate,
             _align, bits) = struct.unpack_from("<HHIIHH", data, body)
        elif cid == b"data":
            pcm = data[body:body + min(csize, n - body)]
        pos = body + csize + (csize & 1)
    if not sample_rate or not channels:
        raise ValueError("missing fmt chunk in WAVE payload")
    if fmt_tag != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"WAVE format tag {fmt_tag}/{bits}-bit needs a codec library; "
            "only 8/16-bit PCM decodes stdlib-only"
        )
    if bits == 8:
        samples = [(b - 128) / 128.0 for b in pcm]
    else:
        usable = len(pcm) - (len(pcm) % 2)
        samples = [
            v / 32768.0
            for (v,) in struct.iter_unpack("<h", pcm[:usable])
        ]
    frames = len(samples) // channels
    mono = [
        sum(samples[f * channels:(f + 1) * channels]) / channels
        for f in range(frames)
    ]
    return int(sample_rate), mono


def _pool(values: list[float], dim: int, rms: bool = False) -> list[float]:
    """Average (or RMS) pooling of a variable-length sequence into ``dim``
    equal contiguous buckets — the standard fixed-size featurization of a
    raster scan or a PCM envelope. Empty input → zeros."""
    if not values:
        return [0.0] * dim
    n = len(values)
    out = []
    for b in range(dim):
        lo = b * n // dim
        hi = max((b + 1) * n // dim, lo + 1)
        chunk = values[lo:min(hi, n)] or [values[-1]]
        if rms:
            out.append((sum(v * v for v in chunk) / len(chunk)) ** 0.5)
        else:
            out.append(sum(chunk) / len(chunk))
    return out


def _real_features(ref: str, payload: bytes, dim: int) -> list[float]:
    """Real stdlib feature vector: Netpbm → dim-bucket mean luma of the
    raster scan (in [0,1]); WAVE PCM → dim-bucket RMS envelope (in [0,1]).
    Compressed formats raise NotImplementedError."""
    if payload[:1] == b"P" and payload[1:2] in b"123456":
        _w, _h, luma = decode_pnm_pixels(payload)
        return _pool(luma, dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _rate, mono = decode_wav_samples(payload)
        return _pool(mono, dim, rms=True)
    raise NotImplementedError(
        f"no stdlib feature extractor for media_ref={ref!r}: only Netpbm "
        "rasters and PCM WAVE decode without codec libraries"
    )


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
    """Fixed-dim feature vector per media item — the plumbing for an
    embedding-extraction stage. ``use_stub=False`` extracts REAL features
    with the stdlib decoders (Netpbm → mean-luma buckets, PCM WAVE → RMS
    envelope buckets; see ``_real_features``); the default stub derives
    the vector from repeated payload md5, scaled to [0,1]."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            refs, feats = [], []
            for ref, payload in zip(pdf[ref_col], pdf[bytes_col]):
                data = bytes(payload) if payload is not None else b""
                if not use_stub:
                    feats.append(_real_features(ref, data, dim))
                    refs.append(ref)
                    continue
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
    frame-index and an opaque frame payload. ``use_stub=False`` decodes
    REAL frames from concatenated binary-Netpbm streams (the pbmplus
    multi-image convention — ``split_pnm_frames``), sampling ``n_frames``
    evenly across the stream; each emitted frame is a standalone Netpbm
    file. Compressed containers raise NotImplementedError. The default
    stub emits a sliced md5 chain."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf[ref_col], pdf[bytes_col]):
                data = bytes(payload) if payload is not None else b""
                if not use_stub:
                    if data[:1] != b"P" or data[1:2] not in b"456":
                        raise NotImplementedError(
                            f"no stdlib frame decoder for media_ref="
                            f"{ref!r}: only concatenated binary Netpbm "
                            "(P4/P5/P6) streams decode without codecs"
                        )
                    spans = split_pnm_frames(data)
                    take = min(n_frames, len(spans))
                    for i in range(take):
                        # even sampling across the stream (first frame
                        # always included; stride covers the tail)
                        j = i * len(spans) // take
                        lo, hi = spans[j]
                        rows.append((ref, j, data[lo:hi]))
                    continue
                for i in range(n_frames):
                    frame = hashlib.md5(data + i.to_bytes(4, "big")).digest()
                    rows.append((ref, i, frame))
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "frame"]
            )

    return df.mapInPandas(
        op, schema="media_ref string, frame_idx int, frame binary"
    )
