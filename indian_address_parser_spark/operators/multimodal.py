"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Web-crawl tables carry binary columns (here: ``pages.html``; the same shape
covers image/audio/video payloads). The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, UDF signatures — is real and tested.
PNG decoding is REAL (pure-stdlib: zlib inflate + scanline unfilter, see
:func:`decode_png`); JPEG/GIF/audio decoding is stubbed (those codecs need
libjpeg/libsndfile — not in this container) behind ``DECODERS`` so a real
decoder drops in per modality without touching the plan.

Design for 100 TB: binary columns dominate bytes, so every operator here
(a) prunes to exactly (key, binary) before the UDF, (b) uses
``mapInPandas`` so one output row per input row is NOT required (corrupt
payloads can be dropped), and (c) bounds Python memory via
``maxRecordsPerBatch`` — payload bytes stream through Arrow in batches,
never materializing a partition at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("sha1", T.StringType()),
    ]
)

# magic-byte sniffing table: prefix → (modality, format)
_MAGIC = (
    (b"<html", ("text", "html")),
    (b"<!DOCTYPE", ("text", "html")),
    (b"\x89PNG", ("image", "png")),
    (b"\xff\xd8\xff", ("image", "jpeg")),
    (b"GIF8", ("image", "gif")),
    (b"RIFF", ("audio", "wav")),
    (b"ID3", ("audio", "mp3")),
    (b"\x1aE\xdf\xa3", ("video", "webm")),
)


def _sniff(payload: bytes) -> tuple[str, str]:
    for magic, kind in _MAGIC:
        if payload[: len(magic)].lower().startswith(magic.lower()):
            return kind
    return ("binary", "unknown")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def decode_png(payload: bytes) -> dict:
    """REAL pure-stdlib PNG decode: chunk walk → zlib inflate → per-scanline
    unfilter (None/Sub/Up/Average/Paeth). Returns width/height/channels and
    the raw ``pixels`` bytes (row-major, 8-bit samples).

    Scope: 8-bit depth, non-interlaced, color types 0/2/4/6 — the shapes a
    crawler's thumbnail pipeline produces; palette/16-bit/Adam7 raise
    NotImplementedError and surface as ``decode_error`` rows. The unfilter
    loop is per-byte Python — fine for metadata extraction on mixed crawl
    data; a production image pipeline would swap a PIL/opencv decoder into
    ``DECODERS`` (same signature) without touching the Spark plan.
    """
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("no IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8-bit supported)")
    if interlace:
        raise NotImplementedError("Adam7 interlacing")
    channels = _PNG_CHANNELS.get(color)
    if channels is None:
        raise NotImplementedError(f"color type {color} (palette unsupported)")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"pixel data is {len(raw)} bytes, expected {(stride + 1) * h}"
        )
    out = bytearray()
    prev = bytearray(stride)
    bpp = channels  # bytes per pixel at 8-bit depth
    p = 0
    for _y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += stride + 1
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad scanline filter {f}")
        out += line
        prev = line
    return {"width": w, "height": h, "channels": channels, "pixels": bytes(out)}


def _decode_image(payload: bytes, fmt: str) -> dict:
    """PNG decodes for real (:func:`decode_png`); JPEG/GIF remain STUBS
    (their entropy coders need libjpeg/PIL — absent here) returning
    deterministic fake features with the real output schema so the
    downstream plan (schema, batching, partitioning) is exercised."""
    if fmt == "png":
        d = decode_png(payload)
        return {"width": d["width"], "height": d["height"], "channels": d["channels"]}
    import zlib

    h = zlib.crc32(payload)  # deterministic across processes (unlike hash())
    return {"width": 64 + h % 1024, "height": 64 + (h >> 10) % 1024, "channels": 3}


def decode_wav(payload: bytes) -> dict:
    """REAL pure-stdlib WAV header decode: RIFF chunk walk → fmt + data.

    Returns channels / sample_rate / n_samples / duration_ms for PCM
    (format 1) and IEEE-float (format 3) payloads; compressed codecs
    (MP3-in-WAV, ADPCM, …) raise NotImplementedError and surface as
    ``decode_error`` rows."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_chunk = None
    data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if cid == b"fmt " and len(body) >= 16:
            fmt_chunk = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt_chunk is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, block_align, bits = fmt_chunk
    if audio_format not in (1, 3):  # PCM / IEEE float
        raise NotImplementedError(f"WAV audio format {audio_format} (compressed)")
    if not (channels and block_align and bits in (8, 16, 24, 32, 64)):
        raise ValueError("malformed fmt chunk")
    n_samples = data_size // block_align
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "duration_ms": round(1000.0 * n_samples / sample_rate, 3) if sample_rate else None,
    }


def _decode_audio(payload: bytes, fmt: str) -> dict:
    """WAV decodes for real (:func:`decode_wav`); MP3 remains a STUB (its
    entropy coder needs libmad/libsndfile — absent here)."""
    if fmt == "wav":
        return decode_wav(payload)
    raise NotImplementedError("mp3 decode requires libsndfile — not in this container")


DECODERS = {"image": _decode_image, "audio": _decode_audio}


def binary_metadata(df: DataFrame, key: str = "url", binary_col: str = "html") -> DataFrame:
    """Typed metadata over an opaque binary column (pure JVM except sniffing).

    Length + sha1 are JVM built-ins; modality sniffing is one Arrow batch
    pass over the payload prefix only.
    """
    pruned = df.select(key, binary_col)

    def sniff_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            import hashlib

            rows = {"url": [], "n_bytes": [], "modality": [], "format": [], "sha1": []}
            for k, payload in zip(pdf[key], pdf[binary_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                modality, fmt = _sniff(payload)
                rows["url"].append(k)
                rows["n_bytes"].append(len(payload))
                rows["modality"].append(modality)
                rows["format"].append(fmt)
                rows["sha1"].append(hashlib.sha1(payload).hexdigest())
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return pruned.mapInPandas(sniff_batches, META_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

# feature columns filled from the decoder dict (everything except the
# key/modality/error bookkeeping columns)
_FEATURE_COLS = tuple(
    f.name for f in FEATURE_SCHEMA.fields if f.name not in ("url", "modality", "decode_error")
)


def decode_features(df: DataFrame, key: str = "url", binary_col: str = "html") -> DataFrame:
    """Per-payload feature extraction through the pluggable DECODERS table.

    Rows whose modality has no decoder (or whose decoder raises) are kept
    with ``decode_error`` set — a 100 TB crawl always contains corrupt
    payloads and dropping them silently hides data loss.
    """
    pruned = df.select(key, binary_col)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {f.name: [] for f in FEATURE_SCHEMA.fields}
            for k, payload in zip(pdf[key], pdf[binary_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                modality, fmt = _sniff(payload)
                cols["url"].append(k)
                cols["modality"].append(modality)
                feat, err = {}, None
                decoder = DECODERS.get(modality)
                if decoder is None:
                    err = f"no decoder for modality={modality}"
                else:
                    try:
                        feat = decoder(payload, fmt)
                    except NotImplementedError as e:
                        err = str(e)
                    except Exception as e:  # corrupt payload: keep the row
                        err = f"{type(e).__name__}: {e}"
                for name in _FEATURE_COLS:
                    cols[name].append(feat.get(name))
                cols["decode_error"].append(err)
            yield pd.DataFrame(cols, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return pruned.mapInPandas(decode_batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, key: str = "url", binary_col: str = "html", every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one row per sampled frame.

    The decode is stubbed (deterministic frame count from payload length);
    the EXPLODING row shape — one input row → many output rows, each with a
    frame index and a (stub) frame payload — is the part that matters for
    the Spark plan, and is real.
    """
    pruned = df.select(key, binary_col)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {"url": [], "frame_idx": [], "frame": []}
            for k, payload in zip(pdf[key], pdf[binary_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                n_frames = max(1, len(payload) // 1024)  # STUB: ffprobe here
                for idx in range(0, n_frames, every_n):
                    cols["url"].append(k)
                    cols["frame_idx"].append(idx)
                    cols["frame"].append(payload[idx : idx + 16])  # STUB bytes
            yield pd.DataFrame(cols, columns=["url", "frame_idx", "frame"])

    return pruned.mapInPandas(frames, schema)
