"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Web-crawl tables carry binary columns (here: ``pages.html``; the same shape
covers image/audio/video payloads). The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, UDF signatures — is real and tested;
the actual media decoding is stubbed (image/audio libraries are not in this
container) behind ``DECODERS`` so a real decoder drops in per modality
without touching the plan.

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


def _decode_image_stub(payload: bytes, fmt: str) -> dict:
    """STUB: real impl would decode + resize via PIL/opencv (absent here).

    Returns deterministic fake features with the real output schema so the
    downstream plan (schema, batching, partitioning) is exercised."""
    import zlib

    h = zlib.crc32(payload)  # deterministic across processes (unlike hash())
    return {"width": 64 + h % 1024, "height": 64 + (h >> 10) % 1024, "channels": 3}


def _decode_audio_stub(payload: bytes, fmt: str) -> dict:
    raise NotImplementedError("audio decode requires libsndfile — not in this container")


DECODERS = {"image": _decode_image_stub, "audio": _decode_audio_stub}


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
        T.StructField("decode_error", T.StringType()),
    ]
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
                cols["width"].append(feat.get("width"))
                cols["height"].append(feat.get("height"))
                cols["channels"].append(feat.get("channels"))
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
