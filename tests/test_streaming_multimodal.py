"""Structured Streaming + multimodal binary plumbing tests."""

import pytest
from pyspark.sql import functions as F

from indian_address_parser_spark.operators.multimodal import (
    binary_metadata,
    decode_features,
    sample_frames,
)
from indian_address_parser_spark.sources.pages import generate


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mmpages"))
    generate(spark, n_households=100)["pages"].write.mode("overwrite").parquet(root)
    return spark.read.parquet(root)


class TestMultimodal:
    def test_binary_metadata(self, spark, pages):
        meta = binary_metadata(pages, binary_col="html")
        rows = meta.collect()
        assert len(rows) == pages.count()
        for r in rows[:10]:
            assert r["modality"] == "text" and r["format"] == "html"
            assert r["n_bytes"] > 0 and len(r["sha1"]) == 40

    def test_metadata_deterministic(self, spark, pages):
        a = binary_metadata(pages).orderBy("url").collect()
        b = binary_metadata(pages).orderBy("url").collect()
        assert a == b

    def test_decode_features_unsupported_modality_kept_with_error(self, spark, pages):
        feats = decode_features(pages)
        rows = feats.collect()
        assert len(rows) == pages.count()
        # html has no decoder registered → decode_error set, row kept
        assert all(r["decode_error"] is not None for r in rows)

    def test_decode_features_jpeg_real_through_mapinpandas(self, spark):
        """Baseline JPEG decodes for REAL through the plan (no libjpeg):
        a genuine photograph from the public Spark distribution's mllib
        sample data yields its true dimensions; a corrupt JPEG payload is
        kept with decode_error."""
        import os

        real = _SPARK_KITTEN
        if not os.path.exists(real):
            pytest.skip("Spark sample images not present")
        payload = open(real, "rb").read()
        df = spark.createDataFrame(
            [
                ("kitten", bytearray(payload)),
                ("corrupt", bytearray(b"\xff\xd8\xff\xe0" + b"x" * 100)),
            ],
            ["url", "html"],
        )
        rows = {r["url"]: r for r in decode_features(df).collect()}
        k = rows["kitten"]
        assert k["modality"] == "image" and k["decode_error"] is None
        assert (k["width"], k["height"], k["channels"]) == (300, 296, 3)
        assert rows["corrupt"]["decode_error"] is not None

    def test_sample_frames_real_gif(self, spark):
        """REAL frame sampling: a 7-frame animated GIF sampled every 3
        frames yields frames 0/3/6, each a decodable PNG whose pixels match
        the palette-mapped source indices; a webm payload (no codec in
        container) yields one decode_error row."""
        from indian_address_parser_spark.operators.multimodal import decode_png

        idx_frames = [(2, 2, bytes([fi % 4] * 4)) for fi in range(7)]
        gif = _make_gif(idx_frames, _PALETTE4)
        df = spark.createDataFrame(
            [
                ("anim", bytearray(gif)),
                ("vid", bytearray(b"\x1aE\xdf\xa3" + b"f" * 64)),
            ],
            ["url", "html"],
        )
        rows = sample_frames(df, every_n=3).collect()
        anim = sorted(
            (r for r in rows if r["url"] == "anim"), key=lambda r: r["frame_idx"]
        )
        assert [r["frame_idx"] for r in anim] == [0, 3, 6]
        assert all(r["n_frames"] == 7 and r["decode_error"] is None for r in anim)
        for r in anim:
            d = decode_png(bytes(r["frame"]))
            assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
            assert d["pixels"] == _rgb(bytes([r["frame_idx"] % 4] * 4))
        (vid,) = [r for r in rows if r["url"] == "vid"]
        assert vid["frame"] is None and "codec" in vid["decode_error"]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _make_png(rows: list[bytes], channels: int, filters: list[int] | None = None) -> bytes:
    """Encode a REAL PNG (8-bit, non-interlaced) applying the given
    per-scanline filter types — the exact inverse of decode_png's unfilter,
    implemented independently here so the test is not self-confirming."""
    import struct
    import zlib

    h = len(rows)
    w = len(rows[0]) // channels
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    filters = filters or [0] * h
    bpp = channels
    prev = bytes(w * channels)
    raw = b""
    for y, row in enumerate(rows):
        f = filters[y]
        line = list(row)
        enc = list(line)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = bytes(row)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


class TestPngDecode:
    def test_decode_png_all_filters_roundtrip(self):
        """4×5 grayscale exercising every scanline filter (0..4): unfiltered
        pixels must equal the originals byte-for-byte."""
        from indian_address_parser_spark.operators.multimodal import decode_png

        rows = [bytes([(x * 37 + y * 91) & 0xFF for x in range(4)]) for y in range(5)]
        png = _make_png(rows, channels=1, filters=[0, 1, 2, 3, 4])
        d = decode_png(png)
        assert (d["width"], d["height"], d["channels"]) == (4, 5, 1)
        assert d["pixels"] == b"".join(rows)

    def test_decode_png_rgb_and_rgba(self):
        from indian_address_parser_spark.operators.multimodal import decode_png

        rgb = [bytes(range(y, y + 6)) for y in range(2)]  # 2×2 RGB
        d = decode_png(_make_png(rgb, channels=3, filters=[4, 4]))
        assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
        assert d["pixels"] == b"".join(rgb)
        rgba = [bytes(range(y, y + 8)) for y in range(3)]  # 2×3 RGBA
        d = decode_png(_make_png(rgba, channels=4, filters=[1, 2, 3]))
        assert (d["width"], d["height"], d["channels"]) == (2, 3, 4)
        assert d["pixels"] == b"".join(rgba)

    def test_real_png_through_mapinpandas(self, spark):
        """The r3 'done' gate: a real 2×2 PNG payload decodes through the
        decode_features mapInPandas path to true width/height/channels."""
        png = _make_png([bytes(range(6)), bytes(range(10, 16))], channels=3)
        df = spark.createDataFrame([("u1", bytearray(png))], ["url", "html"])
        row = decode_features(df).collect()[0]
        assert row["modality"] == "image"
        assert row["decode_error"] is None
        assert (row["width"], row["height"], row["channels"]) == (2, 2, 3)

    def test_corrupt_png_kept_with_error(self, spark):
        df = spark.createDataFrame(
            [("bad", bytearray(b"\x89PNG\r\n" + b"x" * 64))], ["url", "html"]
        )
        row = decode_features(df).collect()[0]
        assert row["modality"] == "image"
        assert row["decode_error"] and "ValueError" in row["decode_error"]
        assert row["width"] is None

    def test_wav_header_decode_roundtrip(self):
        """Stdlib wave-module-written PCM file decodes to exact params."""
        import io
        import wave

        from indian_address_parser_spark.operators.multimodal import decode_wav

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(b"\x00\x01" * 2 * 441)  # 441 stereo frames
        d = decode_wav(buf.getvalue())
        assert d == {
            "channels": 2,
            "sample_rate": 44100,
            "n_samples": 441,
            "duration_ms": 10.0,
        }

    def test_wav_through_mapinpandas_and_compressed_error(self, spark):
        import io
        import struct
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\x00\x01" * 80)
        good = buf.getvalue()
        # ADPCM (format 2): header-valid but compressed → decode_error
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
        bad = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        df = spark.createDataFrame(
            [("good", bytearray(good)), ("bad", bytearray(bad))], ["url", "html"]
        )
        rows = {r["url"]: r for r in decode_features(df).collect()}
        g = rows["good"]
        assert g["modality"] == "audio" and g["decode_error"] is None
        assert (g["channels"], g["sample_rate"], g["n_samples"]) == (1, 8000, 80)
        assert g["duration_ms"] == 10.0
        assert rows["bad"]["decode_error"] and "format 2" in rows["bad"]["decode_error"]

    def test_png_property_roundtrip(self):
        """Property: encode(pixels, any filters) → decode == pixels, for
        arbitrary sizes, channel counts, and per-row filter choices."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from indian_address_parser_spark.operators.multimodal import decode_png

        @settings(max_examples=40, deadline=None)
        @given(data=st.data())
        def prop(data):
            w = data.draw(st.integers(1, 6))
            h = data.draw(st.integers(1, 5))
            ch = data.draw(st.sampled_from([1, 2, 3, 4]))
            rows = [
                bytes(data.draw(st.integers(0, 255)) for _ in range(w * ch))
                for _ in range(h)
            ]
            filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
            d = decode_png(_make_png(rows, channels=ch, filters=filters))
            assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
            assert d["pixels"] == b"".join(rows)

        prop()

    def test_unsupported_png_shapes_raise_not_implemented(self):
        import struct

        import pytest as _pytest

        from indian_address_parser_spark.operators.multimodal import decode_png

        def header(depth, color, interlace=0):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
            return b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)

        with _pytest.raises(NotImplementedError, match="bit depth"):
            decode_png(header(16, 0))
        with _pytest.raises(NotImplementedError, match="palette"):
            decode_png(header(8, 3))
        with _pytest.raises(NotImplementedError, match="Adam7"):
            decode_png(header(8, 0, interlace=1))


class TestStreaming:
    def test_stream_extract_and_dedup(self, spark, pages, tmp_path):
        from indian_address_parser_spark.streaming.stream import (
            stream_dedup_mentions,
            stream_extract_mentions,
        )

        src_dir = str(tmp_path / "stream_src")
        out_dir = str(tmp_path / "stream_out")
        ckpt = str(tmp_path / "ckpt")
        # write the same pages twice → duplicates the stream must drop
        pages.write.mode("overwrite").parquet(src_dir)
        pages.write.mode("append").parquet(src_dir)

        stream = spark.readStream.schema(pages.schema).parquet(src_dir)
        mentions = stream_extract_mentions(stream)
        deduped = stream_dedup_mentions(mentions, late_window="10 minutes")

        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        got = spark.read.parquet(out_dir)
        batch = pages.count()  # pages were duplicated; mentions must not be
        n_mentions = got.count()
        assert got.select("mention_id").distinct().count() == n_mentions
        from indian_address_parser_spark.operators.extract import extract_mentions

        assert n_mentions == extract_mentions(pages).count()

    def test_stream_windowed_counts(self, spark, pages, tmp_path):
        """Watermarked tumbling-window agg: totals match the batch groupBy."""
        from indian_address_parser_spark.streaming.stream import (
            stream_extract_mentions,
            stream_windowed_counts,
        )

        src_dir = str(tmp_path / "w_src")
        out_dir = str(tmp_path / "w_out")
        ckpt = str(tmp_path / "w_ckpt")
        pages.write.mode("overwrite").parquet(src_dir)

        stream = spark.readStream.schema(pages.schema).parquet(src_dir)
        counts = stream_windowed_counts(
            stream_extract_mentions(stream), window="1 hour", late_window="1 minute"
        )
        q = (
            counts.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # append mode only FINALIZES windows the watermark has passed — and
        # the watermark only advances on NEW events. Feed one future-dated
        # sentinel page, then tick again: the sentinel pushes the watermark
        # past every real window and flushes them.
        sentinel = pages.limit(1).withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
        )
        sentinel.write.mode("append").parquet(src_dir)
        q2 = (
            counts.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(300)

        got = spark.read.parquet(out_dir)
        from indian_address_parser_spark.operators.extract import extract_mentions

        batch = (
            extract_mentions(pages)
            .groupBy("pincode")
            .count()
            .withColumnRenamed("count", "n")
        )
        # every finalized (window, pincode) row must agree with the batch
        # count for that pincode summed over windows
        streamed = got.groupBy("pincode").agg(F.sum("n_mentions").alias("n_s"))
        joined = streamed.join(batch, "pincode")
        bad = joined.where(F.col("n_s") > F.col("n")).count()
        assert bad == 0
        assert got.count() > 0

    def test_stream_url_sessions_timeout_evicts_state(self, spark, tmp_path):
        """EventTimeTimeout: once the watermark passes a url's last event by
        session_timeout, the session closes (closed=true emitted) and its
        state row is dropped — a later re-appearance starts a FRESH session
        instead of continuing the old count."""
        import os
        import time

        import pandas as pd

        from indian_address_parser_spark.streaming.stream import stream_url_sessions

        src_dir = str(tmp_path / "t_src")
        os.makedirs(src_dir)
        t0 = pd.Timestamp("2026-01-01 00:00:00")

        def write_batch(name, rows, mtime):
            pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
            pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
            path = os.path.join(src_dir, name)
            pdf.to_parquet(path, coerce_timestamps="us")
            os.utime(path, (mtime, mtime))

        base = time.time() - 100
        # batch 1: url A, 2 events. late_window=1h, timeout=30m.
        write_batch("f1.parquet", [("A", t0), ("A", t0 + pd.Timedelta("1 minute"))], base)
        # batch 2: url B at t0+3h → watermark after this batch = t0+2h,
        # which is past A's last event + 30m → A times out in batch 3
        # (timeouts only fire for groups with NO data in the batch, so
        # batch 3 must not contain A)
        write_batch("f2.parquet", [("B", t0 + pd.Timedelta("3 hours"))], base + 2)
        write_batch(
            "f3.parquet", [("C", t0 + pd.Timedelta("3 hours 1 minute"))], base + 4
        )
        # batch 4: A re-appears after eviction — must be a fresh session
        # (n=1, not 3)
        write_batch(
            "f4.parquet", [("A", t0 + pd.Timedelta("3 hours 2 minutes"))], base + 6
        )

        stream = (
            spark.readStream.schema("url string, warc_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        sessions = stream_url_sessions(
            stream, session_timeout="30 minutes", late_window="1 hour"
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName("url_sessions_timeout")
            .option("checkpointLocation", str(tmp_path / "t_ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        rows = spark.table("url_sessions_timeout").collect()
        a_rows = sorted(
            (r for r in rows if r["url"] == "A"), key=lambda r: r["last_ts"]
        )
        closed = [r for r in a_rows if r["closed"]]
        assert len(closed) == 1, a_rows
        assert closed[0]["n_mentions"] == 2
        # the re-appearance after eviction is a fresh session
        fresh = [r for r in a_rows if r["last_ts"] > closed[0]["last_ts"]]
        assert fresh and all(r["n_mentions"] == 1 for r in fresh), a_rows
        b_rows = [r for r in rows if r["url"] == "B"]
        assert b_rows and all(not r["closed"] for r in b_rows)

    def test_stream_url_sessions_stateful(self, spark, pages, tmp_path):
        """applyInPandasWithState accumulator: per-url counts match batch."""
        from indian_address_parser_spark.streaming.stream import (
            stream_extract_mentions,
            stream_url_sessions,
        )

        src_dir = str(tmp_path / "s_src")
        ckpt = str(tmp_path / "s_ckpt")
        pages.write.mode("overwrite").parquet(src_dir)

        stream = spark.readStream.schema(pages.schema).parquet(src_dir)
        sessions = stream_url_sessions(stream_extract_mentions(stream))
        # update mode needs an update-capable sink — memory sink in tests
        q = (
            sessions.writeStream.format("memory")
            .queryName("url_sessions")
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        got = spark.table("url_sessions")
        # update mode may emit a url several times (one per batch); the LAST
        # row per url carries the running total — single batch here, so rows
        # are already final
        from indian_address_parser_spark.operators.extract import extract_mentions

        batch = extract_mentions(pages).groupBy("url").count()
        joined = got.join(batch, "url")
        mismatches = joined.where(F.col("n_mentions") != F.col("count")).count()
        assert mismatches == 0
        assert got.count() == batch.count()
        r = got.limit(1).collect()[0]
        assert r["first_ts"] <= r["last_ts"]


# --- GIF: independent encoder (real LZW, not the decoder inverted) ---------


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder with late code-width change — implemented
    independently of the decoder so the roundtrip is not self-confirming."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # encoder lags the decoder's table by one entry → +1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(
    frames: list[tuple[int, int, bytes]],
    palette: bytes,
    interlace_first: bool = False,
) -> bytes:
    """Assemble a real GIF89a: global palette + one image block per
    (w, h, index_bytes) frame."""
    import math
    import struct

    n_colors = len(palette) // 3
    pal_bits = max(1, math.ceil(math.log2(n_colors)))
    padded = palette + b"\x00" * (3 * (1 << pal_bits) - len(palette))
    w0, h0, _ = frames[0]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w0, h0, 0x80 | (pal_bits - 1), 0, 0)
    out += padded
    min_code_size = max(2, pal_bits)
    for fi, (w, h, idx) in enumerate(frames):
        iflags = 0x40 if (interlace_first and fi == 0) else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        out += bytes([min_code_size])
        data = _gif_lzw_encode(idx, min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


_PALETTE4 = bytes(
    [255, 0, 0, 0, 255, 0, 0, 0, 255, 40, 41, 42]
)  # red green blue gray


def _rgb(idx: bytes, palette: bytes = _PALETTE4) -> bytes:
    return b"".join(palette[3 * i : 3 * i + 3] for i in idx)


class TestGifDecode:
    def test_gif_lzw_roundtrip_with_repeats(self):
        """Repeated runs force real table entries AND the KwKwK case."""
        from indian_address_parser_spark.operators.multimodal import decode_gif

        idx = bytes([0, 0, 0, 0, 1, 1, 2, 2, 0, 0, 0, 1, 1, 1, 2, 3] * 4)
        gif = _make_gif([(8, 8, idx)], _PALETTE4)
        d = decode_gif(gif)
        assert (d["width"], d["height"], d["channels"], d["n_frames"]) == (8, 8, 3, 1)
        assert d["pixels"] == _rgb(idx)

    def test_gif_interlaced_first_frame(self):
        from indian_address_parser_spark.operators.multimodal import decode_gif

        h, w = 9, 3  # hits all four interlace passes
        rows = [bytes([(y + x) % 4 for x in range(w)]) for y in range(h)]
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        stored = b"".join(rows[r] for r in order)
        gif = _make_gif([(w, h, stored)], _PALETTE4, interlace_first=True)
        d = decode_gif(gif)
        assert d["pixels"] == _rgb(b"".join(rows))

    def test_gif_counts_frames_and_skips_extensions(self):
        from indian_address_parser_spark.operators.multimodal import decode_gif

        f1 = bytes([0, 1, 2, 3])
        f2 = bytes([3, 2, 1, 0])
        gif = bytearray(_make_gif([(2, 2, f1), (2, 2, f2)], _PALETTE4))
        # splice a graphic-control extension before the first image block
        img_at = gif.index(b"\x2c")
        gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        gif = bytes(gif[:img_at]) + gce + bytes(gif[img_at:])
        d = decode_gif(gif)
        assert d["n_frames"] == 2
        assert d["pixels"] == _rgb(f1)  # first frame decoded, second counted

    def test_gif_bomb_guard(self):
        import struct

        from indian_address_parser_spark.operators.multimodal import (
            _GIF_MAX_PIXELS,
            decode_gif,
        )

        gif = bytearray(_make_gif([(2, 2, bytes([0, 1, 2, 3]))], _PALETTE4))
        # forge the image descriptor to claim a giant frame
        img_at = gif.index(b"\x2c")
        gif[img_at + 5 : img_at + 9] = struct.pack("<HH", 65535, 65535)
        with pytest.raises(ValueError, match="cap"):
            decode_gif(bytes(gif))
        assert 65535 * 65535 > _GIF_MAX_PIXELS

    def test_gif_property_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from indian_address_parser_spark.operators.multimodal import decode_gif

        @settings(max_examples=25, deadline=None)
        @given(data=st.data())
        def check(data):
            w = data.draw(st.integers(1, 12))
            h = data.draw(st.integers(1, 12))
            n_colors = data.draw(st.integers(2, 4))
            idx = bytes(
                data.draw(
                    st.lists(
                        st.integers(0, n_colors - 1),
                        min_size=w * h,
                        max_size=w * h,
                    )
                )
            )
            palette = _PALETTE4[: 3 * n_colors]
            d = decode_gif(_make_gif([(w, h, idx)], palette))
            assert (d["width"], d["height"]) == (w, h)
            assert d["pixels"] == _rgb(idx, palette)

        check()

    def test_gif_through_mapinpandas(self, spark):
        idx = bytes([0, 1, 2, 3])
        gif = _make_gif([(2, 2, idx)], _PALETTE4)
        df = spark.createDataFrame([("g1", bytearray(gif))], ["url", "html"])
        row = decode_features(df).collect()[0]
        assert row["modality"] == "image" and row["decode_error"] is None
        assert (row["width"], row["height"], row["channels"]) == (2, 2, 3)


# --- MP3: synthetic CBR/VBR frame streams -----------------------------------


def _mp3_frame_bytes(br_idx: int = 9, sr_idx: int = 0, mono: bool = False,
                     padding: int = 0) -> bytes:
    """One MPEG1 Layer-III frame (header + zero payload of the exact
    header-arithmetic length)."""
    bitrates = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    rates = (44100, 48000, 32000)
    b1 = 0xFB  # MPEG1, Layer III, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0xC0 if mono else 0x00
    frame_len = 144 * bitrates[br_idx - 1] * 1000 // rates[sr_idx] + padding
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * (frame_len - 4)


def _id3v2(size: int) -> bytes:
    body = b"\x00" * size
    ss = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    return b"ID3\x04\x00\x00" + ss + body


class TestMp3Decode:
    def test_cbr_stream_with_id3_tag(self):
        from indian_address_parser_spark.operators.multimodal import decode_mp3

        payload = _id3v2(77) + _mp3_frame_bytes() * 5
        d = decode_mp3(payload)
        assert d["sample_rate"] == 44100 and d["channels"] == 2
        assert d["n_samples"] == 5 * 1152
        assert d["duration_ms"] == round(1000.0 * 5 * 1152 / 44100, 3)

    def test_vbr_counts_true_frame_durations(self):
        from indian_address_parser_spark.operators.multimodal import decode_mp3

        frames = [_mp3_frame_bytes(br_idx=i, mono=True) for i in (3, 9, 14, 5)]
        d = decode_mp3(b"".join(frames))
        assert d["channels"] == 1
        assert d["n_samples"] == 4 * 1152

    def test_false_sync_is_rejected(self):
        from indian_address_parser_spark.operators.multimodal import decode_mp3

        # 0xFF bytes that never parse as a confirmed header pair
        with pytest.raises(ValueError, match="no MPEG audio frame"):
            decode_mp3(b"\xff\x00\xff\x00" * 64)

    def test_garbage_after_last_frame_is_ignored(self):
        from indian_address_parser_spark.operators.multimodal import decode_mp3

        d = decode_mp3(_mp3_frame_bytes() * 3 + b"TAG" + b"\x00" * 125)
        assert d["n_samples"] == 3 * 1152

    def test_mp3_through_mapinpandas_bare_sync(self, spark):
        """A bare (ID3-less) MPEG1-LIII stream sniffs as audio/mp3 and
        decodes through the DECODERS registry."""
        payload = _mp3_frame_bytes() * 2
        df = spark.createDataFrame([("m1", bytearray(payload))], ["url", "html"])
        row = decode_features(df).collect()[0]
        assert row["modality"] == "audio" and row["decode_error"] is None
        assert row["sample_rate"] == 44100
        assert row["n_samples"] == 2 * 1152


# --- minimal baseline JPEG ENCODER (test-only; the exact inverse of
# decode_jpeg's pipeline: RGB→YCbCr → optional box-mean chroma downsample →
# 8×8 forward DCT → quantize → zigzag → Huffman RLE with byte stuffing).
# Huffman tables are a small custom canonical spec (12 DC categories at
# 4 bits, all 162 baseline AC symbols at 8 bits) shared with the DHT
# segment, so the decoder exercises its real table-building path. ---

_SPARK_KITTEN = (
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP153539.jpg"
)


def _jpeg_huffspec():
    dc = ([0, 0, 0, 12] + [0] * 12, bytes(range(12)))
    ac_syms = bytes([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    ac = ([0] * 7 + [162] + [0] * 8, ac_syms)
    return dc, ac


def _jpeg_huff_codes(counts, symbols):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, v, k):
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            self.put(0xFF, 8 - self.n)  # pad with 1-bits (T.81 F.1.2.3)


def _jpeg_mag(v):
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _make_jpeg(img, samp=None, restart=0, qval=1):
    """Encode a numpy uint8 image (HxW grayscale or HxWx3 RGB) as a
    baseline JPEG. qval fills the whole quantization table (qval>255
    exercises the 16-bit DQT path); samp is a per-component (h, v) list."""
    import struct

    import numpy as np

    gray = img.ndim == 2
    h_img, w_img = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        samp = samp or [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    q = np.full(64, float(qval))
    comp_planes = []
    for (hs, vs), plane in zip(samp, planes):
        fh, fw = mcuy * vmax * 8, mcux * hmax * 8
        pl = np.pad(plane, ((0, fh - h_img), (0, fw - w_img)), mode="edge")
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            pl = pl.reshape(fh // ry, ry, fw // rx, rx).mean(axis=(1, 3))
        comp_planes.append(pl)
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    C = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8)
    C[0, :] = np.sqrt(1.0 / 8)
    from indian_address_parser_spark.operators.multimodal import _JPEG_ZIGZAG

    zig = np.asarray(_JPEG_ZIGZAG)
    dc_spec, ac_spec = _jpeg_huffspec()
    dc_codes = _jpeg_huff_codes(*dc_spec)
    ac_codes = _jpeg_huff_codes(*ac_spec)
    out = bytearray(b"\xff\xd8")
    wide = qval > 255
    body = bytes([(1 << 4) if wide else 0]) + (
        struct.pack(">64H", *(int(v) for v in q)) if wide else bytes(int(v) for v in q)
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h_img, w_img, ncomp)
    for i, (hs, vs) in enumerate(samp):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, dc_spec), (1, ac_spec)):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([ncomp]) + b"".join(bytes([i + 1, 0x00]) for i in range(ncomp))
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _JpegBitWriter()
    preds = [0] * ncomp
    mcu_count = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.flush()
                out += bw.out
                bw = _JpegBitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for ci, (hs, vs) in enumerate(samp):
                pl = comp_planes[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = pl[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        zzc = np.rint((C @ blk @ C.T).reshape(64)[zig] / q).astype(int)
                        diff = int(zzc[0]) - preds[ci]
                        preds[ci] = int(zzc[0])
                        s, bits = _jpeg_mag(diff)
                        code, ln = dc_codes[s]
                        bw.put(code, ln)
                        if s:
                            bw.put(bits, s)
                        k = 1
                        while k < 64:
                            run = 0
                            while k < 64 and zzc[k] == 0:
                                run += 1
                                k += 1
                            if k == 64:
                                code, ln = ac_codes[0x00]  # EOB
                                bw.put(code, ln)
                                break
                            while run >= 16:
                                code, ln = ac_codes[0xF0]  # ZRL
                                bw.put(code, ln)
                                run -= 16
                            s, bits = _jpeg_mag(int(zzc[k]))
                            code, ln = ac_codes[(run << 4) | s]
                            bw.put(code, ln)
                            bw.put(bits, s)
                            k += 1
            mcu_count += 1
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


class TestJpegDecode:
    def _rand_img(self, h, w, ch, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, 3)
        return rng.integers(0, 256, size=shape, dtype=np.uint8)

    def test_grayscale_roundtrip_near_exact(self):
        """quant=1 grayscale: the only loss is forward/inverse DCT float
        rounding — every sample within ±2 of the original."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        img = self._rand_img(17, 24, 1, seed=7)
        d = decode_jpeg(_make_jpeg(img))
        assert (d["width"], d["height"], d["channels"]) == (24, 17, 1)
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(17, 24)
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2

    def test_rgb_444_roundtrip(self):
        """4:4:4 RGB at quant=1: color-convert + DCT rounding only."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        img = self._rand_img(21, 19, 3, seed=11)
        d = decode_jpeg(_make_jpeg(img))
        assert (d["width"], d["height"], d["channels"]) == (19, 21, 3)
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(21, 19, 3)
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4

    def test_420_subsampled_gradient(self):
        """2x2-subsampled chroma on a smooth gradient with odd dimensions:
        exercises MCU padding, box-mean downsample (encoder) vs nearest-
        neighbor upsample (decoder), and the final crop."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        h, w = 29, 35
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=-1
        ).astype(np.uint8)
        d = decode_jpeg(_make_jpeg(img, samp=[(2, 2), (1, 1), (1, 1)]))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
        err = np.abs(got.astype(int) - img.astype(int))
        assert float(err.mean()) < 4.0
        assert int(err.max()) <= 24  # chroma NN-upsample bound on this gradient

    def test_restart_markers_identical_output(self):
        """DRI + RSTn segmentation must not change a single pixel."""
        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        img = self._rand_img(24, 40, 3, seed=3)
        plain = decode_jpeg(_make_jpeg(img))
        with_rst = decode_jpeg(_make_jpeg(img, restart=2))
        assert plain == with_rst

    def test_16bit_quant_table(self):
        """qval=300 forces the Pq=1 (16-bit DQT) path; a constant-color
        image reconstructs within the DC quantization error bound."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        img = np.full((16, 16), 77, dtype=np.uint8)
        d = decode_jpeg(_make_jpeg(img, qval=300))
        got = np.frombuffer(d["pixels"], dtype=np.uint8)
        assert int(np.abs(got.astype(int) - 77).max()) <= 300 / 2 / 8 + 1

    def test_real_spark_sample_jpeg(self):
        """A real 4:2:0 photograph from the public Spark distribution
        decodes to its marker-declared dimensions with plausible content
        (non-degenerate variance, photographic mean)."""
        import os

        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        if not os.path.exists(_SPARK_KITTEN):
            pytest.skip("Spark sample images not present")
        d = decode_jpeg(open(_SPARK_KITTEN, "rb").read())
        assert (d["width"], d["height"], d["channels"]) == (300, 296, 3)
        a = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(296, 300, 3)
        assert 30 < float(a.mean()) < 225 and float(a.std()) > 10

    def test_progressive_and_truncated_raise(self):
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        good = _make_jpeg(self._rand_img(8, 8, 1, seed=1))
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
        with pytest.raises(ValueError):
            decode_jpeg(good[: len(good) // 2])  # mid-entropy truncation
        with pytest.raises(ValueError, match="cap"):
            # forged SOF dimensions past the pixel cap
            import struct

            sof_at = good.index(b"\xff\xc0")
            forged = bytearray(good)
            forged[sof_at + 5 : sof_at + 9] = struct.pack(">HH", 65000, 65000)
            decode_jpeg(bytes(forged))


class TestResizeImages:
    def test_encode_png_roundtrip(self):
        from indian_address_parser_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        px = bytes(range(120))  # 8×5 RGB
        d = decode_png(encode_png(8, 5, 3, px))
        assert (d["width"], d["height"], d["channels"], d["pixels"]) == (8, 5, 3, px)

    def test_bilinear_linear_ramp_exact(self):
        """Bilinear interpolation of a linear ramp reproduces the ramp
        (within ±1 rounding) — the defining property of the kernel."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import _resize_kernel

        ramp = np.tile(
            np.linspace(0, 255, 64)[None, :, None], (16, 1, 1)
        ).astype(np.uint8)
        r = _resize_kernel(ramp, 8, 32, "bilinear")
        src_x = (np.arange(32) + 0.5) * 2 - 0.5
        expected = np.interp(src_x, np.arange(64), ramp[0, :, 0].astype(float))
        assert float(np.abs(r[0, :, 0].astype(float) - expected).max()) <= 1.0

    def test_nearest_preserves_palette(self):
        """Nearest-neighbor introduces no new sample values."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import _resize_kernel

        rng = np.random.default_rng(5)
        img = rng.choice(np.array([0, 85, 170, 255], dtype=np.uint8), size=(13, 9, 3))
        out = _resize_kernel(img, 5, 4, "nearest")
        assert set(np.unique(out)) <= {0, 85, 170, 255}

    def test_resize_images_through_mapinpandas(self, spark):
        """PNG + real JPEG + corrupt + non-image through the operator:
        aspect preserved, no upscaling, output decodable as PNG."""
        import os

        import numpy as np

        from indian_address_parser_spark.operators.multimodal import (
            decode_png,
            resize_images,
        )

        big = np.indices((40, 64)).sum(0).astype(np.uint8)  # 64×40 gray PNG
        rows = [
            ("png_big", bytearray(_make_png([big[y].tobytes() for y in range(40)], channels=1))),
            ("png_small", bytearray(_make_png([bytes([1, 2]), bytes([3, 4])], channels=1))),
            ("not_image", bytearray(b"<html>hi</html>")),
            ("corrupt", bytearray(b"\x89PNG\r\n" + b"x" * 32)),
        ]
        if os.path.exists(_SPARK_KITTEN):
            rows.append(("kitten", bytearray(open(_SPARK_KITTEN, "rb").read())))
        df = spark.createDataFrame(rows, ["url", "html"]).repartition(3)
        out = {r["url"]: r for r in resize_images(df, max_side=32).collect()}
        assert len(out) == len(rows)
        b = out["png_big"]
        assert (b["src_width"], b["src_height"]) == (64, 40)
        assert (b["width"], b["height"]) == (32, 20)  # aspect preserved
        d = decode_png(bytes(b["png"]))
        assert (d["width"], d["height"], d["channels"]) == (32, 20, 1)
        s = out["png_small"]  # 2×2 stays 2×2: never upscale
        assert (s["width"], s["height"]) == (2, 2)
        assert out["not_image"]["decode_error"] and out["not_image"]["png"] is None
        assert out["corrupt"]["decode_error"] is not None
        if "kitten" in out:
            k = out["kitten"]
            assert (k["src_width"], k["src_height"]) == (300, 296)
            assert (k["width"], k["height"]) == (32, 32)  # 300/296 ≈ square
            kd = decode_png(bytes(k["png"]))
            assert kd["channels"] == 3


# --- in-test EBML writer (the independent encode half for decode_webm) ---


def _ebml_id(i: int) -> bytes:
    return i.to_bytes((i.bit_length() + 7) // 8, "big")


def _ebml_size(n: int) -> bytes:
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise ValueError("size too large")


def _ebml_el(i: int, body: bytes) -> bytes:
    return _ebml_id(i) + _ebml_size(len(body)) + body


def _ebml_uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def _make_webm(duration_ticks=12345.0, scale_ns=1_000_000, unknown_size=False):
    import struct

    hdr = _ebml_el(0x1A45DFA3, _ebml_el(0x4282, b"webm"))
    info = _ebml_el(
        0x1549A966,
        _ebml_el(0x2AD7B1, _ebml_uint(scale_ns))
        + _ebml_el(0x4489, struct.pack(">d", duration_ticks)),
    )
    vtrack = _ebml_el(
        0xAE,
        _ebml_el(0x83, _ebml_uint(1))
        + _ebml_el(0x86, b"V_VP9")
        + _ebml_el(0xE0, _ebml_el(0xB0, _ebml_uint(640)) + _ebml_el(0xBA, _ebml_uint(360))),
    )
    atrack = _ebml_el(
        0xAE,
        _ebml_el(0x83, _ebml_uint(2))
        + _ebml_el(0x86, b"A_OPUS")
        + _ebml_el(
            0xE1,
            _ebml_el(0xB5, struct.pack(">f", 48000.0)) + _ebml_el(0x9F, _ebml_uint(2)),
        ),
    )
    tracks = _ebml_el(0x1654AE6B, vtrack + atrack)
    if unknown_size:  # streamed Matroska: Segment size all-ones
        return hdr + _ebml_id(0x18538067) + b"\xff" + info + tracks
    return hdr + _ebml_el(0x18538067, info + tracks)


class TestWebmDecode:
    def test_webm_metadata_roundtrip(self):
        from indian_address_parser_spark.operators.multimodal import decode_webm

        d = decode_webm(_make_webm())
        assert (d["width"], d["height"]) == (640, 360)
        assert (d["sample_rate"], d["channels"]) == (48000, 2)
        assert d["duration_ms"] == 12345.0
        assert (d["codec_video"], d["codec_audio"]) == ("V_VP9", "A_OPUS")
        assert d["n_tracks"] == 2

    def test_unknown_size_segment_and_timestamp_scale(self):
        """Streamed WebM (unknown-size Segment) parses identically; a
        non-default TimestampScale rescales the duration."""
        from indian_address_parser_spark.operators.multimodal import decode_webm

        assert decode_webm(_make_webm(unknown_size=True)) == decode_webm(_make_webm())
        # 500 ticks at 2ms/tick = 1000 ms
        d = decode_webm(_make_webm(duration_ticks=500.0, scale_ns=2_000_000))
        assert d["duration_ms"] == 1000.0

    def test_webm_through_mapinpandas_and_errors(self, spark):
        from indian_address_parser_spark.operators.multimodal import _decode_video

        df = spark.createDataFrame(
            [
                ("vid", bytearray(_make_webm())),
                ("trunc", bytearray(_make_webm()[:20])),
            ],
            ["url", "html"],
        )
        rows = {r["url"]: r for r in decode_features(df).collect()}
        v = rows["vid"]
        assert v["modality"] == "video" and v["decode_error"] is None
        assert (v["width"], v["height"], v["sample_rate"]) == (640, 360, 48000)
        assert v["duration_ms"] == 12345.0
        assert rows["trunc"]["decode_error"] is not None
        with pytest.raises(NotImplementedError, match="mp4"):
            _decode_video(b"", "mp4")


class TestProgressiveJpegMetadata:
    def test_progressive_dims_through_decode_features(self, spark):
        """Progressive JPEG (SOF2): pixel decode needs libjpeg, but the
        metadata path reads the true dimensions from the frame header —
        verified against a real progressive file from this box's public
        nodejs docs. resize (pixel-consuming) still surfaces the gap."""
        import os

        from indian_address_parser_spark.operators.multimodal import resize_images

        prog = "/usr/share/doc/nodejs/full-white-stripe.jpg"
        if not os.path.exists(prog):
            pytest.skip("progressive JPEG fixture not present")
        df = spark.createDataFrame(
            [("p", bytearray(open(prog, "rb").read()))], ["url", "html"]
        )
        row = decode_features(df).collect()[0]
        assert row["decode_error"] is None
        assert (row["width"], row["height"], row["channels"]) == (493, 312, 3)
        rrow = resize_images(df).collect()[0]
        assert rrow["decode_error"] and "progressive" in rrow["decode_error"]

    def test_synthetic_sof2_dims(self):
        from indian_address_parser_spark.operators.multimodal import _decode_image

        good = _make_jpeg(
            __import__("numpy").random.default_rng(2).integers(
                0, 256, (10, 14), dtype="uint8"
            )
        )
        prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        d = _decode_image(prog, "jpeg")
        assert (d["width"], d["height"], d["channels"]) == (14, 10, 1)


class TestImagePhash:
    @pytest.fixture(scope="class")
    def kitten_arr(self):
        import os

        import numpy as np

        from indian_address_parser_spark.operators.multimodal import decode_jpeg

        if not os.path.exists(_SPARK_KITTEN):
            pytest.skip("Spark sample images not present")
        d = decode_jpeg(open(_SPARK_KITTEN, "rb").read())
        return np.frombuffer(d["pixels"], np.uint8).reshape(
            d["height"], d["width"], 3
        )

    def test_phash_invariance_and_separation(self, kitten_arr):
        """Same image downscaled 40% and JPEG-re-encoded at coarse quant:
        ≤4 bits moved. A different photograph: ≥16 bits (random ≈ 32)."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import (
            _resize_kernel,
            decode_jpeg,
            phash64,
        )

        def ham(x, y):
            return bin((x ^ y) & ((1 << 64) - 1)).count("1")

        h0 = phash64(kitten_arr)
        small = _resize_kernel(
            kitten_arr, int(kitten_arr.shape[0] * 0.6), int(kitten_arr.shape[1] * 0.6), "bilinear"
        )
        assert ham(h0, phash64(small)) <= 4
        reenc = decode_jpeg(_make_jpeg(kitten_arr, qval=16))
        rearr = np.frombuffer(reenc["pixels"], np.uint8).reshape(kitten_arr.shape)
        assert ham(h0, phash64(rearr)) <= 4
        other = decode_jpeg(
            open(
                "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
                "multi-channel/chr30.4.184.jpg",
                "rb",
            ).read()
        )
        oarr = np.frombuffer(other["pixels"], np.uint8).reshape(
            other["height"], other["width"], 3
        )
        assert ham(h0, phash64(oarr)) >= 16

    def test_phash_dedup_end_to_end(self, spark, kitten_arr):
        """image_phash + banded-Hamming pairs find the planted near-dup
        (same kitten, 60% size, PNG vs JPEG container) and nothing else;
        the pair stage is pure JVM (no Python nodes, no cartesian)."""
        import numpy as np

        from indian_address_parser_spark.operators.multimodal import (
            _resize_kernel,
            encode_png,
            image_phash,
            phash_dup_pairs,
        )

        small = _resize_kernel(kitten_arr, 178, 180, "bilinear")
        rng = np.random.default_rng(9)
        noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [
                ("kitten_jpg", bytearray(open(_SPARK_KITTEN, "rb").read())),
                ("kitten_small_png", bytearray(encode_png(180, 178, 3, small.tobytes()))),
                ("noise_png", bytearray(encode_png(64, 64, 3, noise.tobytes()))),
                ("html", bytearray(b"<html>x</html>")),
            ],
            ["url", "html"],
        ).repartition(2)
        hashed = image_phash(df)
        rows = {r["url"]: r for r in hashed.collect()}
        assert rows["html"]["decode_error"] is not None
        assert all(
            rows[u]["phash"] is not None
            for u in ("kitten_jpg", "kitten_small_png", "noise_png")
        )
        pairs_df = phash_dup_pairs(
            hashed.where(F.col("phash").isNotNull()), max_hamming=3, n_bands=4
        )
        plan = pairs_df._jdf.queryExecution().toString()
        assert "CartesianProduct" not in plan
        pairs = {(r["url_a"], r["url_b"]): r["hamming"] for r in pairs_df.collect()}
        assert set(pairs) == {("kitten_jpg", "kitten_small_png")}
        assert pairs[("kitten_jpg", "kitten_small_png")] <= 3
