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

    def test_decode_features_image_stub(self, spark):
        df = spark.createDataFrame(
            [("u1", bytearray(b"\x89PNG\r\n" + b"x" * 100))], ["url", "html"]
        )
        row = decode_features(df).collect()[0]
        assert row["modality"] == "image"
        assert row["decode_error"] is None
        assert row["width"] >= 64 and row["height"] >= 64 and row["channels"] == 3

    def test_sample_frames_explodes_rows(self, spark):
        df = spark.createDataFrame(
            [("u1", bytearray(b"\x1aE\xdf\xa3" + b"f" * 40960))], ["url", "html"]
        )
        frames = sample_frames(df, every_n=10).collect()
        assert len(frames) == 4  # 40 stub frames sampled every 10
        assert [f["frame_idx"] for f in frames] == [0, 10, 20, 30]


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
