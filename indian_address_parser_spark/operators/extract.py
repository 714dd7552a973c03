"""Mention extraction operator: pages → mentions (narrow, no shuffle).

Reference lifecycle stages E1-E2 + R1-R8 run inside one Arrow-batched
``mapInPandas`` per page partition (SURVEY.md §3.4 stage 1). Column pruning
matters: we select only (url, text) before the UDF so the ``html: binary``
column — which dominates page bytes — is never read from parquet
(verified in tests via the scan's ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indian_address_parser_spark.functions.udfs import (
    MENTION_SCHEMA,
    make_mention_extractor,
)


def extract_mentions(pages: DataFrame, candidate_fn=None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → mentions table.

    Adds ``mention_id = url + '#' + mention_seq`` — globally unique and
    deterministic, so reruns and resumed runs agree (no
    monotonically_increasing_id, which is partition-layout-dependent).
    """
    src = pages.select("url", "text").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    mentions = src.mapInPandas(make_mention_extractor(candidate_fn), MENTION_SCHEMA)
    return mentions.withColumn(
        "mention_id", F.concat_ws("#", F.col("url"), F.col("mention_seq").cast("string"))
    )
