"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query — the full ER chain (derived-address synthesis →
normalization pandas UDF → field extraction → blocking → candidate self-join
→ JW/Levenshtein scoring → large/small-star connected components) over
sf0.001 documents.

``queries``/``oracle_sql``: one entry per operator family from SURVEY.md §2;
every SQL-expressible one carries a DuckDB oracle (validated locally by
``scripts/check_oracle.py`` — 24/24 hash-match at sf0.001 and sf0.01).
Rows-only entries (genuinely non-SQL semantics): the full synthetic-pages
pipeline with soundex blocking and the reference's complete rules-extraction
path, which DuckDB cannot reproduce (stateful refinement, fuzzy gazetteer).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end entity-resolution clusters at sf0.001."""
    from indian_address_parser_spark.queries import q_er_clusters

    return q_er_clusters(spark, "/root/testdata/sf0.001")


def _er_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the real pipeline on the deterministic synthetic pages
    fixture — mapInPandas rules extraction (reference-parity), soundex
    blocking with skew splitting, weighted JW/Lev scoring, star CC."""
    from indian_address_parser_spark.operators.blocking import with_block_key
    from indian_address_parser_spark.operators.cc import attach_clusters, connected_components
    from indian_address_parser_spark.operators.extract import extract_mentions
    from indian_address_parser_spark.operators.pairs import candidate_pairs
    from indian_address_parser_spark.operators.scoring import score_pairs
    from indian_address_parser_spark.sources.pages import generate

    pages = generate(spark, n_households=200)["pages"]
    mentions = extract_mentions(pages)
    edges = score_pairs(candidate_pairs(with_block_key(mentions)))
    clusters = attach_clusters(
        mentions.select("mention_id"), connected_components(edges)
    )
    return clusters.select("mention_id", "cluster_id")


def _er_extract_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: full reference-parity extraction (E1+E2+R1-R8) over the
    synthetic pages fixture, flattened mention fields."""
    from indian_address_parser_spark.operators.extract import extract_mentions
    from indian_address_parser_spark.sources.pages import generate

    pages = generate(spark, n_households=200)["pages"]
    return extract_mentions(pages).select(
        "mention_id", "normalized", "house_no", "street", "locality",
        "city", "state", "pincode",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from indian_address_parser_spark.queries import SPARK_QUERIES

    out = dict(SPARK_QUERIES)
    out["er_pipeline_full"] = _er_pipeline_full
    out["er_extract_mentions"] = _er_extract_mentions
    return out


def oracle_sql() -> dict[str, str]:
    from indian_address_parser_spark.queries import oracle_sqls

    return oracle_sqls()
