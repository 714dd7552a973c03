"""Incremental entity resolution over a page stream (foreachBatch).

The production shape for streaming ER: Structured Streaming's built-in
stateful operators cannot hold an unbounded, *joinable* cluster store, so
the state lives in an external table the micro-batch function reads and
appends to — parquet here, a transactional table (Iceberg/Delta MERGE)
in a real deployment. Per micro-batch:

  1. extract mentions (the SAME mapInPandas operator as batch,
     ``operators/extract.py``) and block them (``operators/blocking.py``)
  2. join the batch's mentions against the persisted cluster
     REPRESENTATIVES on the primary ``block_key`` and score the pairs
     with the SAME two-stage scorer (``operators/scoring.py``); every
     mention whose best representative clears the threshold attaches to
     that cluster (ties: highest score, then lexicographic-min cluster)
  3. the remainder run plain batch ER among themselves (candidate pairs
     → scoring → star CC, ``operators/cc.py``) and mint NEW clusters
  4. one representative row per new cluster (the cluster-min mention —
     deterministic) is appended to the state table; the batch's full
     (mention_id, cluster_id) assignment is appended to the sink

Semantics — stated, not hidden:
  * FIRST-REP-WINS: attachment happens only against representatives that
    existed before the batch; cross-batch transitive merges are not
    performed. This is the standard incremental-ER tradeoff (a periodic
    batch re-run reconciles); within a batch, links among unmatched
    mentions DO merge via CC.
  * Replays: foreachBatch may re-deliver a batch after a failure. Both
    sinks are append-only parquet keyed by ``batch_id``, and the state
    read deduplicates on ``cluster_id`` — a replay cannot fork cluster
    identities (same deterministic ids), only leave harmless duplicate
    rows that the dedup-on-read collapses. With a transactional table
    the MERGE makes this exactly-once.

Scale shape: the attach join is a shuffled equi-join on block_key (reps
grow unbounded — never broadcast them); AQE handles residual skew and
the uninformative-key block ("||") is excluded from BOTH sides exactly
as the batch pair generator excludes it. Everything JVM-side except the
shared extraction and JW Arrow kernels.

Reference parity: the reference has no streaming surface (SURVEY.md §2
S-rows); this composes its extraction semantics with the ER layer the
north rule mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indian_address_parser_spark.operators.blocking import with_block_key
from indian_address_parser_spark.operators.cc import (
    attach_clusters,
    connected_components,
)
from indian_address_parser_spark.operators.extract import extract_mentions
from indian_address_parser_spark.operators.pairs import (
    PAIR_FIELDS,
    candidate_pairs,
)
from indian_address_parser_spark.operators.scoring import (
    DEFAULT_THRESHOLD,
    score_pairs,
)

# One representative row per cluster, carrying everything the scorer
# needs for future attach joins (incl. precomputed digit signatures).
REP_COLS = ("cluster_id", "block_key", *PAIR_FIELDS)


def _read_reps(spark: SparkSession, state_dir: str) -> DataFrame | None:
    try:
        reps = spark.read.parquet(state_dir)
    except Exception:  # first batch: no state written yet
        return None
    # replay tolerance: duplicate appends collapse to one row per cluster
    return reps.dropDuplicates(["cluster_id"])


def _attach_to_reps(
    blocked: DataFrame, reps: DataFrame, threshold: float
) -> DataFrame:
    """→ (mention_id, cluster_id) for mentions matching an existing rep."""
    from pyspark.sql import Window

    informative = F.col("block_key") != "||"
    left = blocked.where(informative).select(
        F.col("mention_id").alias("mention_id_a"),
        "block_key",
        *[F.col(f).alias(f"{f}_a") for f in PAIR_FIELDS],
    )
    right = reps.where(informative).select(
        F.col("cluster_id").alias("mention_id_b"),
        "block_key",
        *[F.col(f).alias(f"{f}_b") for f in PAIR_FIELDS],
    )
    pairs = left.join(right, "block_key")
    edges = score_pairs(pairs, threshold=threshold)
    # best rep per mention; candidates are bounded by block size, so the
    # per-mention window cannot skew
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        edges.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(F.col("src").alias("mention_id"), F.col("dst").alias("cluster_id"))
    )


def process_batch(
    batch_pages: DataFrame,
    batch_id: int,
    state_dir: str,
    assignments_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
) -> None:
    """The foreachBatch body — also callable directly for batch-by-batch
    tests and backfills."""
    spark = batch_pages.sparkSession
    mentions = extract_mentions(batch_pages)
    blocked = with_block_key(mentions)

    reps = _read_reps(spark, state_dir)
    if reps is not None:
        attached = _attach_to_reps(blocked, reps, threshold)
    else:
        attached = None

    if attached is not None:
        remaining = blocked.join(
            attached.select("mention_id"), "mention_id", "left_anti"
        )
    else:
        remaining = blocked

    # intra-batch ER among the unmatched → new clusters (singletons incl.)
    edges = score_pairs(candidate_pairs(remaining), threshold=threshold)
    assign = connected_components(edges, src="src", dst="dst")
    new_clusters = attach_clusters(
        remaining.select("mention_id", "block_key", *PAIR_FIELDS), assign
    )

    new_reps = new_clusters.where(
        F.col("mention_id") == F.col("cluster_id")
    ).select(*REP_COLS)
    new_reps.write.mode("append").parquet(state_dir)

    out = new_clusters.select("mention_id", "cluster_id")
    if attached is not None:
        out = out.unionByName(attached)
    out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
        assignments_dir
    )


def run_incremental_er(
    pages_stream: DataFrame,
    state_dir: str,
    assignments_dir: str,
    checkpoint_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
):
    """Wire the incremental resolver onto a streaming pages frame.

    Returns the started StreamingQuery (caller awaits/stops)."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(batch_df, batch_id, state_dir, assignments_dir, threshold)

    return (
        pages_stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
