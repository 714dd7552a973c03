"""Pairwise precision/recall/F1 of cluster assignments against labeled pairs.

The north-rule metric: labeled pairs are sampled at fixed blocking keys
(FIXTURES.md §4); a pair is predicted positive iff both mentions landed in
the same cluster. Plain joins + one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_scores(assignments: DataFrame, labeled_pairs: DataFrame) -> dict:
    """assignments(mention_id, cluster_id) × labeled_pairs → metrics dict."""
    ca = assignments.select(
        F.col("mention_id").alias("mention_id_a"), F.col("cluster_id").alias("cluster_a")
    )
    cb = assignments.select(
        F.col("mention_id").alias("mention_id_b"), F.col("cluster_id").alias("cluster_b")
    )
    joined = (
        labeled_pairs.join(ca, "mention_id_a", "left")
        .join(cb, "mention_id_b", "left")
        .withColumn(
            "pred",
            F.col("cluster_a").isNotNull()
            & F.col("cluster_b").isNotNull()
            & (F.col("cluster_a") == F.col("cluster_b")),
        )
    )
    row = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("tn"),
    ).collect()[0]
    tp, fp, fn, tn = row["tp"], row["fp"], row["fn"], row["tn"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }
