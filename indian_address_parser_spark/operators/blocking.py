"""Blocking-key derivation + skew handling (north rule).

Primary key: ``pincode | city | soundex(locality)`` — all JVM-side built-ins
(``F.soundex``), whole-stage-codegen friendly, no Python.

Skew strategy (SURVEY.md §4.2): a single mega-block (dominant metro pincode)
creates O(n²) candidate pairs *within* the block no matter how the shuffle is
partitioned — AQE's skew-join splitting fixes partition skew but not the
quadratic blow-up. So blocks larger than ``max_block_size`` get a secondary
key component (soundex of the street + the house-number digit signature),
which is the ER-correct form of "salting": it splits the block along a
feature that true matches share, so recall is preserved while pair counts
drop quadratically. Block-size accounting is computed first (cheap hash agg)
and both the histogram and the estimated pair count are observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# fields whose digit runs carry the address identity (scoring hard features)
DIGIT_FIELDS = ("house_no", "street", "block", "sector", "khasra")


def _soundex_or_empty(col):
    letters = F.regexp_replace(F.coalesce(col, F.lit("")), "[^A-Za-z]", "")
    return F.when(F.length(letters) > 0, F.soundex(letters)).otherwise(F.lit(""))


def with_block_key(mentions: DataFrame, max_block_size: int = 200) -> DataFrame:
    """Attach ``block_key`` (+ secondary split for oversized blocks).

    Returns the input with columns:
      block_key      primary blocking key
      block_size     size of the primary block (for observability)
      join_key       the key candidate generation actually joins on
                     (= block_key, or block_key + secondary for mega-blocks)
    """
    # Blocking favours recall: when refinement swallowed the CITY span
    # (e.g. a locality+city merge in comma-free text), fall back to the
    # city evidence in the normalized text itself. Pure JVM regex.
    block_city = F.coalesce(
        F.col("city"),
        F.when(F.col("normalized").rlike(r"\bNEW DELHI\b"), F.lit("NEW DELHI")),
        F.when(F.col("normalized").rlike(r"\bDELHI\b"), F.lit("DELHI")),
    )
    keyed = mentions.withColumn(
        "block_key",
        F.concat_ws(
            "|",
            F.coalesce(F.col("pincode"), F.lit("")),
            F.coalesce(block_city, F.lit("")),
            _soundex_or_empty(F.col("locality")),
        ),
    )
    # Block sizes via a partial-aggregated count joined back HINT-FREE: AQE
    # broadcasts the size table while it fits (it is |distinct block keys|)
    # and degrades to a skew-split shuffle join when it does not — no
    # driver-OOM cliff like a forced F.broadcast, and no single-task sort
    # like a window count (window partitions are NOT skew-splittable: the
    # dominant-metro mega-block serialized the whole stage when this was a
    # Window.partitionBy count — measured 8× stage regression at 32 cores).
    sizes = keyed.groupBy("block_key").agg(F.count("*").alias("block_size"))
    keyed = keyed.join(sizes, "block_key")

    # digit signatures computed ONCE per mention (used as the secondary
    # blocking component and as scoring hard features — hoisting them out
    # of the pair join halves the per-pair expression work)
    for f in DIGIT_FIELDS:
        keyed = keyed.withColumn(
            f"{f}_digits",
            F.when(
                F.col(f).isNotNull(), F.regexp_replace(F.col(f), "[^0-9/]", "")
            ),
        )

    secondary = F.concat_ws(
        "|",
        _soundex_or_empty(F.col("street")),
        F.coalesce(F.col("house_no_digits"), F.lit("")),
    )
    return keyed.withColumn(
        "join_key",
        F.when(
            F.col("block_size") > F.lit(max_block_size),
            F.concat_ws("||", F.col("block_key"), secondary),
        ).otherwise(F.col("block_key")),
    )


def block_stats(blocked: DataFrame) -> DataFrame:
    """Histogram + pair-count estimate per primary block (observability)."""
    return (
        blocked.groupBy("block_key")
        .agg(F.count("*").alias("n"))
        .withColumn("est_pairs", F.col("n") * (F.col("n") - 1) / 2)
        .orderBy(F.desc("n"))
    )
