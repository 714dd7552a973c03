"""Pairwise similarity scoring (vectorized, JVM-first).

Weighted null-aware combination over the tagged fields (north star:
"vectorized Jaro-Winkler/Levenshtein similarity over tagged fields
(house_no, street, locality, city, state, pincode)").

Design:
- Levenshtein similarity (``F.levenshtein`` — JVM built-in, codegen) for
  locality/city/state; Jaro-Winkler (Arrow pandas UDF, DuckDB-parity) for
  house/street where prefix weighting helps.
- Digit-bearing fields (house_no, street, sector, block, khasra) carry the
  address identity in their digits: if the digit signatures differ the
  field's similarity is 0 regardless of string closeness ("HOUSE NO 45" vs
  "HOUSE NO 46" must NOT score 0.95).
- Null-aware: a field contributes only when both sides are non-null; the
  score renormalizes over the present weights. All of this is plain column
  arithmetic — one narrow stage after the pair join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from indian_address_parser_spark.functions.udfs import jaro_winkler_udf

# (field, weight, digit_guarded, use_jw)
# Jaro-Winkler (prefix-weighted, the north star's named similarity) runs on
# house_no/street — but only AFTER the JVM digit-signature prune below has
# dropped the overwhelmingly-cross-household bulk of each block: the Arrow
# JW kernel (numpy position-loop, fuzzy.jaro_winkler_batch) then sees a tiny
# survivor set. Running a Python UDF on the UNPRUNED pair stream measurably
# anti-scaled (32 Python workers contending with the join's JVM threads ran
# 3-10× slower than 8 — see BENCH/BASELINE.md); post-prune it is noise.
# Levenshtein (F.levenshtein, whole-stage codegen) covers the wide fields.
FIELD_WEIGHTS = (
    ("house_no", 0.30, True, True),
    ("street", 0.15, True, True),
    ("locality", 0.25, False, False),
    ("city", 0.10, False, False),
    ("state", 0.03, False, False),
    ("pincode", 0.12, False, False),
    ("block", 0.05, True, False),
    ("sector", 0.05, True, False),
    ("khasra", 0.05, True, False),
)

DEFAULT_THRESHOLD = 0.80


def _lev_sim(a: Column, b: Column) -> Column:
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / ml.cast("double")
    )


def field_similarity(field: str, digit_guarded: bool, use_jw: bool) -> Column:
    a, b = F.col(f"{field}_a"), F.col(f"{field}_b")
    base = jaro_winkler_udf(a, b) if use_jw else _lev_sim(a, b)
    if digit_guarded:
        # digit signatures were precomputed per mention in blocking
        base = F.when(
            F.col(f"{field}_digits_a") == F.col(f"{field}_digits_b"), base
        ).otherwise(F.lit(0.0))
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(base)


_W_TOTAL = sum(w for _, w, _, _ in FIELD_WEIGHTS)
_W_HOUSE = dict((f, w) for f, w, _, _ in FIELD_WEIGHTS)["house_no"]
# Max achievable score when both house digit-signatures are present but
# differ: the house term is 0 and the bound is maximized with every other
# field present and perfect.
_HOUSE_MISMATCH_CEILING = (_W_TOTAL - _W_HOUSE) / _W_TOTAL


def score_pairs(pairs: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """→ edges(src, dst, score) for pairs scoring ≥ threshold."""
    if threshold > _HOUSE_MISMATCH_CEILING:
        # Exact JVM-side prune: a pair whose house digit-signatures are both
        # present and unequal can never reach the threshold, so drop it
        # before the (Python) Jaro-Winkler UDF ever runs. This is the main
        # cost lever — within a block most pairs are cross-household and die
        # here inside whole-stage codegen.
        pairs = pairs.where(
            F.col("house_no_a").isNull()
            | F.col("house_no_b").isNull()
            | (F.col("house_no_digits_a") == F.col("house_no_digits_b"))
        )
    sim_cols = []
    weight_cols = []
    for field, weight, guarded, use_jw in FIELD_WEIGHTS:
        sim = field_similarity(field, guarded, use_jw)
        sim_cols.append(F.coalesce(sim * F.lit(weight), F.lit(0.0)))
        weight_cols.append(
            F.when(
                F.col(f"{field}_a").isNotNull() & F.col(f"{field}_b").isNotNull(),
                F.lit(weight),
            ).otherwise(F.lit(0.0))
        )

    total_sim = sum(sim_cols[1:], sim_cols[0])
    total_weight = sum(weight_cols[1:], weight_cols[0])

    scored = pairs.withColumn(
        "score",
        F.when(total_weight > 0, total_sim / total_weight).otherwise(F.lit(0.0)),
    )
    return scored.where(F.col("score") >= F.lit(threshold)).select(
        F.col("mention_id_a").alias("src"),
        F.col("mention_id_b").alias("dst"),
        F.round("score", 6).alias("score"),
    )
