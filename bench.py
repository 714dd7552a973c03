"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...},
   "cal_mops": {name: mops, ...}, "repeats": N}

The ER pipeline benchmark runs the real pipeline (mapInPandas extraction →
soundex blocking → scored self-join → star CC) over the deterministic
synthetic pages fixture sized to the sf, and reports pages/sec.

Self-evidencing noise attribution (r4 lesson: a contaminated host window
inflated unchanged JVM-only queries up to 3× and the artifact couldn't
defend itself): a single-thread CPU calibration spin runs OUTSIDE the
timed window before every query and lands in ``cal_mops`` — a reading far
below the box's clean ~27-29 Mops marks that query's time as measured
under co-tenant steal, so a regression can be attributed to host noise
(or not) from the JSON alone. ``SPARK_GRAFT_BENCH_REPEATS`` (default 1)
re-runs each query K times and reports the minimum (the least-
contaminated observation); the per-repeat times are kept in
``query_repeats`` when K > 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = (
    "er_normalize",
    "er_extract_fields",
    "er_pair_scores",
    "er_clusters",
    "dedup_minhash128_band_pairs",
    "dedup_minhash128_xxhash_band_pairs",
    "dedup_ngram_jaccard_dfcap",
    "dedup_simhash_pairs",
    "text_token_stats",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_topk_ivf_kmeans",
    "agg_pricing_summary",
    "window_top_order_per_cust",
    "join_regional_revenue",
    "agg_events_windowed",
    "join_asof_events",
    "events_sessionize",
    "set_ops_custkeys",
    "text_tfidf_top_terms",
    "agg_distinct_users",
    "agg_events_sliding",
    "dedup_canonical_keep",
    "corpus_decontaminate",
)


def _consume(df) -> int:
    """Execute fully without collecting rows to the driver."""
    return df.count()


def spin_mops(n: int = 10_000_000) -> float:
    """Single-thread CPU calibration (pure-Python spin): ~27-29 Mops on
    this box when clean; co-tenant steal episodes read 5-25. Runs outside
    every timed window — evidence, not load."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i & 7
    return round(n / (time.perf_counter() - t0) / 1e6, 1)


def warm_python_workers(spark, cores: int) -> None:
    """Touch every Python worker once so imports (pandas/pyarrow/core) happen
    outside the timed window — on a real cluster workers are long-lived, so
    steady-state throughput is the honest number."""
    import pandas as pd
    from pyspark.sql import types as T

    def probe(batches):
        from indian_address_parser_spark.core.parse import parse_address

        for b in batches:
            parse_address("H.NO 1, GALI NO 2, RAJ NAGAR, NEW DELHI 110041")
            yield pd.DataFrame({"n": [len(b)]})

    (
        spark.range(cores * 8)
        .repartition(cores * 8)
        .mapInPandas(probe, T.StructType([T.StructField("n", T.LongType())]))
        .count()
    )


def run_er_pipeline(spark, n_households: int) -> dict:
    from indian_address_parser_spark.operators.blocking import with_block_key
    from indian_address_parser_spark.operators.cc import attach_clusters, connected_components
    from indian_address_parser_spark.operators.extract import extract_mentions
    from indian_address_parser_spark.operators.pairs import candidate_pairs
    from indian_address_parser_spark.operators.scoring import score_pairs
    from indian_address_parser_spark.sources.pages import generate

    from pyspark import StorageLevel

    ser = getattr(StorageLevel, "MEMORY_AND_DISK_SER", StorageLevel.MEMORY_AND_DISK)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages = generate(spark, n_households=n_households)["pages"].select("url", "text")
    # SERIALIZED persists throughout: deserialized memory caching of the
    # multi-GB frames anti-scales with input size (measured at 2.4M pages /
    # 8 cores: extract 260s→191s, block 132s→55s switching pages+mentions
    # to MEMORY_AND_DISK_SER — JVM object/GC pressure, not compute)
    pages = pages.repartition(cpus * 4).persist(ser)
    n_pages = pages.count()  # materialize input outside the timed window
    warm_python_workers(spark, cpus)

    stage_secs: dict[str, float] = {}
    t0 = time.perf_counter()
    # cache the two true fan-out points: mentions (feed blocking AND the
    # final cluster attach) and blocked (the pair self-join consumes it
    # twice — uncached, BOTH join branches would re-run the block-size
    # aggregation+join). scoring + CC stay fused: edges stream straight
    # into the star loop's input checkpoint, no extra materialization.
    from indian_address_parser_spark.operators.pairs import (
        BLOCK_INPUT_COLS,
        PAIR_INPUT_COLS,
    )

    t = time.perf_counter()
    # persist the pruned extract→block projection (BLOCK_INPUT_COLS), not
    # the wide mention payload: raw + the entities span array are ~4× the
    # pruned row and nothing downstream reads them — the wide cache made
    # both this stage's write and the next stage's read disk-bound
    # (measured ~110 s constant at ANY core count at 4.8M pages)
    mentions = extract_mentions(pages).select(*BLOCK_INPUT_COLS).persist(ser)
    mentions.count()
    stage_secs["extract"] = round(time.perf_counter() - t, 1)
    t = time.perf_counter()

    # persist only what the pair self-join reads (see PAIR_INPUT_COLS) —
    # the wide mention payload anti-scales the block stage at 10⁶+ pages
    blocked = with_block_key(mentions).select(*PAIR_INPUT_COLS).persist(ser)
    blocked.count()
    stage_secs["block"] = round(time.perf_counter() - t, 1)
    t = time.perf_counter()
    edges = score_pairs(candidate_pairs(blocked))
    clusters = attach_clusters(mentions.select("mention_id"), connected_components(edges))
    n_clusters = _consume(clusters)
    stage_secs["link"] = round(time.perf_counter() - t, 1)
    secs = time.perf_counter() - t0
    mentions.unpersist()
    blocked.unpersist()
    return {
        "pages": n_pages,
        "clusters": n_clusters,
        "seconds": secs,
        "pages_per_sec": n_pages / secs,
        "stage_secs": stage_secs,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from indian_address_parser_spark.plans.session import get_spark
    from indian_address_parser_spark.queries import SPARK_QUERIES

    # tmpfs scratch is bench-harness-only (ADVICE r4): the library default
    # stays on spark.local.dir's disk default
    spark = get_spark(app_name="bench", prefer_tmpfs_scratch=True)

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
    timings: dict[str, float] = {}
    cal_mops: dict[str, float] = {}
    query_repeats: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        cal_mops[name] = spin_mops()  # outside the timed window
        obs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _consume(SPARK_QUERIES[name](spark, sf_dir))
            obs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(obs)
        if repeats > 1:
            query_repeats[name] = obs

    n_households = {"0.001": 500, "0.01": 5000, "0.1": 50000}.get(sf, 5000)
    cal_mops["er_pipeline_synthetic"] = spin_mops()
    er = run_er_pipeline(spark, n_households)
    timings["er_pipeline_synthetic"] = round(er["seconds"], 3)
    cal_mops["end"] = spin_mops()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "throughput": {
            "er_pages": er["pages"],
            "er_pages_per_sec": round(er["pages_per_sec"], 1),
            "er_clusters": er["clusters"],
        },
        "cal_mops": cal_mops,
        "repeats": repeats,
    }
    if query_repeats:
        out["query_repeats"] = query_repeats
    print(json.dumps(out))


if __name__ == "__main__":
    main()
