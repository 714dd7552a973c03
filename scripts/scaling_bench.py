"""Two-cluster-size scaling evidence (north rule).

Runs the SAME ER pipeline job on the SAME input at two parallelism levels
(local[8] vs local[32] — the sandbox substitute for N vs 4N executors; one
JVM thread ≙ one executor core) and reports throughput at both plus the
scaling efficiency  eff = T_32 / (4 · T_8).

Headline statistic (r4 verdict: best-of-N selection is biased upward, and
3-of-4 repeats under a measured steal episode made the claim fragile):
every arm carries a single-thread CPU calibration (``cal_mops``, clean ≈
27-29 on this box); a repeat SURVIVES only when all four of its arms'
calibrations clear ``SPARK_GRAFT_CAL_FLOOR`` (default 26.0), and the
headline is the MEDIAN of the surviving repeats' within-repeat paired
efficiencies. The loop keeps adding interleaved repeats until at least
``min_surviving`` (default 3) survive (hard cap ``max_repeats``), so the
headline is a statistic over clean measurements, not a selection over
contaminated ones. Discarded repeats stay in the record with their
calibration evidence.

Each level runs in its own subprocess (a JVM cannot change master
mid-session). Results land in BENCH/scaling.json and BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_households] [n_low] [n_high]
       [min_surviving] [max_repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAL_FLOOR = float(os.environ.get("SPARK_GRAFT_CAL_FLOOR", "26.0"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); n_households = int(sys.argv[2])
os.environ["SPARK_GRAFT_CPUS"] = str(cores)

def spin_mops(n=20_000_000):
    # single-thread CPU calibration: detects co-tenant steal episodes that
    # would otherwise masquerade as engine (anti-)scaling
    t0 = time.perf_counter(); x = 0
    for i in range(n): x += i & 7
    return round(n / (time.perf_counter() - t0) / 1e6, 1)

cal_before = spin_mops()
from indian_address_parser_spark.plans.session import get_spark
import bench
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores, prefer_tmpfs_scratch=True)
out = bench.run_er_pipeline(spark, n_households)
out["cores"] = cores
out["cal_mops"] = [cal_before, spin_mops()]
print("RESULT " + json.dumps(out))
"""


def run_level(cores: int, n_households: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_households)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result from cores={cores}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def _survives(lo: dict, hi: dict) -> bool:
    """A repeat is a clean measurement only when every calibration of both
    arms clears the floor — one contaminated arm poisons the ratio."""
    return min(lo["cal_mops"] + hi["cal_mops"]) >= CAL_FLOOR


def main() -> None:
    n_households = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else n_low * 4
    min_surviving = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    max_repeats = int(sys.argv[5]) if len(sys.argv) > 5 else 6
    factor = n_high / n_low
    # interleave the two levels: both arms of a repeat run back-to-back and
    # sample the same host window, so their ratio is like-for-like
    lows, highs = [], []
    while len(lows) < max_repeats:
        lows.append(run_level(n_low, n_households))
        highs.append(run_level(n_high, n_households))
        print(json.dumps({"low": lows[-1], "high": highs[-1]}), flush=True)
        n_ok = sum(1 for lo, hi in zip(lows, highs) if _survives(lo, hi))
        if n_ok >= min_surviving:
            break

    def eff(lo, hi):
        return hi["pages_per_sec"] / (factor * lo["pages_per_sec"])

    repeats_rec = [
        {
            "low_pps": round(lo["pages_per_sec"], 1),
            "high_pps": round(hi["pages_per_sec"], 1),
            "eff": round(eff(lo, hi), 3),
            "low_cal_mops": lo["cal_mops"],
            "high_cal_mops": hi["cal_mops"],
            "survives_cal_filter": _survives(lo, hi),
        }
        for lo, hi in zip(lows, highs)
    ]
    surviving = [r["eff"] for r in repeats_rec if r["survives_cal_filter"]]
    all_effs = [r["eff"] for r in repeats_rec]
    # headline = MEDIAN over calibration-clean repeats (a statistic, not a
    # selection); if the host never went clean, fall back to the median of
    # everything and say so in the artifact
    headline = statistics.median(surviving if surviving else all_effs)
    low = max(lows, key=lambda r: r["pages_per_sec"])
    high = max(highs, key=lambda r: r["pages_per_sec"])
    result = {
        "n_households": n_households,
        "low": low,
        "high": high,
        "core_factor": factor,
        "scaling_efficiency": round(headline, 3),
        "headline_statistic": (
            f"median of {len(surviving)} calibration-clean repeats "
            f"(cal floor {CAL_FLOOR} Mops)"
            if surviving
            else "median of ALL repeats — no repeat cleared the cal floor"
        ),
        "cal_floor_mops": CAL_FLOOR,
        "surviving_effs": surviving,
        "eff_spread": [min(all_effs), max(all_effs)],
        "cross_level_best_of_efficiency": round(eff(low, high), 3),
        "repeats": repeats_rec,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
