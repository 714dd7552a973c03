"""Optimization-round measurement harness (bench.py stays FROZEN).

Runs individual registry queries in isolation with the same consumption
mode as the frozen harness (``df.count()``; ``--noop`` switches to the
noop sink per the optimization guide §1.4), repeats K times, and can dump
``.explain("formatted")`` to plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (count sink)
  python bench_extra.py --noop q1 ...        # noop sink (full materialize)
  python bench_extra.py --explain DIR q1 ... # also dump formatted plans
  python bench_extra.py --repeats 3 q1 ...
  SPARK_GRAFT_EXTRA_CONF='{"k":"v"}' ...     # conf experiments
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    explain_dir = None
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    repeats = 1
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from indian_address_parser_spark.plans.session import get_spark
    from indian_address_parser_spark.queries import SPARK_QUERIES

    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = get_spark(
        app_name="bench_extra", prefer_tmpfs_scratch=True, extra_conf=extra
    )

    out: dict[str, list[float]] = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        obs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            obs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = obs
        print(json.dumps({name: obs}), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
