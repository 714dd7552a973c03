"""Dump formatted physical plans for the key operators → BENCH/PLANS.md.

Checks the properties the plans must have at scale and records them for
review: column pruning of the binary html column, whole-stage codegen
around scoring, AQE shuffle handling on the pair join, and the absence of
Python evaluation nodes in the JVM-only stages.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from indian_address_parser_spark.operators.blocking import with_block_key
    from indian_address_parser_spark.operators.extract import extract_mentions
    from indian_address_parser_spark.operators.pairs import candidate_pairs
    from indian_address_parser_spark.operators.scoring import score_pairs
    from indian_address_parser_spark.plans.session import get_spark
    from indian_address_parser_spark.sources.pages import generate

    spark = get_spark(app_name="explain", master="local[8]", shuffle_partitions=8)
    tmp = "/tmp/explain_pages"
    generate(spark, n_households=500)["pages"].write.mode("overwrite").parquet(tmp)
    pages = spark.read.parquet(tmp)

    mentions = extract_mentions(pages)
    blocked = with_block_key(mentions)
    edges = score_pairs(candidate_pairs(blocked))

    sections = []
    checks = []

    def capture(title, df, must_contain=(), must_not=()):
        df.count()  # execute so AQE finalizes the adaptive plan (with codegen ids)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        sections.append(f"## {title}\n\n```\n{plan}\n```\n")
        for needle in must_contain:
            checks.append((title, f"contains {needle!r}", needle in plan))
        for needle in must_not:
            checks.append((title, f"does NOT contain {needle!r}", needle not in plan))
        return plan

    capture(
        "extract_mentions (pages parquet → mentions)",
        mentions,
        must_contain=("ReadSchema: struct<url:string,text:string>",),
        must_not=("html",),
    )
    capture(
        "blocking + candidate self-join + scoring (edges)",
        edges,
        # AQE's finalized plan omits codegen annotations in explainString;
        # assert the join strategy + adaptivity instead (codegen spans are
        # visible in the non-adaptive extract section above).
        # Two-stage scoring contract: the Jaro-Winkler Arrow kernel runs
        # ABOVE a round-robin exchange of the pruned narrow projection —
        # the join stage itself stays all-JVM, and row-at-a-time Python
        # (BatchEvalPython) appears nowhere.
        must_contain=("Join Inner", "AdaptiveSparkPlan", "RoundRobinPartitioning",
                      "ArrowEvalPython"),
        must_not=("BatchEvalPython",),
    )

    # JVM-only contract when no JW field is configured: zero Python nodes
    from indian_address_parser_spark.operators import scoring as scoring_mod

    orig = scoring_mod.FIELD_WEIGHTS
    scoring_mod.FIELD_WEIGHTS = tuple((f, w, g, False) for f, w, g, _ in orig)
    try:
        capture(
            "scoring with Levenshtein-only field table (JVM-only contract)",
            score_pairs(candidate_pairs(blocked)),
            must_contain=("Join Inner", "AdaptiveSparkPlan"),
            must_not=("ArrowEvalPython", "BatchEvalPython", "RoundRobinPartitioning"),
        )
    finally:
        scoring_mod.FIELD_WEIGHTS = orig

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write("# Physical plans of the core operators\n\n")
        f.write("Checks:\n\n")
        for title, what, ok in checks:
            f.write(f"- [{'x' if ok else ' '}] {title}: {what}\n")
        f.write("\n")
        f.writelines(sections)

    bad = [c for c in checks if not c[2]]
    for title, what, ok in checks:
        print(("PASS" if ok else "FAIL"), title, "—", what)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
