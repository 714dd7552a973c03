"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf_dir, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, values stringified with float rounding).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_normalize_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted(cols)), h


def run_check(sf_dir: str, only: list[str] | None = None) -> dict:
    import duckdb

    from indian_address_parser_spark.plans.session import get_spark
    from indian_address_parser_spark.queries import SPARK_QUERIES, oracle_sqls

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = oracle_sqls(sf_dir)
    results = {}
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        sres = frame_digest(scols, srows)
        if name not in oracles:
            results[name] = {"status": "rows_only", "spark": sres}
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ores = frame_digest(ocols, orows)
        ok = sres == ores
        results[name] = {
            "status": "match" if ok else "MISMATCH",
            "spark": sres,
            "oracle": ores,
        }
    return results


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    res = run_check(sf_dir, only)
    bad = 0
    for name, r in res.items():
        print(f"{r['status']:>9}  {name}  spark={r['spark']}" + (f" oracle={r['oracle']}" if "oracle" in r else ""))
        bad += r["status"] == "MISMATCH"
    print(f"\n{len(res)} queries, {bad} mismatches")
    sys.exit(1 if bad else 0)
