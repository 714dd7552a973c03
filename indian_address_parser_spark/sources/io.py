"""Source/sink wrappers (SURVEY.md §2.1).

Covers the reference's data formats on Spark primitives:
- S1/S2: line-delimited address text → DataFrame (``spark.read.text``)
- S3/S6: training-sample JSONL with the fixed gold schema
- S5: parsed-address JSON sink
- S7: CoNLL BIO fixture writer (token\\tlabel lines, blank line between
  samples) — a test-fixture format, written driver-side on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("ner_tags", T.ArrayType(T.StringType())),
    ]
)


def read_address_lines(spark: SparkSession, path: str) -> DataFrame:
    """S1 — one address per line, blanks skipped (cli.py:71-73 semantics)."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("address"))
        .where(F.length("address") > 0)
    )


def address_literals(spark: SparkSession, addresses: list[str]) -> DataFrame:
    """S2 — literal address list."""
    return spark.createDataFrame([(a,) for a in addresses], ["address"])


def read_gold_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3 — training samples with the fixed schema (no inference)."""
    return spark.read.schema(GOLD_SCHEMA).json(path)


def write_gold_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6 — one sample per line."""
    df.select("id", "text", "tokens", "ner_tags").write.mode(mode).json(path)


def write_parsed_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 — parsed mentions as JSON (entities stay nested structs)."""
    df.write.mode(mode).json(path)


def write_conll_bio(samples: list[dict], path: str) -> None:
    """S7 — CoNLL fixture writer (driver-side; fixtures are small)."""
    with open(path, "w") as f:
        for sample in samples:
            for token, tag in zip(sample["tokens"], sample["ner_tags"]):
                f.write(f"{token}\t{tag}\n")
            f.write("\n")


def read_conll_bio(path: str) -> list[dict]:
    """Inverse of write_conll_bio (round-trip tested)."""
    samples: list[dict] = []
    tokens: list[str] = []
    tags: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                if tokens:
                    samples.append(
                        {"text": " ".join(tokens), "tokens": tokens, "ner_tags": tags}
                    )
                    tokens, tags = [], []
                continue
            token, tag = line.split("\t")
            tokens.append(token)
            tags.append(tag)
    if tokens:
        samples.append({"text": " ".join(tokens), "tokens": tokens, "ner_tags": tags})
    return samples
