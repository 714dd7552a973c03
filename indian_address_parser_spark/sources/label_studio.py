"""S4 — Label Studio annotation source → BIO token/label rows.

Parity target: reference ``training/convert_data.py`` —
``simple_tokenize`` (:86-113), ``assign_bio_labels`` (:117-170, including
its quirks: B- restarts after an O gap, partial-overlap majority voting,
the ``prev_label.endswith(label)`` continuation test), and the
``add_pincode_labels`` / ``add_city_state_labels`` post-passes (:202-233).

The reference converts a Label Studio JSON export on one machine; here the
export is read with ``spark.read.json(multiLine)`` (one row per annotated
sample) and converted by an Arrow-batched ``mapInPandas``, so a crawl-scale
annotation dump (tens of millions of weak labels) converts as a narrow
distributed pass.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# reference convert_data.py:16-63 (normalization table, verbatim data —
# note unknown raw labels fall through to "O" and the reference then emits
# literal "B-O"/"I-O" tags; that quirk is reproduced in assign_bio_labels)
LABEL_NORMALIZE = {
    "House Number": "HOUSE_NUMBER",
    "house number": "HOUSE_NUMBER",
    "HOUSE_NUMBER": "HOUSE_NUMBER",
    "Floor": "FLOOR", "floor": "FLOOR", "FLOOR": "FLOOR",
    "Khasra": "KHASRA", "khasra": "KHASRA", "KHASRA": "KHASRA",
    "Area": "AREA", "area": "AREA", "AREA": "AREA",
    "Subarea": "SUBAREA", "subarea": "SUBAREA", "SUBAREA": "SUBAREA",
    "Colony": "COLONY", "colony": "COLONY", "COLONY": "COLONY",
    "Block": "BLOCK", "block": "BLOCK", "BLOCK": "BLOCK",
    "Gali": "GALI", "gali": "GALI", "GALI": "GALI",
    "Sector": "SECTOR", "sector": "SECTOR", "SECTOR": "SECTOR",
    "Plot": "PLOT", "plot": "PLOT", "PLOT": "PLOT",
    "Camp": "CAMP", "camp": "CAMP", "CAMP": "CAMP",
    "Pole": "POLE", "pole": "POLE", "POLE": "POLE",
    "Pincode": "PINCODE", "pincode": "PINCODE", "PINCODE": "PINCODE",
    "City": "CITY", "city": "CITY", "CITY": "CITY",
    "State": "STATE", "state": "STATE", "STATE": "STATE",
}


@dataclass
class _Token:
    text: str
    label: str = "O"
    start: int = 0
    end: int = 0


@dataclass
class AnnotatedSample:
    id: int
    text: str
    tokens: list[_Token] = field(default_factory=list)

    def to_bio(self) -> tuple[list[str], list[str]]:
        return [t.text for t in self.tokens], [t.label for t in self.tokens]


_SPLIT = re.compile(r"(\s+|[,./\-()])")


def simple_tokenize(text: str) -> list[tuple[str, int, int]]:
    """Whitespace + punctuation tokenizer with char offsets
    (convert_data.py:86-113)."""
    tokens = []
    pos = 0
    for part in _SPLIT.split(text):
        if not part:
            continue
        if part.isspace():
            pos += len(part)
            continue
        start, end = pos, pos + len(part)
        if part.strip():
            tokens.append((part, start, end))
        pos = end
    return tokens


def assign_bio_labels(
    text: str, annotations: list[dict], tokens: list[tuple[str, int, int]]
) -> list[_Token]:
    """Char-span annotations → per-token BIO labels (convert_data.py:117-170,
    quirks preserved: first-match over start-sorted annotations; B- when the
    token starts the annotation OR follows an O; majority-vote on partial
    overlap)."""
    labeled: list[_Token] = []
    sorted_anns = sorted(annotations, key=lambda x: x["start"])

    for token_text, token_start, token_end in tokens:
        token = _Token(text=token_text, start=token_start, end=token_end)
        for ann in sorted_anns:
            ann_start, ann_end = ann["start"], ann["end"]
            raw = ann["labels"][0] if ann["labels"] else "O"
            label = LABEL_NORMALIZE.get(raw, "O")
            if token_start >= ann_start and token_end <= ann_end:
                if token_start == ann_start or (labeled and labeled[-1].label == "O"):
                    token.label = f"B-{label}"
                else:
                    prev = labeled[-1].label if labeled else "O"
                    token.label = f"I-{label}" if prev.endswith(label) else f"B-{label}"
                break
            elif token_start < ann_end and token_end > ann_start:
                overlap = min(token_end, ann_end) - max(token_start, ann_start)
                if overlap > (token_end - token_start) / 2:
                    if token_start <= ann_start:
                        token.label = f"B-{label}"
                    else:
                        prev = labeled[-1].label if labeled else "O"
                        token.label = (
                            f"I-{label}" if prev.endswith(label) else f"B-{label}"
                        )
                    break
        labeled.append(token)
    return labeled


_PIN = re.compile(r"\b[1-9]\d{5}\b")
_CITIES = {"DELHI", "NEW DELHI", "NOIDA", "GURGAON", "GURUGRAM", "FARIDABAD", "GHAZIABAD"}
_STATES = {"DELHI", "HARYANA", "UTTAR PRADESH", "UP", "RAJASTHAN"}


def convert_sample(sample_id: int, text: str, annotations: list[dict]) -> AnnotatedSample | None:
    """One Label Studio item → BIO sample, with the reference's pincode and
    city/state post-passes applied (convert_data.py:173-233)."""
    if not text or not annotations:
        return None
    spans = simple_tokenize(text)
    if not spans:
        return None
    tokens = assign_bio_labels(text, annotations, spans)
    upper = text.upper()
    for t in tokens:  # add_pincode_labels (:202-213)
        if t.label == "O" and _PIN.match(t.text):
            t.label = "B-PINCODE"
    for t in tokens:  # add_city_state_labels (:216-233)
        if t.label == "O":
            tu = t.text.upper()
            if tu in _CITIES or (tu == "NEW" and "NEW DELHI" in upper):
                t.label = "B-CITY"
            elif tu in _STATES:
                t.label = "B-STATE"
    return AnnotatedSample(id=sample_id, text=text, tokens=tokens)


BIO_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("ner_tags", T.ArrayType(T.StringType())),
    ]
)


def read_label_studio(spark: SparkSession, path: str) -> DataFrame:
    """Label Studio JSON export (array of {id, ADDRESS, label: [{start, end,
    labels}]}) → DataFrame(sample_id, text, tokens, ner_tags)."""
    raw = spark.read.option("multiLine", "true").json(path)
    cols = ["id", "ADDRESS", "label"]
    missing = [c for c in cols if c not in raw.columns]
    if missing:
        raise ValueError(f"Label Studio export missing fields: {missing}")

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("sample_id", "text", "tokens", "ner_tags")}
            for sid, text, anns in zip(pdf["id"], pdf["ADDRESS"], pdf["label"]):
                # spark.read.json yields null for missing keys — a row
                # without an id or ADDRESS cannot become a sample
                if sid is None or pd.isna(sid) or not isinstance(text, str):
                    continue
                ann_dicts = [
                    {
                        "start": int(a["start"]),
                        "end": int(a["end"]),
                        "labels": list(a["labels"]) if a["labels"] is not None else [],
                    }
                    for a in (anns if anns is not None else [])
                ]
                sample = convert_sample(int(sid), text, ann_dicts)
                if sample is None:
                    continue
                tokens, tags = sample.to_bio()
                out["sample_id"].append(sample.id)
                out["text"].append(sample.text)
                out["tokens"].append(tokens)
                out["ner_tags"].append(tags)
            yield pd.DataFrame(out, columns=list(out)) if out["sample_id"] else pd.DataFrame(
                {k: pd.Series([], dtype=object) for k in out}
            )

    return raw.select(cols).mapInPandas(convert, BIO_SCHEMA)
