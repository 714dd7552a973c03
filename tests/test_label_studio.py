"""S4 — Label Studio converter parity (reference training/convert_data.py).

The pure conversion functions are compared against the ACTUAL reference
code (imported via tests/reference_harness.py) over generated annotation
items; the Spark source wraps the same functions in a distributed read.
"""

from __future__ import annotations

import json
import random

import pytest

from indian_address_parser_spark.sources.label_studio import (
    convert_sample,
    read_label_studio,
    simple_tokenize,
)
from reference_harness import load_reference


def _gen_items(n: int = 150) -> list[dict]:
    rng = random.Random(99)
    texts = [
        "H NO 45, GALI NO 4, RAJ NAGAR, NEW DELHI 110045",
        "Plot no 7 Sector 12 Dwarka Delhi - 110075",
        "kh no 3/12, swarn park, mundka, delhi",
        "WZ-118 Uttam Nagar New Delhi",
        "A-12, first floor, Lajpat Nagar (south) Delhi 110024",
    ]
    labels = ["House Number", "house number", "Gali", "gali", "Colony", "Subarea",
              "city", "City", "pincode", "Sector", "Block", "floor", "Plot",
              "khasra", "State", "UNKNOWN_TAG"]
    items = []
    for i in range(n):
        text = rng.choice(texts)
        anns = []
        for _ in range(rng.randint(0, 4)):
            s = rng.randrange(0, max(1, len(text) - 4))
            e = rng.randrange(s + 1, min(len(text), s + 15) + 1)
            anns.append({"start": s, "end": e, "labels": [rng.choice(labels)]})
        items.append({"id": i, "ADDRESS": text, "label": anns})
    # edge items the converter must drop
    items.append({"id": 9001, "ADDRESS": "", "label": [{"start": 0, "end": 1, "labels": ["city"]}]})
    items.append({"id": 9002, "ADDRESS": "NO ANNOTATIONS HERE", "label": []})
    return items


@pytest.fixture(scope="module")
def ref_training():
    load_reference()  # installs the source-transforming finder + stubs
    import importlib.util
    import sys

    # the reference's training package lives beside src/, not inside it
    sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "_ref_convert_data", "/root/reference/training/convert_data.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tokenizer_matches_reference(ref_training):
    for text in [
        "H NO 45, GALI NO 4, RAJ NAGAR",
        "Plot no 7 Sector-12 (Dwarka) Delhi - 110075",
        "  spaced   out . text/with punct ",
        "",
    ]:
        assert simple_tokenize(text) == ref_training.simple_tokenize(text)


def test_conversion_matches_reference(ref_training):
    items = _gen_items()
    ref_samples = ref_training.convert_label_studio_to_bio(items)
    ref_samples = ref_training.add_pincode_labels(ref_samples)
    ref_samples = ref_training.add_city_state_labels(ref_samples)
    ours = [
        s for s in (
            convert_sample(it["id"], it["ADDRESS"], it["label"]) for it in items
        ) if s is not None
    ]
    assert len(ours) == len(ref_samples)
    for mine, ref in zip(ours, ref_samples):
        assert mine.id == ref.id
        assert mine.to_bio() == ref.to_bio(), f"sample {mine.id}"


def test_spark_read_label_studio(spark, tmp_path, ref_training):
    items = _gen_items(60)
    path = str(tmp_path / "export.json")
    with open(path, "w") as f:
        json.dump(items, f)
    df = read_label_studio(spark, path)
    rows = {r["sample_id"]: r for r in df.collect()}
    ref_samples = ref_training.add_city_state_labels(
        ref_training.add_pincode_labels(ref_training.convert_label_studio_to_bio(items))
    )
    assert len(rows) == len(ref_samples)
    for ref in ref_samples:
        got = rows[ref.id]
        toks, tags = ref.to_bio()
        assert list(got["tokens"]) == toks
        assert list(got["ner_tags"]) == tags


def test_spark_read_skips_null_id_or_text_rows(spark, tmp_path):
    """Rows with a missing id or ADDRESS (spark.read.json → null) are
    skipped instead of crashing int(None)."""
    clean = _gen_items(5)
    base_path = str(tmp_path / "export_clean.json")
    with open(base_path, "w") as f:
        json.dump(clean, f)
    base_ids = {r["sample_id"] for r in read_label_studio(spark, base_path).collect()}

    items = clean + [
        {"ADDRESS": "12 mg road pune", "label": []},  # no id
        {"id": 9001, "label": []},  # no ADDRESS
        {"id": 9002, "ADDRESS": None, "label": []},
    ]
    path = str(tmp_path / "export_nulls.json")
    with open(path, "w") as f:
        json.dump(items, f)
    got_ids = {r["sample_id"] for r in read_label_studio(spark, path).collect()}
    assert 9001 not in got_ids and 9002 not in got_ids
    assert got_ids == base_ids
