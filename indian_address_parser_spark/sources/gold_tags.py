"""Gold token-level tagging fixture (reference JSONL schema).

Schema and invariants follow the reference training-sample shape
(``training/convert_data.py:268-281``): ``{id, text, tokens, ner_tags}``
with ``len(tokens) == len(ner_tags)`` and ``text == " ".join(tokens)``
(validated as in ``training/generate_synthetic.py:232-238``). Composition
follows the balanced generator (``training/generate_balanced_data.py:
237-338``): house/plot first, shuffled middle, city/state/pincode last,
comma separators tagged ``O``; ≥ ``min_per_entity`` samples per type.

Seeded ``random.Random`` — deterministic fixture, no external data.
"""

from __future__ import annotations

import random
from collections import Counter

HOUSE_PATTERNS = (
    "H.NO. {num}", "HOUSE NO. {num}", "HNO {num}", "H NO {num}",
    "FLAT NO {num}", "{letter}-{num}", "RZ-{num}", "WZ-{num}/{num2}",
)
PLOT_PATTERNS = ("PLOT NO {num}", "PLT NO {num}", "PLOT {num}", "P.NO. {num}")
KHASRA_PATTERNS = ("KH NO {num}", "KHASRA NO {num}/{num2}", "KH {num}")
FLOOR_OPTIONS = ("GROUND FLOOR", "FIRST FLOOR", "SECOND FLOOR", "THIRD FLOOR", "GF", "FF")
GALI_PATTERNS = ("GALI NO. {num}", "GALI {num}", "LANE NO {num}", "STREET NO {num}")
BLOCK_PATTERNS = ("BLOCK {letter}", "BLK {letter}-{num}", "B-{letter}")
SECTOR_PATTERNS = ("SECTOR {num}", "SEC-{num}", "SEC {num}")
COLONIES = (
    "RAJ NAGAR", "PREM NAGAR", "BUDH VIHAR", "PALAM COLONY", "VIJAY ENCLAVE",
    "DURGA PARK", "SWARN PARK", "FRIENDS COLONY", "DEEP VIHAR",
)
SUBAREAS = (
    "LAJPAT NAGAR", "HAUZ KHAS", "DWARKA", "JANAKPURI", "ROHINI",
    "KAROL BAGH", "SADAR BAZAAR", "MUNDKA",
)
AREAS = ("SOUTH DELHI", "WEST DELHI", "NORTH DELHI", "OUTER DELHI")
PINCODES = tuple(f"1100{i:02d}" for i in range(1, 97))
CITIES = ("DELHI", "NEW DELHI")
STATES = ("DELHI",)

ALL_ENTITIES = (
    "HOUSE_NUMBER", "PLOT", "FLOOR", "BLOCK", "SECTOR", "GALI",
    "COLONY", "SUBAREA", "AREA", "KHASRA", "CITY", "PINCODE", "STATE",
)


def _component(rng: random.Random, label: str) -> str:
    num, num2 = rng.randint(1, 999), rng.randint(1, 99)
    letter = rng.choice("ABCDEFGH")
    table = {
        "HOUSE_NUMBER": HOUSE_PATTERNS,
        "PLOT": PLOT_PATTERNS,
        "KHASRA": KHASRA_PATTERNS,
        "GALI": GALI_PATTERNS,
        "BLOCK": BLOCK_PATTERNS,
        "SECTOR": SECTOR_PATTERNS,
    }
    if label in table:
        return rng.choice(table[label]).format(num=num, num2=num2, letter=letter)
    return rng.choice(
        {
            "FLOOR": FLOOR_OPTIONS, "COLONY": COLONIES, "SUBAREA": SUBAREAS,
            "AREA": AREAS, "PINCODE": PINCODES, "CITY": CITIES, "STATE": STATES,
        }[label]
    )


def _bio(tokens: list[str], label: str) -> list[str]:
    return [f"B-{label}"] + [f"I-{label}"] * (len(tokens) - 1)


def generate_sample(rng: random.Random, sample_id: int, required: set[str]) -> dict:
    parts: list[tuple[str, str]] = []
    use_plot = "PLOT" in required or rng.random() < 0.15
    if use_plot:
        parts.append((_component(rng, "PLOT"), "PLOT"))
    elif "HOUSE_NUMBER" in required or rng.random() < 0.75:
        parts.append((_component(rng, "HOUSE_NUMBER"), "HOUSE_NUMBER"))
    for label, p in (
        ("KHASRA", 0.25), ("FLOOR", 0.45), ("BLOCK", 0.25), ("SECTOR", 0.15),
        ("GALI", 0.40), ("COLONY", 0.50), ("SUBAREA", 0.60), ("AREA", 0.35),
        ("CITY", 0.95), ("STATE", 0.20), ("PINCODE", 0.90),
    ):
        if label in required or rng.random() < p:
            parts.append((_component(rng, label), label))

    # house/plot first, shuffled middle, city/state/pincode last
    if len(parts) > 3:
        first = parts[:1]
        last = [p for p in parts if p[1] in ("CITY", "STATE", "PINCODE")]
        middle = [p for p in parts[1:] if p[1] not in ("CITY", "STATE", "PINCODE")]
        rng.shuffle(middle)
        parts = first + middle + last

    tokens: list[str] = []
    tags: list[str] = []
    for i, (text, label) in enumerate(parts):
        if i > 0:
            tokens.append(",")
            tags.append("O")
        toks = text.split()
        tokens.extend(toks)
        tags.extend(_bio(toks, label))
    return {"id": sample_id, "text": " ".join(tokens), "tokens": tokens, "ner_tags": tags}


def generate_gold_tags(n_samples: int = 150, min_per_entity: int = 20, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    samples: list[dict] = []
    counts: Counter = Counter()
    sample_id = 50000
    for entity in ALL_ENTITIES:
        while counts[entity] < min_per_entity:
            s = generate_sample(rng, sample_id, {entity})
            samples.append(s)
            sample_id += 1
            for tag in s["ner_tags"]:
                if tag.startswith("B-"):
                    counts[tag[2:]] += 1
    while len(samples) < n_samples:
        s = generate_sample(rng, sample_id, set())
        samples.append(s)
        sample_id += 1
        for tag in s["ner_tags"]:
            if tag.startswith("B-"):
                counts[tag[2:]] += 1
    return samples


def validate_sample(sample: dict) -> bool:
    """Reference invariant (generate_synthetic.py:232-238)."""
    return (
        len(sample["tokens"]) == len(sample["ner_tags"])
        and sample["text"] == " ".join(sample["tokens"])
    )


def sample_to_char_spans(sample: dict) -> list[tuple[str, int, int]]:
    """Gold BIO tags → (label, start, end) char spans over sample['text']."""
    spans = []
    pos = 0
    current: list | None = None
    for token, tag in zip(sample["tokens"], sample["ner_tags"]):
        start = sample["text"].index(token, pos)
        end = start + len(token)
        pos = end
        if tag.startswith("B-"):
            if current:
                spans.append(tuple(current))
            current = [tag[2:], start, end]
        elif tag.startswith("I-") and current and current[0] == tag[2:]:
            current[2] = end
        else:
            if current:
                spans.append(tuple(current))
            current = None
    if current:
        spans.append(tuple(current))
    return spans


def entity_f1(gold: list[list[tuple]], pred: list[list[tuple]]) -> dict:
    """Entity-level micro P/R/F1 (seqeval-equivalent on exact span+label)."""
    tp = fp = fn = 0
    for g, p in zip(gold, pred):
        gs, ps = set(g), set(p)
        tp += len(gs & ps)
        fp += len(ps - gs)
        fn += len(gs - ps)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1}
