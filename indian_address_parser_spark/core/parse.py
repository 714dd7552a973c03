"""End-to-end per-address parse (preprocess → extract → refine) + flattening.

Parity target: reference ``src/address_parser/pipeline.py:135-166`` (parse)
and ``:224-231`` (_preprocess), in rules-only mode, plus the 12 computed
accessors of ``ParsedAddress`` (``schemas.py:86-151``) flattened into plain
columns for the ER pipeline.
"""

from __future__ import annotations

from indian_address_parser_spark.core import normalizer, refine, translit
from indian_address_parser_spark.core.extractor import extract_rules_only
from indian_address_parser_spark.core.schemas import Span


def preprocess(text: str) -> str:
    """E1 — Devanagari gate → mixed-script normalize → text normalize."""
    if translit.contains_devanagari(text):
        text = translit.normalize_mixed_script(text)
    return normalizer.normalize(text)


def parse_address(raw: str, use_gazetteer: bool = True) -> tuple[str, list[Span]]:
    """Rules-only parse. Returns (normalized_text, refined_spans).

    Blank/empty input short-circuits to ("", []) — pipeline.py:145-150.
    """
    if not raw or not raw.strip():
        return "", []
    normalized = preprocess(raw)
    spans = extract_rules_only(normalized)
    spans = refine.refine(normalized, spans, use_gazetteer=use_gazetteer)
    return normalized, spans


def _first(spans: list[Span], *labels: str) -> str | None:
    """First-match accessor semantics (schemas.py:86-91)."""
    for sp in spans:
        if sp.label in labels:
            return sp.value
    return None


def flatten_fields(spans: list[Span]) -> dict[str, str | None]:
    """The 12 reference accessors + the ER field mapping.

    ER mapping (SURVEY.md §1.3): ``street`` ≙ GALI (lane/street share one
    pattern), ``locality`` ≙ SUBAREA → COLONY → AREA priority,
    ``house_no`` aliases HOUSE_NUMBER and PLOT (schemas.py:93-96).
    """
    subarea = _first(spans, "SUBAREA")
    colony = _first(spans, "COLONY")
    area = _first(spans, "AREA")
    return {
        "house_no": _first(spans, "HOUSE_NUMBER", "PLOT"),
        "floor": _first(spans, "FLOOR"),
        "block": _first(spans, "BLOCK"),
        "gali": _first(spans, "GALI"),
        "colony": colony,
        "area": area,
        "subarea": subarea,
        "sector": _first(spans, "SECTOR"),
        "khasra": _first(spans, "KHASRA"),
        "pincode": _first(spans, "PINCODE"),
        "city": _first(spans, "CITY"),
        "state": _first(spans, "STATE"),
        "street": _first(spans, "GALI"),
        "locality": subarea if subarea is not None else (colony if colony is not None else area),
    }
