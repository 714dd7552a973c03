"""Rules-only entity extraction (E2) and BIO-span decoding (E7/E8).

Parity target: reference ``src/address_parser/pipeline.py:272-439`` (rules
extractor) and ``:441-508`` (prediction decoding). Match semantics that are
contractual and easy to get wrong:

- the 32-entry known-localities scan appends only the FIRST occurrence of
  each locality (``str.find``, pipeline.py:290-299);
- house-number patterns are tried in order and the FIRST match wins with a
  ``break`` (pipeline.py:330-340);
- floor/gali/block/sector/khasra are single first-match searches;
- PINCODE uses the Delhi-prefixed ``\\b1[1][0]\\d{3}\\b`` with confidence 1.0;
- CITY prefers ``NEW DELHI``; otherwise the LAST ``\\bDELHI\\b`` occurrence
  (pipeline.py:414-437).

Entity append order is contractual too: the refiner's overlap removal sorts
by (-confidence, start) with a stable sort, so insertion order is a tie-break.
"""

from __future__ import annotations

import re

from indian_address_parser_spark.core.schemas import ID2LABEL, Span

# First-occurrence-only locality scan (pipeline.py:279-288) — note this is a
# *different, shorter* list than the refiner's KNOWN_LOCALITIES.
EXTRACTOR_LOCALITIES: tuple[str, ...] = (
    "LAJPAT NAGAR", "MALVIYA NAGAR", "HAUZ KHAS", "GREEN PARK",
    "GREATER KAILASH", "DEFENCE COLONY", "SOUTH EXTENSION", "KALKAJI",
    "CIVIL LINES", "MODEL TOWN", "MUKHERJEE NAGAR", "KAMLA NAGAR",
    "PREET VIHAR", "MAYUR VIHAR", "LAKSHMI NAGAR", "GANDHI NAGAR",
    "JANAKPURI", "DWARKA", "UTTAM NAGAR", "TILAK NAGAR", "RAJOURI GARDEN",
    "PUNJABI BAGH", "PASCHIM VIHAR", "KAROL BAGH", "CONNAUGHT PLACE",
    "KAUNWAR SINGH NAGAR", "PALAM COLONY", "RAJ NAGAR", "SADH NAGAR",
    "VIJAY ENCLAVE", "DURGA PARK", "SWARN PARK", "CHANCHAL PARK",
)

_AREA_PATTERNS: tuple[tuple[re.Pattern, str], ...] = tuple(
    (re.compile(pat), name)
    for pat, name in (
        (r'\bSOUTH\s+DELHI\b', "SOUTH DELHI"),
        (r'\bNORTH\s+DELHI\b', "NORTH DELHI"),
        (r'\bEAST\s+DELHI\b', "EAST DELHI"),
        (r'\bWEST\s+DELHI\b', "WEST DELHI"),
        (r'\bCENTRAL\s+DELHI\b', "CENTRAL DELHI"),
        (r'\bOUTER\s+DELHI\b', "OUTER DELHI"),
    )
)

_HOUSE_PATTERNS: tuple[re.Pattern, ...] = tuple(
    re.compile(pat)
    for pat in (
        r'\b(?:FLAT\s*NO\.?\s*)[A-Z]?[-]?\d+[A-Z]?(?:[-/]\d+)*\b',
        r'\b(?:PLOT\s*NO\.?)\s*[A-Z]?\d+[A-Z]?(?:[-/]\d+)*\b',
        r'\b(?:H\.?\s*NO\.?|HOUSE\s*NO\.?|HNO)\s*[A-Z]?\d+[A-Z]?(?:[-/]\d+)*\b',
        r'\b[RW]Z[-\s]?[A-Z]?[-/]?\d+[A-Z]?(?:[-/]\d+)*\b',
    )
)

_FLOOR = re.compile(
    r'\b(?:GROUND|FIRST|SECOND|THIRD|FOURTH|1ST|2ND|3RD|4TH|GF|FF|SF|TF)\s*(?:FLOOR|FLR)?\b'
)
_GALI = re.compile(r'\b(?:GALI|GALLI|LANE)\s*(?:NO\.?)?\s*\d+[A-Z]?\b')
_BLOCK = re.compile(r'\b(?:BLOCK|BLK|BL)\s*[A-Z]?[-]?[A-Z0-9]+\b')
_SECTOR = re.compile(r'\b(?:SECTOR|SEC)\s*\d+[A-Z]?\b')
_KHASRA = re.compile(r'\b(?:KH\.?\s*(?:NO\.?)?\s*|KHASRA\s*(?:NO\.?)?\s*)[\d/]+(?:[/-]\d+)*\b')
_DELHI_PIN = re.compile(r'\b1[1][0]\d{3}\b')
_NEW_DELHI = re.compile(r'\bNEW\s+DELHI\b')
_DELHI_WORD = re.compile(r'\bDELHI\b')


def extract_rules_only(text: str) -> list[Span]:
    """E2 — deterministic span extraction over normalized text."""
    spans: list[Span] = []
    upper = text.upper()

    for locality in EXTRACTOR_LOCALITIES:
        pos = upper.find(locality)
        if pos >= 0:
            end = pos + len(locality)
            spans.append(Span.make("SUBAREA", text[pos:end], pos, end, 0.95))

    for pattern, area_name in _AREA_PATTERNS:
        m = pattern.search(upper)
        if m:
            spans.append(Span.make("AREA", area_name, m.start(), m.end(), 0.95))

    for pattern in _HOUSE_PATTERNS:
        m = pattern.search(upper)
        if m:
            spans.append(
                Span.make("HOUSE_NUMBER", text[m.start():m.end()], m.start(), m.end(), 0.90)
            )
            break  # first pattern that fires wins

    m = _FLOOR.search(upper)
    if m:
        spans.append(Span.make("FLOOR", text[m.start():m.end()], m.start(), m.end(), 0.90))

    m = _GALI.search(upper)
    if m:
        spans.append(Span.make("GALI", text[m.start():m.end()], m.start(), m.end(), 0.90))

    m = _BLOCK.search(upper)
    if m:
        spans.append(Span.make("BLOCK", text[m.start():m.end()], m.start(), m.end(), 0.90))

    m = _SECTOR.search(upper)
    if m:
        spans.append(Span.make("SECTOR", text[m.start():m.end()], m.start(), m.end(), 0.90))

    m = _KHASRA.search(upper)
    if m:
        spans.append(Span.make("KHASRA", text[m.start():m.end()], m.start(), m.end(), 0.90))

    m = _DELHI_PIN.search(text)
    if m:
        spans.append(Span.make("PINCODE", m.group(0), m.start(), m.end(), 1.0))

    if "DELHI" in upper:
        nd = _NEW_DELHI.search(upper)
        if nd:
            spans.append(Span.make("CITY", "NEW DELHI", nd.start(), nd.end(), 0.95))
        else:
            positions = [m.start() for m in _DELHI_WORD.finditer(upper)]
            if positions:
                pos = positions[-1]  # last occurrence is the city mention
                spans.append(Span.make("CITY", "DELHI", pos, pos + 5, 0.90))

    return spans


def bio_decode(
    text: str,
    predictions: list[int],
    offset_mapping: list[tuple[int, int]],
    attention_mask: list[int],
) -> list[Span]:
    """E7 — BIO tag sequence + char offsets → spans.

    Rules (pipeline.py:441-496): skip padding / (0,0) special tokens; ``B-``
    opens at confidence 0.9; same-type ``I-`` extends; orphan ``I-`` opens at
    0.85; ``O`` or sequence end flushes.
    """
    spans: list[Span] = []
    current: dict | None = None

    for pred, offset, mask in zip(predictions, offset_mapping, attention_mask):
        if mask == 0 or tuple(offset) == (0, 0):
            continue
        label = ID2LABEL.get(pred, "O")
        start, end = offset

        if label == "O":
            if current:
                spans.append(_finalize(current, text))
                current = None
        elif label.startswith("B-"):
            if current:
                spans.append(_finalize(current, text))
            current = {"label": label[2:], "start": start, "end": end, "confidence": 0.9}
        elif label.startswith("I-"):
            kind = label[2:]
            if current and current["label"] == kind:
                current["end"] = end
            else:
                if current:
                    spans.append(_finalize(current, text))
                current = {"label": kind, "start": start, "end": end, "confidence": 0.85}

    if current:
        spans.append(_finalize(current, text))
    return spans


def _finalize(state: dict, text: str) -> Span:
    """E8 — slice, strip, build span."""
    return Span.make(
        state["label"],
        text[state["start"]:state["end"]],
        state["start"],
        state["end"],
        state["confidence"],
    )
