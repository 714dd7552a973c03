"""Rule-based span refinement (R1-R8).

Parity target: reference ``src/address_parser/postprocessing/rules.py``.
The eight stages run in a fixed order (rules.py:163-204) and several of
their quirks are contractual — reproduced deliberately, not cleaned up:

- ``correct_boundaries`` re-searches the FIRST pattern match in the whole
  text for KHASRA/BLOCK/FLOOR and moves the span there. The FLOOR pattern
  is fully optional, so ``re.search`` yields an empty match at position 0
  on most texts; via the ``updates.get("value") or entity.value`` fallback
  the entity then keeps its value but is re-anchored to span (0, 0)
  (rules.py:482-518).
- overlap removal sorts by (-confidence, start) with a STABLE sort, so
  original insertion order breaks ties; CITY/PINCODE/STATE bypass overlap
  removal entirely (rules.py:553-589).
- ``_add_pattern_entities`` computes ``existing_spans``/``existing_labels``
  from the *input* list but checks overlap against the *growing* result
  (rules.py:361-480).
"""

from __future__ import annotations

import re

from indian_address_parser_spark.core import gazetteer
from indian_address_parser_spark.core.schemas import Span

PATTERNS: dict[str, re.Pattern] = {
    "PINCODE": re.compile(r'\b[1-9]\d{5}\b'),
    "KHASRA": re.compile(
        r'\b(?:KH\.?\s*(?:NO\.?)?\s*|KHASRA\s*(?:NO\.?)?\s*)[\d/]+(?:[/-]\d+)*\b',
        re.IGNORECASE,
    ),
    "PLOT": re.compile(
        r'\b(?:PLOT|PLT|P\.?)(?:\s*NO\.?|\s*#)?\s*[A-Z]?\d+[A-Z]?(?:[-/]\d+)*\b',
        re.IGNORECASE,
    ),
    "HOUSE_NUMBER": re.compile(
        r'\b(?:H\.?\s*(?:NO\.?)?\s*|HOUSE\s*(?:NO\.?)?\s*|HNO\s*|FLAT\s*(?:NO\.?)?\s*)?[A-Z]?\d+[A-Z]?(?:[-/]\d+)*\b',
        re.IGNORECASE,
    ),
    "FLOOR": re.compile(
        r'\b(?:GROUND|FIRST|SECOND|THIRD|FOURTH|FIFTH|1ST|2ND|3RD|4TH|5TH|GF|FF|SF|TF|G/F|F/F|S/F|BASEMENT|LOWER\s+GROUND|UPPER\s+GROUND)?\s*(?:FLOOR|FLR)?\b',
        re.IGNORECASE,
    ),
    "BLOCK": re.compile(r'\b(?:BLOCK|BLK|BL|B)[-\s]?[A-Z]?[-]?[A-Z0-9]+\b', re.IGNORECASE),
    "SECTOR": re.compile(r'\b(?:SECTOR|SEC)[-\s]?\d+[A-Z]?\b', re.IGNORECASE),
    "GALI": re.compile(
        r'\b(?:GALI|GALLI|LANE|STREET|ST\.|G\.?\s*NO\.?)\s*(?:NO\.?)?\s*\d+[A-Z]?\b',
        re.IGNORECASE,
    ),
    "COLONY": re.compile(
        r'\b[A-Z][A-Z\s]+(?:NAGAR|VIHAR|COLONY|ENCLAVE|PARK|GARDEN|PURI|BAGH|KUNJ|EXTENSION|EXTN|PHASE)\b',
        re.IGNORECASE,
    ),
}

AREA_PATTERNS: tuple[tuple[re.Pattern, str], ...] = tuple(
    (re.compile(pat, re.IGNORECASE), name)
    for pat, name in (
        (r'\bSOUTH\s+DELHI\b', "SOUTH DELHI"),
        (r'\bNORTH\s+DELHI\b', "NORTH DELHI"),
        (r'\bEAST\s+DELHI\b', "EAST DELHI"),
        (r'\bWEST\s+DELHI\b', "WEST DELHI"),
        (r'\bCENTRAL\s+DELHI\b', "CENTRAL DELHI"),
        (r'\bSOUTH\s+WEST\s+DELHI\b', "SOUTH WEST DELHI"),
        (r'\bNORTH\s+WEST\s+DELHI\b', "NORTH WEST DELHI"),
        (r'\bNORTH\s+EAST\s+DELHI\b', "NORTH EAST DELHI"),
        (r'\bSOUTH\s+EAST\s+DELHI\b', "SOUTH EAST DELHI"),
        (r'\bOUTER\s+DELHI\b', "OUTER DELHI"),
    )
)

CITY_PATTERNS: tuple[tuple[re.Pattern, str], ...] = tuple(
    (re.compile(pat, re.IGNORECASE), name)
    for pat, name in (
        (r'\bNEW\s+DELHI\b', "NEW DELHI"),
        (r'\bDELHI\b', "DELHI"),
        (r'\bNOIDA\b', "NOIDA"),
        (r'\bGURUGRAM\b', "GURUGRAM"),
        (r'\bGURGAON\b', "GURGAON"),
        (r'\bFARIDABAD\b', "FARIDABAD"),
        (r'\bGHAZIABAD\b', "GHAZIABAD"),
    )
)

# NB: the U.P. pattern intentionally has no IGNORECASE (rules.py:91).
STATE_PATTERNS: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r'\bDELHI\b', re.IGNORECASE), "DELHI"),
    (re.compile(r'\bHARYANA\b', re.IGNORECASE), "HARYANA"),
    (re.compile(r'\bUTTAR\s+PRADESH\b', re.IGNORECASE), "UTTAR PRADESH"),
    (re.compile(r'\bU\.?\s*P\.?\b'), "UTTAR PRADESH"),
)

COLONY_SUFFIXES: tuple[str, ...] = (
    "NAGAR", "VIHAR", "COLONY", "ENCLAVE", "PARK", "GARDEN",
    "PURI", "BAGH", "KUNJ", "EXTENSION", "EXTN", "PHASE",
)

KNOWN_LOCALITIES: tuple[str, ...] = (
    # South Delhi
    "LAJPAT NAGAR", "MALVIYA NAGAR", "HAUZ KHAS", "GREEN PARK",
    "GREATER KAILASH", "DEFENCE COLONY", "SOUTH EXTENSION", "KALKAJI",
    "NEHRU PLACE", "OKHLA", "JASOLA", "SARITA VIHAR", "VASANT KUNJ",
    "CHITTARANJAN PARK", "SANGAM VIHAR", "GOVINDPURI", "LADO SARAI",
    "DERA MANDI", "SATBARI", "CHATTARPUR", "MEHRAULI", "SAKET",
    # North Delhi
    "CIVIL LINES", "MODEL TOWN", "MUKHERJEE NAGAR", "KAMLA NAGAR",
    "ASHOK VIHAR", "SHALIMAR BAGH", "PITAMPURA", "ROHINI",
    # East Delhi
    "PREET VIHAR", "MAYUR VIHAR", "PATPARGANJ", "LAKSHMI NAGAR",
    "GANDHI NAGAR", "DILSHAD GARDEN", "ANAND VIHAR", "SHAHDARA",
    # West Delhi
    "JANAKPURI", "DWARKA", "PALAM", "UTTAM NAGAR", "VIKASPURI",
    "TILAK NAGAR", "RAJOURI GARDEN", "PUNJABI BAGH", "PASCHIM VIHAR",
    "MUNDKA", "NANGLOI", "NAJAFGARH", "TIKRI KALAN", "NILOTHI",
    # Central Delhi
    "CONNAUGHT PLACE", "KAROL BAGH", "PAHARGANJ", "DARYAGANJ",
    "RAJENDER NAGAR", "PATEL NAGAR", "KIRTI NAGAR", "LODHI ROAD",
    "GOLF LINKS", "CHANDNI CHOWK", "SADAR BAZAAR", "KASHMERE GATE",
    # Colonies (with -NAGAR suffix)
    "RAJ NAGAR", "PREM NAGAR", "SHIV NAGAR", "HARI NAGAR", "KRISHNA NAGAR",
    "GANESH NAGAR", "RAM NAGAR", "VIJAY NAGAR", "JAI NAGAR", "SADH NAGAR",
    "KAUNWAR SINGH NAGAR", "BALJIT NAGAR", "PANDAV NAGAR", "SUNDER NAGAR",
    "SANT NAGAR", "DEV NAGAR", "GURU NAGAR", "MOHAN NAGAR", "INDRA NAGAR",
    "AMBEDKAR NAGAR",
    # Colonies (with -VIHAR suffix)
    "BUDH VIHAR", "AMBICA VIHAR", "NIRMAN VIHAR", "LOK VIHAR",
    "JANATA VIHAR", "PUSHP VIHAR", "DEEP VIHAR", "RAJ VIHAR",
    # Colonies (with -COLONY suffix)
    "PALAM COLONY", "FRIENDS COLONY", "NEW FRIENDS COLONY",
    "BABA HARI DAS COLONY", "TAGORE GARDEN COLONY", "MOTI BAGH COLONY",
    "GULABI BAGH COLONY", "SHADIPUR COLONY", "PANCHSHEEL COLONY",
    "GOLF LINKS COLONY", "JANGPURA EXTENSION COLONY", "LODHI COLONY",
    # Colonies (with -ENCLAVE suffix)
    "VIJAY ENCLAVE", "PANCHSHEEL ENCLAVE", "SAINIK ENCLAVE",
    "SHALIMAR ENCLAVE", "MALVIYA ENCLAVE", "GREATER KAILASH ENCLAVE",
    "NEHRU ENCLAVE", "CHITTARANJAN ENCLAVE", "SAKET ENCLAVE",
    # Colonies (with -PARK suffix)
    "DURGA PARK", "SWARN PARK", "CHANCHAL PARK", "DEER PARK",
    "KRISHNA PARK", "SHANTI PARK", "RAJOURI PARK", "TILAK PARK",
    "SUBHASH PARK", "NEHRU PARK", "INDIRA PARK",
    # Colonies (with -BAGH suffix)
    "GULABI BAGH", "KIRTI BAGH", "ASHOK BAGH", "PREM BAGH",
    # Colonies (with -PURI suffix)
    "KHIRKI PURI", "MADANGIR PURI", "SANGAM PURI", "SHIV PURI",
    "RAM PURI", "HARI PURI", "GANESH PURI",
    # Extensions
    "JANGPURA EXTENSION", "LAJPAT NAGAR EXTENSION",
    "SAFDARJUNG EXTENSION", "GREATER KAILASH EXTENSION", "KALKAJI EXTENSION",
)

_AREA_NAMES_FOR_COLONY_VETO = (
    "SOUTH DELHI", "NORTH DELHI", "EAST DELHI", "WEST DELHI",
    "CENTRAL DELHI", "OUTER DELHI",
)

_PLOT_PREFIX = re.compile(r'(?:PLOT|PLT|P\.)', re.IGNORECASE)
_DELHI_WORD = re.compile(r'\bDELHI\b')
_PIN_FULL = re.compile(r'[1-9]\d{5}')

_LOCALITY_FAMILY = ("AREA", "SUBAREA", "COLONY", "CITY")
_PRESERVED = ("CITY", "PINCODE", "STATE")


def _overlapping(a_start: int, a_end: int, b_start: int, b_end: int) -> bool:
    return not (a_end <= b_start or a_start >= b_end)


def refine(text: str, spans: list[Span], use_gazetteer: bool = True) -> list[Span]:
    """Run the 8-stage refinement chain in reference order."""
    out = list(spans)
    out = fix_known_localities(text, out)
    out = add_pattern_entities(text, out)
    # stage 3 (_add_area_patterns) is a no-op in the reference — folded into stage 1
    out = correct_boundaries(text, out)
    out = merge_fragmented(text, out, use_gazetteer)
    out = adjust_confidence(text, out, use_gazetteer)
    out = remove_overlaps(out)
    out = validate(out, use_gazetteer)
    return out


def fix_known_localities(text: str, spans: list[Span]) -> list[Span]:
    """R1 — find ALL occurrences of each known locality (left-to-right
    repeated find), overlay non-overlapping directional AREA patterns, drop
    input spans of the locality family that overlap any found range."""
    upper = text.upper()
    found: list[Span] = []
    used: list[tuple[int, int]] = []

    for locality in KNOWN_LOCALITIES:
        idx = 0
        while True:
            pos = upper.find(locality, idx)
            if pos == -1:
                break
            end = pos + len(locality)
            found.append(Span.make("SUBAREA", text[pos:end], pos, end, 0.95))
            used.append((pos, end))
            idx = end

    for pattern, area_name in AREA_PATTERNS:
        m = pattern.search(text)
        if m:
            s, e = m.start(), m.end()
            if not any(_overlapping(s, e, us, ue) for us, ue in used):
                found.append(Span.make("AREA", area_name, s, e, 0.95))
                used.append((s, e))

    result: list[Span] = []
    for sp in spans:
        hits_locality = any(_overlapping(sp.start, sp.end, us, ue) for us, ue in used)
        if hits_locality and sp.label in _LOCALITY_FAMILY:
            continue
        result.append(sp)
    result.extend(found)
    return result


def add_pattern_entities(text: str, spans: list[Span]) -> list[Span]:
    """R2 — add-if-absent pattern entities (PINCODE, PLOT, GALI, COLONY,
    CITY, STATE) with the reference's exact overlap/lookup asymmetries."""
    result = list(spans)
    input_spans = {(sp.start, sp.end) for sp in spans}
    input_labels = {sp.label for sp in spans}

    def overlaps_result(start: int, end: int) -> bool:
        return any(_overlapping(start, end, sp.start, sp.end) for sp in result)

    if "PINCODE" not in input_labels:
        m = PATTERNS["PINCODE"].search(text)
        if m and not overlaps_result(m.start(), m.end()):
            result.append(Span.make("PINCODE", m.group(0), m.start(), m.end(), 1.0))

    if "PLOT" not in input_labels:
        m = PATTERNS["PLOT"].search(text)
        if m and not overlaps_result(m.start(), m.end()):
            if _PLOT_PREFIX.match(m.group(0)):
                result.append(Span.make("PLOT", m.group(0), m.start(), m.end(), 0.90))

    if "GALI" not in input_labels:
        m = PATTERNS["GALI"].search(text)
        if m and not overlaps_result(m.start(), m.end()):
            result.append(Span.make("GALI", m.group(0), m.start(), m.end(), 0.85))

    if "COLONY" not in input_labels:
        m = PATTERNS["COLONY"].search(text)
        if m and not overlaps_result(m.start(), m.end()):
            value = m.group(0).upper()
            if not any(area in value for area in _AREA_NAMES_FOR_COLONY_VETO):
                result.append(Span.make("COLONY", m.group(0), m.start(), m.end(), 0.85))

    if not any(sp.label == "CITY" for sp in result):
        if "DELHI" in text.upper():
            positions = [m.start() for m in _DELHI_WORD.finditer(text.upper())]
            if positions:
                pos = positions[-1]
                result.append(Span.make("CITY", "DELHI", pos, pos + 5, 0.90))
        else:
            for pattern, city_name in CITY_PATTERNS:
                if city_name == "DELHI":
                    continue
                m = pattern.search(text)
                if m and (m.start(), m.end()) not in input_spans:
                    result.append(Span.make("CITY", city_name, m.start(), m.end(), 0.95))
                    break

    if not any(sp.label == "STATE" for sp in spans):
        for pattern, state_name in STATE_PATTERNS:
            m = pattern.search(text)
            if m and (m.start(), m.end()) not in input_spans:
                if state_name == "DELHI" and any(
                    sp.label == "CITY" and "DELHI" in sp.value.upper() for sp in result
                ):
                    continue
                result.append(Span.make("STATE", state_name, m.start(), m.end(), 0.90))
                break

    return result


def correct_boundaries(text: str, spans: list[Span]) -> list[Span]:
    """R4 — re-anchor KHASRA/BLOCK/FLOOR to the first full-pattern match in
    the text; strip every value. Reproduces the ``or``-fallback on falsy
    (empty) match values."""
    result: list[Span] = []
    for sp in spans:
        updates: dict = {}
        if sp.label in ("KHASRA", "BLOCK", "FLOOR"):
            m = PATTERNS[sp.label].search(text)
            if m:
                updates = {"value": m.group(0), "start": m.start(), "end": m.end()}
        final_value = (updates.get("value") or sp.value).strip()
        if final_value != sp.value or updates:
            updates["value"] = final_value
        result.append(sp.copy(**updates) if updates else sp)
    return result


def merge_fragmented(text: str, spans: list[Span], use_gazetteer: bool = True) -> list[Span]:
    """R5 — merge adjacent (gap ≤ 2) locality-family spans when the merged
    text validates as a locality."""
    if len(spans) < 2:
        return spans

    ordered = sorted(spans, key=lambda sp: sp.start)
    result: list[Span] = []
    i = 0
    while i < len(ordered):
        cur = ordered[i]
        if cur.label in _LOCALITY_FAMILY:
            merged_end = cur.end
            merged_conf = cur.confidence
            j = i + 1
            while j < len(ordered):
                nxt = ordered[j]
                gap = nxt.start - merged_end
                if gap <= 2 and nxt.label in _LOCALITY_FAMILY:
                    candidate = text[cur.start:nxt.end].strip()
                    if _is_valid_merge(candidate, use_gazetteer):
                        merged_end = nxt.end
                        merged_conf = max(merged_conf, nxt.confidence)
                        j += 1
                    else:
                        break
                else:
                    break
            if j > i + 1:
                result.append(
                    Span.make(cur.label, text[cur.start:merged_end], cur.start, merged_end, merged_conf)
                )
                i = j
                continue
        result.append(cur)
        i += 1
    return result


def _is_valid_merge(candidate: str, use_gazetteer: bool) -> bool:
    up = candidate.upper().strip()
    if up in KNOWN_LOCALITIES:
        return True
    if use_gazetteer and gazetteer.is_known_locality(up, threshold=80):
        return True
    return any(up.endswith(suffix) for suffix in COLONY_SUFFIXES)


def adjust_confidence(text: str, spans: list[Span], use_gazetteer: bool = True) -> list[Span]:
    """R6 — +0.1 own-pattern fullmatch; +0.15 gazetteer locality; −0.2 for
    len<3; clamp to [0, 1]."""
    result: list[Span] = []
    for sp in spans:
        conf = sp.confidence
        pattern = PATTERNS.get(sp.label)
        if pattern is not None and pattern.fullmatch(sp.value):
            conf = min(1.0, conf + 0.1)
        if use_gazetteer and sp.label in ("AREA", "SUBAREA", "COLONY"):
            if gazetteer.is_known_locality(sp.value):
                conf = min(1.0, conf + 0.15)
        if len(sp.value) < 3:
            conf = max(0.0, conf - 0.2)
        result.append(sp.copy(confidence=conf) if conf != sp.confidence else sp)
    return result


def remove_overlaps(spans: list[Span]) -> list[Span]:
    """R7 — CITY/PINCODE/STATE always survive; others greedily kept by
    (-confidence, start) with stable tie-break; output sorted by start."""
    if not spans:
        return spans
    preserved = [sp for sp in spans if sp.label in _PRESERVED]
    others = sorted(
        (sp for sp in spans if sp.label not in _PRESERVED),
        key=lambda sp: (-sp.confidence, sp.start),
    )
    kept: list[Span] = []
    used: list[tuple[int, int]] = []
    for sp in others:
        if not any(_overlapping(sp.start, sp.end, s, e) for s, e in used):
            kept.append(sp)
            used.append((sp.start, sp.end))
    kept.extend(preserved)
    return sorted(kept, key=lambda sp: sp.start)


def validate(spans: list[Span], use_gazetteer: bool = True) -> list[Span]:
    """R8 — drop blanks and conf<0.3; PINCODE must fullmatch; non-Delhi
    pincode keeps the span at 0.7× confidence."""
    result: list[Span] = []
    for sp in spans:
        if not sp.value.strip():
            continue
        if sp.confidence < 0.3:
            continue
        if sp.label == "PINCODE":
            if not _PIN_FULL.fullmatch(sp.value):
                continue
            if use_gazetteer and not gazetteer.validate_pincode(sp.value):
                sp = sp.copy(confidence=sp.confidence * 0.7)
        result.append(sp)
    return result


def extract_all_patterns(text: str) -> dict[str, list[str]]:
    """R9 — diagnostic findall over every PATTERNS entry."""
    out: dict[str, list[str]] = {}
    for label, pattern in PATTERNS.items():
        hits = pattern.findall(text)
        if hits:
            out[label] = hits
    return out
