"""Delhi locality gazetteer (G1-G5).

Parity target: reference ``src/address_parser/postprocessing/gazetteer.py``.
The vocabulary sets are identical; fuzzy scoring uses our pure-Python Indel
ratio (rapidfuzz-equivalent, see ``core.fuzzy``). At Spark scale this is a
broadcast fuzzy lookup: the ~150-entry vocabulary ships to every Python
worker at module import; per-value results are memoized because mention
fields repeat heavily across a batch.
"""

from __future__ import annotations

from functools import lru_cache

from indian_address_parser_spark.core.fuzzy import indel_ratio

LOCALITIES = frozenset({
    # South Delhi
    "SAKET", "MALVIYA NAGAR", "HAUZ KHAS", "GREEN PARK", "GREATER KAILASH",
    "DEFENCE COLONY", "LAJPAT NAGAR", "SOUTH EXTENSION", "CHITTARANJAN PARK",
    "KALKAJI", "NEHRU PLACE", "OKHLA", "JASOLA", "SARITA VIHAR",
    "ALAKNANDA", "SAFDARJUNG", "VASANT KUNJ", "MEHRAULI", "CHATTARPUR",
    # North Delhi
    "CIVIL LINES", "MODEL TOWN", "MUKHERJEE NAGAR", "KAMLA NAGAR",
    "SHAKTI NAGAR", "GULABI BAGH", "ASHOK VIHAR", "SHALIMAR BAGH",
    "PITAMPURA", "ROHINI", "NARELA", "BAWANA", "ALIPUR",
    # East Delhi
    "PREET VIHAR", "MAYUR VIHAR", "PATPARGANJ", "PANDAV NAGAR",
    "LAKSHMI NAGAR", "SHAKARPUR", "GEETA COLONY", "GANDHI NAGAR",
    "DILSHAD GARDEN", "SEELAMPUR", "SHAHDARA", "ANAND VIHAR",
    # West Delhi
    "JANAKPURI", "DWARKA", "PALAM", "UTTAM NAGAR", "VIKASPURI",
    "TILAK NAGAR", "RAJOURI GARDEN", "PUNJABI BAGH", "PASCHIM VIHAR",
    "MEERA BAGH", "PEERAGARHI", "MUNDKA", "NANGLOI", "NAJAFGARH",
    "BINDAPUR", "KAKROLA", "MOHAN GARDEN", "NAWADA",
    # Central Delhi
    "CONNAUGHT PLACE", "KAROL BAGH", "PAHARGANJ", "DARYAGANJ",
    "CHANDNI CHOWK", "SADAR BAZAAR", "RAJENDER NAGAR", "PATEL NAGAR",
    "KIRTI NAGAR", "MOTIA KHAN", "ANAND PARBAT", "JHANDEWALAN",
    # New Delhi
    "CHANAKYAPURI", "LODHI ROAD", "GOLF LINKS", "JORBAGH",
    "SUNDAR NAGAR", "NIZAMUDDIN", "LODI COLONY", "PANDARA ROAD",
    # Other areas
    "BADARPUR", "TUGHLAKABAD", "SANGAM VIHAR", "MADANPUR KHADAR",
    "GOVINDPURI", "AMBEDKAR NAGAR", "LADO SARAI", "TIGRI",
    "BURARI", "KARAWAL NAGAR", "BHAJANPURA", "MUSTAFABAD",
    "JAFFRABAD", "MAUJPUR", "GOKALPUR", "SEEMAPURI",
})

NAGAR_SUFFIXES = frozenset({
    "NAGAR", "VIHAR", "COLONY", "ENCLAVE", "EXTENSION", "PURI",
    "PARK", "GARDEN", "BAGH", "KUNJ", "APARTMENT", "RESIDENCY",
    "COMPLEX", "PHASE", "SECTOR", "BLOCK", "POCKET",
})

COMMON_AREAS = frozenset({
    "KAUNWAR SINGH NAGAR", "BABA HARI DAS COLONY", "TIKARI KALA",
    "CHANCHAL PARK", "SWARN PARK", "MUNDKA", "NANGLOI", "BAKKARWALA",
    "MAJRA DABAS", "CHAND NAGAR", "RANHOLA", "BAPROLA", "POOTH KHURD",
    "KIRARI", "SULTANPURI", "MANGOLPURI", "BEGUMPUR", "KADIPUR",
    "RAMA VIHAR", "PREM NAGAR", "VIJAY PARK", "AMBICA VIHAR",
    "SHIV PURI", "BUDH VIHAR", "POOTH KALAN", "QUTUBGARH",
    "RANI KHERA", "SHAHABAD DAIRY", "SAMAIPUR", "JAHANGIRPURI",
    "SANNOTH", "KANJHAWALA", "BAWANA", "ALIPUR",
})

HINDI_TERMS = frozenset({
    "MOHALLA", "GALI", "KATRA", "BASTI", "BAZAR", "CHOWK",
    "GANJ", "PUR", "ABAD", "GARH", "GAON", "KHERA", "KHURD", "KALAN",
})

ALL_PLACES: tuple[str, ...] = tuple(sorted(LOCALITIES | COMMON_AREAS | HINDI_TERMS))

MIN_SIMILARITY = 80.0


@lru_cache(maxsize=65536)
def best_match(text: str) -> tuple[str, float] | None:
    """Best gazetteer entry for ``text`` by Indel ratio (G1 top-1).

    Ties are broken lexicographically (ALL_PLACES is sorted) which is
    deterministic — the reference iterates a Python set so its tie order is
    hash-seed-dependent; only the score is contractual.
    """
    if not text or len(text) < 3:
        return None
    q = text.upper()
    lq = len(q)
    best_place, best_score = None, -1.0
    for place in ALL_PLACES:
        # upper bound: LCS ≤ min(len) → ratio ≤ 200·min/(sum); prune
        ub = 200.0 * min(lq, len(place)) / (lq + len(place))
        if ub <= best_score:
            continue
        s = indel_ratio(q, place)
        if s > best_score:
            best_place, best_score = place, s
    if best_place is None:
        return None
    return best_place, best_score


def fuzzy_match(text: str, limit: int = 3) -> list[tuple[str, float]]:
    """G1 — top-``limit`` gazetteer matches scoring ≥ MIN_SIMILARITY."""
    if not text or len(text) < 3:
        return []
    q = text.upper()
    scored = sorted(
        ((place, indel_ratio(q, place)) for place in ALL_PLACES),
        key=lambda kv: -kv[1],
    )[:limit]
    return [(p, s) for p, s in scored if s >= MIN_SIMILARITY]


def is_known_locality(text: str, threshold: float = 85.0) -> bool:
    """G2 — best fuzzy match ≥ max(threshold, MIN_SIMILARITY)."""
    m = best_match(text)
    return bool(m and m[1] >= MIN_SIMILARITY and m[1] >= threshold)


def correct_spelling(text: str) -> str | None:
    """G3 — best match ≥ 90 → canonical spelling."""
    m = best_match(text)
    if m and m[1] >= 90.0 and m[1] >= MIN_SIMILARITY:
        return m[0]
    return None


def get_locality_type(text: str) -> str | None:
    """G4 — suffix classification over NAGAR_SUFFIXES."""
    up = text.upper()
    for suffix in NAGAR_SUFFIXES:
        if up.endswith(suffix):
            return suffix
    return None


def validate_pincode(pincode: str) -> bool:
    """G5 — Delhi PIN range 110001-110097."""
    if not pincode or not pincode.isdigit() or len(pincode) != 6:
        return False
    return 110001 <= int(pincode) <= 110097
