"""Address text normalization (P1-P7).

Parity target: reference ``src/address_parser/preprocessing/normalizer.py``.
Stage order is semantic (normalizer.py:108-125): whitespace → punctuation →
abbreviation expansion (ordered, case-insensitive, replace-all) → uppercase →
whitespace again. The abbreviation table is applied in insertion order —
reordering changes output (e.g. ``H.NO`` must expand before ``H.N``).

Module-level compiled regexes ≙ per-Python-worker compile-once when imported
inside a pandas UDF.
"""

from __future__ import annotations

import re

# Ordered abbreviation → expansion rules (normalizer.py:19-60). The rule
# strings must stay byte-identical to the reference for output parity.
ABBREVIATION_RULES: tuple[tuple[str, str], ...] = (
    (r'\bH\.?\s*NO\.?\b', 'HOUSE NO'),
    (r'\bH\.?\s*N\.?\b', 'HOUSE NO'),
    (r'\bHNO\.?\b', 'HOUSE NO'),
    (r'\bPLT\.?\s*NO\.?\b', 'PLOT NO'),
    (r'\bP\.?\s*NO\.?\b', 'PLOT NO'),
    (r'\bFL\.?\b', 'FLOOR'),
    (r'\bFLR\.?\b', 'FLOOR'),
    (r'\bGF\.?\b', 'GROUND FLOOR'),
    (r'\bFF\.?\b', 'FIRST FLOOR'),
    (r'\bSF\.?\b', 'SECOND FLOOR'),
    (r'\bTF\.?\b', 'THIRD FLOOR'),
    (r'\b1ST\s+FL\.?\b', 'FIRST FLOOR'),
    (r'\b2ND\s+FL\.?\b', 'SECOND FLOOR'),
    (r'\b3RD\s+FL\.?\b', 'THIRD FLOOR'),
    (r'\bGRD\.?\s*FL\.?\b', 'GROUND FLOOR'),
    (r'\bBLK\.?\b', 'BLOCK'),
    (r'\bBL\.?\b', 'BLOCK'),
    (r'\bSEC\.?\b', 'SECTOR'),
    (r'\bKH\.?\s*NO\.?\b', 'KHASRA NO'),
    (r'\bKHASRA\s*NO\.?\b', 'KHASRA NO'),
    (r'\bKH\.?\b', 'KHASRA'),
    (r'\bCOL\.?\b', 'COLONY'),
    (r'\bNGR\.?\b', 'NAGAR'),
    (r'\bMKT\.?\b', 'MARKET'),
    (r'\bRD\.?\b', 'ROAD'),
    (r'\bST\.?\b', 'STREET'),
    (r'\bLN\.?\b', 'LANE'),
    (r'\bEXTN\.?\b', 'EXTENSION'),
    (r'\bEXT\.?\b', 'EXTENSION'),
    (r'\bPH\.?\b', 'PHASE'),
    (r'\bNR\.?\b', 'NEAR'),
    (r'\bOPP\.?\b', 'OPPOSITE'),
    (r'\bBHD\.?\b', 'BEHIND'),
    (r'\bADJ\.?\b', 'ADJACENT'),
    (r'\bWZ\.?\b', 'WZ'),
    (r'\bEZ\.?\b', 'EZ'),
    (r'\bNZ\.?\b', 'NZ'),
    (r'\bSZ\.?\b', 'SZ'),
    (r'\bDL\.?\b', 'DELHI'),
    (r'\bN\.?\s*DELHI\b', 'NEW DELHI'),
)

_ABBREV_COMPILED = tuple(
    (re.compile(pat, re.IGNORECASE), repl) for pat, repl in ABBREVIATION_RULES
)

_WS = re.compile(r'\s+')
_WS_COMMA = re.compile(r'\s*,\s*')
_WS_DASH = re.compile(r'\s*-\s*')
_UNI_DASH = re.compile(r'[–—]')
_DUP_COMMA = re.compile(r',+')
_DUP_DASH = re.compile(r'-+')
_DASH_COMMA = re.compile(r'-,')
_PINCODE = re.compile(r'\b[1-9]\d{5}\b')

_TOKEN_PATTERN = re.compile(
    r'''
    [A-Z0-9]+[-/][A-Z0-9/]+  |  # Compound identifiers like H-3, 24/1/3
    [A-Z]+\d+               |  # Letter+number combos like A5
    \d+[A-Z]+               |  # Number+letter combos like 5A
    [A-Z]+                  |  # Words
    \d+                     |  # Numbers
    [,.]                       # Punctuation
    ''',
    re.VERBOSE,
)


def clean_whitespace(text: str) -> str:
    """P2 — collapse runs, standardize spacing around ``,`` / ``-``, trim."""
    text = _WS.sub(' ', text)
    text = _WS_COMMA.sub(', ', text)
    text = _WS_DASH.sub('-', text)
    return text.strip()


def standardize_punctuation(text: str) -> str:
    """P3 — unicode dashes → ``-``; dedupe ``,,``/``--``; ``-,`` → ``,``."""
    text = _UNI_DASH.sub('-', text)
    text = _DUP_COMMA.sub(',', text)
    text = _DUP_DASH.sub('-', text)
    text = _DASH_COMMA.sub(',', text)
    return text


def expand_abbreviations(text: str) -> str:
    """P4 — apply the ordered abbreviation rules (replace all occurrences)."""
    for pat, repl in _ABBREV_COMPILED:
        text = pat.sub(repl, text)
    return text


def normalize(text: str, uppercase: bool = True, expand_abbrev: bool = True) -> str:
    """P1 — full normalization chain (order-sensitive)."""
    if not text:
        return ""
    out = clean_whitespace(text)
    out = standardize_punctuation(out)
    if expand_abbrev:
        out = expand_abbreviations(out)
    if uppercase:
        out = out.upper()
    return clean_whitespace(out)


def extract_pincode(text: str) -> str | None:
    """P5 — first 6-digit PIN (not starting with 0), or None."""
    m = _PINCODE.search(text)
    return m.group(0) if m else None


def remove_pincode(text: str) -> str:
    """P6 — delete every 6-digit PIN token."""
    return _PINCODE.sub('', text)


def tokenize(text: str) -> list[str]:
    """P7 — address-aware tokenization (keeps ``H-3``, ``24/1/3`` whole)."""
    return [m.group(0) for m in _TOKEN_PATTERN.finditer(text.upper()) if m.group(0).strip()]
