"""Devanagari handling: detection, script ratios, transliteration (P8-P12).

Parity target: reference ``src/address_parser/preprocessing/hindi.py``.
The char-wise transliteration loop is stateful (implicit-'a' schwa rule:
no 'a' is appended before a matra/halant in U+093E-U+094D, hindi.py:180-189)
so it stays a plain Python loop; vectorization happens at the Arrow-batch
level, not inside the string.
"""

from __future__ import annotations

import re

_DEV_LO = 0x0900
_DEV_HI = 0x097F

# Known Hindi address terms → Latin (hindi.py:21-66). Applied longest-first.
KNOWN_TERMS: dict[str, str] = {
    'गली': 'GALI',
    'गलि': 'GALI',
    'मोहल्ला': 'MOHALLA',
    'नगर': 'NAGAR',
    'विहार': 'VIHAR',
    'पुरी': 'PURI',
    'पुर': 'PUR',
    'बाग': 'BAGH',
    'मार्ग': 'MARG',
    'रोड': 'ROAD',
    'मंजिल': 'FLOOR',
    'पहली': 'FIRST',
    'दूसरी': 'SECOND',
    'तीसरी': 'THIRD',
    'चौथी': 'FOURTH',
    'भूतल': 'GROUND FLOOR',
    'तहखाना': 'BASEMENT',
    'मकान': 'HOUSE',
    'प्लॉट': 'PLOT',
    'खसरा': 'KHASRA',
    'ब्लॉक': 'BLOCK',
    'सेक्टर': 'SECTOR',
    'कॉलोनी': 'COLONY',
    'इलाका': 'AREA',
    'क्षेत्र': 'AREA',
    'दिल्ली': 'DELHI',
    'नई दिल्ली': 'NEW DELHI',
    'नम्बर': 'NUMBER',
    'नंबर': 'NUMBER',
    'संख्या': 'NUMBER',
    'पास': 'NEAR',
    'सामने': 'OPPOSITE',
    'पीछे': 'BEHIND',
    'के पास': 'NEAR',
    'के सामने': 'OPPOSITE',
    'चौक': 'CHOWK',
    'बाजार': 'BAZAAR',
    'बस्ती': 'BASTI',
    'पार्क': 'PARK',
    'एक्सटेंशन': 'EXTENSION',
    'फेज': 'PHASE',
    'वार्ड': 'WARD',
    'जोन': 'ZONE',
}

_KNOWN_BY_LEN = sorted(KNOWN_TERMS.items(), key=lambda kv: -len(kv[0]))

_CONSONANTS: dict[str, str] = {
    'क': 'k', 'ख': 'kh', 'ग': 'g', 'घ': 'gh', 'ङ': 'ng',
    'च': 'ch', 'छ': 'chh', 'ज': 'j', 'झ': 'jh', 'ञ': 'ny',
    'ट': 't', 'ठ': 'th', 'ड': 'd', 'ढ': 'dh', 'ण': 'n',
    'त': 't', 'थ': 'th', 'द': 'd', 'ध': 'dh', 'न': 'n',
    'प': 'p', 'फ': 'ph', 'ब': 'b', 'भ': 'bh', 'म': 'm',
    'य': 'y', 'र': 'r', 'ल': 'l', 'व': 'v', 'श': 'sh',
    'ष': 'sh', 'स': 's', 'ह': 'h',
    'क़': 'q', 'ख़': 'kh', 'ग़': 'g', 'ज़': 'z', 'ड़': 'd',
    'ढ़': 'dh', 'फ़': 'f', 'य़': 'y',
}

_VOWELS: dict[str, str] = {
    'अ': 'a', 'आ': 'aa', 'इ': 'i', 'ई': 'ee', 'उ': 'u', 'ऊ': 'oo',
    'ए': 'e', 'ऐ': 'ai', 'ओ': 'o', 'औ': 'au', 'अं': 'an', 'अः': 'ah',
    'ा': 'a', 'ि': 'i', 'ी': 'ee', 'ु': 'u', 'ू': 'oo',
    'े': 'e', 'ै': 'ai', 'ो': 'o', 'ौ': 'au',
    'ं': 'n', 'ः': 'h', '्': '',
    'ँ': 'n',
}

_DIGITS: dict[str, str] = {
    '०': '0', '१': '1', '२': '2', '३': '3', '४': '4',
    '५': '5', '६': '6', '७': '7', '८': '8', '९': '9',
}

_WS = re.compile(r'\s+')


def contains_devanagari(text: str) -> bool:
    """P8 — any code point in U+0900-U+097F."""
    return any(_DEV_LO <= ord(ch) <= _DEV_HI for ch in text)


def script_ratio(text: str) -> dict[str, float]:
    """P9 — per-char latin/devanagari/numeric/other ratios (whitespace skipped)."""
    if not text:
        return {'latin': 0.0, 'devanagari': 0.0, 'numeric': 0.0, 'other': 0.0}
    counts: dict[str, float] = {'latin': 0, 'devanagari': 0, 'numeric': 0, 'other': 0}
    total = 0
    for ch in text:
        if ch.isspace():
            continue
        total += 1
        if _DEV_LO <= ord(ch) <= _DEV_HI:
            counts['devanagari'] += 1
        elif ch.isascii() and ch.isalpha():
            counts['latin'] += 1
        elif ch.isdigit():
            counts['numeric'] += 1
        else:
            counts['other'] += 1
    if total == 0:
        return counts
    return {k: v / total for k, v in counts.items()}


def transliterate(text: str) -> str:
    """P10 — known-terms pass (longest first, spaces injected around the
    replacement) then a stateful char-wise ITRANS-ish pass with the schwa
    rule, then whitespace collapse + uppercase."""
    if not contains_devanagari(text):
        return text

    for hindi, latin in _KNOWN_BY_LEN:
        text = text.replace(hindi, f' {latin} ')

    out: list[str] = []
    n = len(text)
    for i, ch in enumerate(text):
        code = ord(ch)
        if _DEV_LO <= code <= _DEV_HI:
            if ch in _DIGITS:
                out.append(_DIGITS[ch])
            elif ch in _VOWELS:
                out.append(_VOWELS[ch])
            elif ch in _CONSONANTS:
                out.append(_CONSONANTS[ch])
                # implicit 'a' unless the next char is a matra/halant
                if i + 1 < n:
                    if not (0x093E <= ord(text[i + 1]) <= 0x094D):
                        out.append('a')
                else:
                    out.append('a')
            else:
                out.append(ch)
        else:
            out.append(ch)

    return _WS.sub(' ', ''.join(out)).strip().upper()


def normalize_mixed_script(text: str) -> str:
    """P11 — word-by-word: known-term hit → replacement; Devanagari word →
    transliterate; Latin word → uppercase."""
    result = []
    for word in text.split():
        if contains_devanagari(word):
            if word in KNOWN_TERMS:
                result.append(KNOWN_TERMS[word])
            else:
                result.append(transliterate(word))
        else:
            result.append(word.upper())
    return ' '.join(result)


def detect_language(text: str) -> str:
    """P12 — 'hindi' / 'english' / 'mixed' from script ratios."""
    ratios = script_ratio(text)
    if ratios['devanagari'] > 0.5:
        return 'hindi'
    if ratios['latin'] > 0.5:
        return 'english'
    if ratios['devanagari'] > 0 and ratios['latin'] > 0:
        return 'mixed'
    return 'english'
