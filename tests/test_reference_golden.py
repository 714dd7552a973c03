"""Golden byte-identity test against the ACTUAL reference implementation.

Runs the reference's own ``AddressParser.rules_only().parse()`` (imported
from /root/reference/src via tests/reference_harness.py) next to this
repo's ``core.parse.parse_address`` over a generated corpus and asserts
normalized text AND the full span list are byte-identical per address.

Parity surface covered (SURVEY.md §5.2 item 2):
- P1-P7 normalization chain incl. the 34 ordered abbreviation rules
  (reference ``preprocessing/normalizer.py``),
- P8-P12 Devanagari transliteration / mixed-script handling
  (``preprocessing/hindi.py``),
- E1 preprocess composition + E2 rules extractor
  (``pipeline.py:180-231, 272-439``),
- R1-R9 refinement incl. overlap removal and boundary quirks
  (``postprocessing/rules.py``),
- G1-G5 gazetteer interactions (``postprocessing/gazetteer.py`` — its
  rapidfuzz scorer is backed by our verified-equivalent indel_ratio, see
  reference_harness docstring; everything else is reference code).
"""

from __future__ import annotations

import random

import pytest

from indian_address_parser_spark.core.parse import parse_address

from reference_harness import load_reference

HOUSE_STYLES = (
    "H.NO {n}", "H NO {n}", "HNO {n}", "House No. {n}", "h no {n}",
    "PLOT NO{n}", "Plot No. {n}", "FLAT NO {n}", "RZ-{n}", "WZ {n}",
    "KH NO {n}", "KH. NO. {n}/2",
)
FLOORS = ("", "GROUND FLOOR, ", "First Floor, ", "2nd flr, ", "FF, ", "TF ")
GALIS = ("", "GALI NO {g}, ", "Gali {g}, ", "GALLI NO. {g}, ", "LANE {g} ")
BLOCKS = ("", "BLOCK {b}, ", "BLK {b}, ", "BL-{b}, ")
SECTORS = ("", "SECTOR {s}, ", "Sec {s}, ")
LOCALITIES = (
    "LAJPAT NAGAR", "Malviya Ngr", "HAUZ KHAS", "Uttam Ngr", "RAJ NAGAR",
    "Sadh Nagar", "VIJAY ENCLAVE", "DURGA PARK", "KAROL BAGH", "Palam Colny",
    "MUKHERJEE NAGAR", "Chanchal Park", "SWARN PARK", "KAUNWAR SINGH NAGAR",
    "GREEN PARK EXTN", "NAJAFGARH RD", "Some Unknown Vihar", "X",
)
CITIES = ("NEW DELHI", "New Delhi", "DELHI", "delhi", "SOUTH DELHI", "")
PINS = ("110024", "110041", "110059", "110085", "", "999999", "110000")
DEVANAGARI = (
    "दिल्ली", "नई दिल्ली", "गली नं 4", "मकान नं 12", "उत्तम नगर",
    "राज नगर पालम कॉलोनी", "सेक्टर 7", "ब्लॉक सी",
)
NOISE = ("", "  ", " – ", " -- ", ",,", " , ", "\t")


def _corpus(n: int = 1200) -> list[str]:
    rng = random.Random(20260816)
    out = [
        "",
        "   ",
        "110041",
        "DELHI",
        "दिल्ली 110041",
        "PLOT NO752 FIRST FLOOR, NEW DELHI, 110041",  # reference README example
        "H.NO 45 GALI NO 4 RAJ NAGAR PALAM COLONY NEW DELHI 110045",
    ]
    while len(out) < n:
        parts = [
            rng.choice(HOUSE_STYLES).format(n=rng.randint(1, 999)),
            ", ",
            rng.choice(FLOORS),
            rng.choice(GALIS).format(g=rng.randint(1, 30)),
            rng.choice(BLOCKS).format(b=rng.choice("ABCDE")),
            rng.choice(SECTORS).format(s=rng.randint(1, 25)),
            rng.choice(LOCALITIES),
            rng.choice(NOISE),
            ", ",
            rng.choice(CITIES),
            " ",
            rng.choice(PINS),
        ]
        if rng.random() < 0.25:
            parts.insert(rng.randrange(len(parts)), " " + rng.choice(DEVANAGARI) + " ")
        if rng.random() < 0.1:
            parts = [p.lower() for p in parts]
        out.append("".join(parts))
    return out


@pytest.fixture(scope="module")
def ref_parser():
    ap = load_reference()
    return ap.AddressParser.rules_only()


def _span_tuple(e):
    return (e.label, e.value, e.start, e.end, e.confidence)


def test_golden_byte_identity(ref_parser):
    corpus = _corpus()
    mismatches = []
    for text in corpus:
        ref = ref_parser.parse(text)
        norm, spans = parse_address(text)
        ref_spans = [_span_tuple(e) for e in ref.entities]
        our_spans = [(s.label, s.value, s.start, s.end, s.confidence) for s in spans]
        if norm != ref.normalized_address or ref_spans != our_spans:
            mismatches.append((text, ref.normalized_address, norm, ref_spans, our_spans))
    assert not mismatches, (
        f"{len(mismatches)}/{len(corpus)} divergences; first: {mismatches[0]}"
    )


def test_golden_computed_accessors(ref_parser):
    """ParsedAddress computed accessors (house_number/pincode/city/locality
    mapping) vs our flatten_fields — the ER field mapping both pipelines
    block and score on."""
    from indian_address_parser_spark.core.parse import flatten_fields

    for text in _corpus(300):
        ref = ref_parser.parse(text)
        _, spans = parse_address(text)
        fields = flatten_fields(spans)
        assert fields["house_no"] == ref.house_number, text
        assert fields["pincode"] == ref.pincode, text
        assert fields["city"] == ref.city, text
