"""Extraction + refinement parity tests.

Ports reference ``tests/test_pipeline.py`` (rules-only fixtures, offsets,
confidence ranges) and ``tests/test_postprocessing.py`` (overlap removal,
low-confidence filtering, end-to-end refinement), plus golden assertions for
the quirks documented in core/refine.py.
"""

from indian_address_parser_spark.core import refine as R
from indian_address_parser_spark.core.extractor import extract_rules_only
from indian_address_parser_spark.core.parse import flatten_fields, parse_address
from indian_address_parser_spark.core.schemas import Span


def spans_of(raw):
    _, spans = parse_address(raw)
    return spans


class TestRulesExtractor:
    def test_house_first_pattern_wins(self):
        spans = extract_rules_only("FLAT NO 5, HOUSE NO 9, DELHI")
        houses = [s for s in spans if s.label == "HOUSE_NUMBER"]
        assert len(houses) == 1 and houses[0].value == "FLAT NO 5"

    def test_city_prefers_new_delhi(self):
        spans = extract_rules_only("DELHI SOMETHING NEW DELHI")
        city = [s for s in spans if s.label == "CITY"][0]
        assert city.value == "NEW DELHI"

    def test_city_last_delhi_occurrence(self):
        text = "DELHI COLONY XYZ DELHI"
        spans = extract_rules_only(text)
        city = [s for s in spans if s.label == "CITY"][0]
        assert city.value == "DELHI"
        assert city.start == text.rfind("DELHI")

    def test_pincode_delhi_prefix_only(self):
        assert any(s.label == "PINCODE" for s in extract_rules_only("X 110041"))
        # E2's pincode rule is Delhi-prefixed; 201301 is added later by refine R2
        assert not any(s.label == "PINCODE" for s in extract_rules_only("X 201301"))

    def test_known_locality_first_occurrence_only(self):
        text = "DWARKA ROAD NEAR DWARKA"
        subs = [s for s in extract_rules_only(text) if s.label == "SUBAREA"]
        assert len(subs) == 1 and subs[0].start == 0


class TestRefineStages:
    def test_known_localities_all_occurrences(self):
        text = "DWARKA ROAD NEAR DWARKA"
        out = R.fix_known_localities(text, [])
        subs = [s for s in out if s.label == "SUBAREA" and s.value == "DWARKA"]
        assert len(subs) == 2

    def test_fragmented_locality_spans_dropped(self):
        text = "LAJPAT NAGAR DELHI"
        fragment = Span.make("COLONY", "LAJPAT", 0, 6, 0.6)
        out = R.fix_known_localities(text, [fragment])
        assert fragment not in out
        assert any(s.value == "LAJPAT NAGAR" and s.label == "SUBAREA" for s in out)

    def test_non_locality_overlap_survives(self):
        text = "LAJPAT NAGAR DELHI"
        keep = Span.make("HOUSE_NUMBER", "LAJPAT", 0, 6, 0.6)
        out = R.fix_known_localities(text, [keep])
        assert keep in out

    def test_add_pincode_any_indian_pin(self):
        out = R.add_pattern_entities("X 201301 NOIDA", [])
        pin = [s for s in out if s.label == "PINCODE"][0]
        assert pin.value == "201301" and pin.confidence == 1.0

    def test_overlap_removal_keeps_higher_confidence(self):
        a = Span.make("COLONY", "RAJ NAGAR", 0, 9, 0.7)
        b = Span.make("SUBAREA", "RAJ NAGAR", 0, 9, 0.95)
        out = R.remove_overlaps([a, b])
        assert out == [b]

    def test_city_pincode_state_always_preserved(self):
        city = Span.make("CITY", "DELHI", 0, 5, 0.5)
        other = Span.make("COLONY", "DELHI COLONY", 0, 12, 0.9)
        out = R.remove_overlaps([city, other])
        assert city in out and other in out

    def test_validate_drops_low_confidence(self):
        out = R.validate([Span.make("COLONY", "XYZ", 0, 3, 0.2)])
        assert out == []

    def test_validate_non_delhi_pincode_dampened(self):
        out = R.validate([Span.make("PINCODE", "201301", 0, 6, 1.0)])
        assert len(out) == 1 and abs(out[0].confidence - 0.7) < 1e-9

    def test_validate_bad_pincode_format_dropped(self):
        out = R.validate([Span.make("PINCODE", "011301", 0, 6, 1.0)])
        assert out == []

    def test_floor_reanchored_to_zero_span(self):
        # contractual quirk: FLOOR pattern is fully optional → empty match at 0
        text = "PLOT NO 752 FIRST FLOOR, NEW DELHI"
        floor = Span.make("FLOOR", "FIRST FLOOR", 12, 23, 0.9)
        out = R.correct_boundaries(text, [floor])
        assert out[0].start == 0 and out[0].end == 0
        assert out[0].value == "FIRST FLOOR"  # value survives the or-fallback

    def test_merge_fragments_into_known_locality(self):
        text = "LAJPAT NAGAR"
        frags = [
            Span.make("COLONY", "LAJPAT", 0, 6, 0.8),
            Span.make("COLONY", "NAGAR", 7, 12, 0.7),
        ]
        out = R.merge_fragmented(text, frags)
        assert len(out) == 1
        assert out[0].value == "LAJPAT NAGAR" and out[0].confidence == 0.8

    def test_adjust_confidence_short_value_penalty(self):
        out = R.adjust_confidence("AB", [Span.make("COLONY", "AB", 0, 2, 0.9)])
        assert abs(out[0].confidence - 0.7) < 1e-9


class TestEndToEnd:
    def test_basic_parse(self):
        norm, spans = parse_address("H.NO. 45, GALI NO. 7, RAJ NAGAR, NEW DELHI 110045")
        assert norm == "HOUSE NO. 45, GALI NO. 7, RAJ NAGAR, NEW DELHI 110045"
        fields = flatten_fields(spans)
        assert fields["house_no"] == "HOUSE NO. 45"
        assert fields["street"] == "GALI NO. 7"
        assert fields["locality"] == "RAJ NAGAR"
        assert fields["city"] == "NEW DELHI"
        assert fields["pincode"] == "110045"

    def test_empty_and_whitespace(self):
        assert parse_address("") == ("", [])
        assert parse_address("   ") == ("", [])

    def test_offsets_within_text(self):
        norm, spans = parse_address("WZ-149A SADH NAGAR PALAM DELHI 110045")
        for sp in spans:
            assert 0 <= sp.start <= sp.end <= len(norm)
            assert 0.0 <= sp.confidence <= 1.0

    def test_entities_sorted_by_start(self):
        _, spans = parse_address("KH NO 24/1, TIKRI KALAN, WEST DELHI, DELHI 110041")
        starts = [sp.start for sp in spans]
        assert starts == sorted(starts)

    def test_long_repeated_address(self):
        raw = "RAJ NAGAR DELHI 110045, " * 50
        norm, spans = parse_address(raw)
        assert spans  # does not blow up; produces entities

    def test_hindi_address(self):
        norm, spans = parse_address("गली 7, राज नगर, दिल्ली 110045")
        fields = flatten_fields(spans)
        assert fields["pincode"] == "110045"
        assert fields["city"] == "DELHI"
        assert "GALI 7" == fields["street"]

    def test_numbers_only(self):
        norm, spans = parse_address("110045 24 7")
        labels = {s.label for s in spans}
        assert "PINCODE" in labels

    def test_deterministic(self):
        raw = "PLOT NO 12, KH NO 24/1/3, SEC-15, BLOCK B, SWARN PARK, MUNDKA, WEST DELHI, DELHI 110041"
        a = parse_address(raw)
        b = parse_address(raw)
        assert a[0] == b[0]
        assert a[1] == b[1]
