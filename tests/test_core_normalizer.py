"""Normalization parity tests.

Ports the semantics of reference ``tests/test_preprocessing.py`` (abbreviation
cases, pincode extraction incl. negatives, empty handling) plus ordering
invariants of the rule table.
"""

from indian_address_parser_spark.core import normalizer as N


class TestNormalize:
    def test_abbreviation_expansion(self):
        cases = {
            "H.NO 752": "HOUSE NO 752",
            "H NO 752": "HOUSE NO 752",
            "HNO 752": "HOUSE NO 752",
            # trailing dot survives: \bH\.?\s*NO\.?\b backtracks before '.'
            "h.no. 752": "HOUSE NO. 752",
            "PLT NO 5": "PLOT NO 5",
            "P.NO 5": "PLOT NO 5",
            "GF": "GROUND FLOOR",
            "FF": "FIRST FLOOR",
            "SF": "SECOND FLOOR",
            "TF": "THIRD FLOOR",
            # the bare FL rule precedes the 1ST FL / GRD FL rules in the
            # ordered table, so FL expands first — reference-faithful
            "1ST FL": "1ST FLOOR",
            "GRD FL": "GRD FLOOR",
            "BLK A": "BLOCK A",
            "SEC 12": "SECTOR 12",
            "KH NO 24/1": "KHASRA NO 24/1",
            "KH 24": "KHASRA 24",
            "COL XYZ": "COLONY XYZ",
            "NGR": "NAGAR",
            "N.DELHI": "NEW DELHI",
            "N DELHI": "NEW DELHI",
            "DL": "DELHI",
        }
        for raw, expected in cases.items():
            assert N.normalize(raw) == expected, raw

    def test_rule_order_h_no_before_h_n(self):
        # H.N expands via the second (H.N) rule; the dot survives boundary
        # backtracking exactly as in the reference
        assert N.normalize("H.N. 5") == "HOUSE NO. 5"
        assert N.normalize("H.N 5") == "HOUSE NO 5"

    def test_whitespace_and_punctuation(self):
        assert N.normalize("A   B\t C") == "A B C"
        assert N.normalize("A ,B") == "A, B"
        assert N.normalize("A - B") == "A-B"
        assert N.normalize("A – B — C") == "A-B-C"
        # whitespace pass runs BEFORE punctuation dedup, so ',,' has already
        # become ', ,' by the time the dedup rule runs — reference-faithful
        assert N.normalize("A,,B--C") == "A, , B-C"
        assert N.normalize("A-,B") == "A, B"
        assert N.normalize("  X  ") == "X"

    def test_uppercase(self):
        assert N.normalize("lajpat nagar") == "LAJPAT NAGAR"

    def test_empty(self):
        assert N.normalize("") == ""
        assert N.normalize(None) == ""  # falsy guard

    def test_idempotent_on_normalized(self):
        once = N.normalize("H.NO 45, GALI NO 7, RAJ NAGAR, N.DELHI 110045")
        assert N.normalize(once) == once


class TestPincode:
    def test_extract(self):
        assert N.extract_pincode("RAJ NAGAR 110045 DELHI") == "110045"
        assert N.extract_pincode("A 110045 B 110046") == "110045"

    def test_negatives(self):
        assert N.extract_pincode("010045") is None          # leading zero
        assert N.extract_pincode("11004") is None           # 5 digits
        assert N.extract_pincode("1100456") is None         # 7 digits, no boundary
        assert N.extract_pincode("no pin here") is None

    def test_remove(self):
        assert N.remove_pincode("A 110045 B") == "A  B"
        assert N.remove_pincode("110045 110046") == " "


class TestTokenize:
    def test_compound_ids_stay_whole(self):
        assert "H-3" in N.tokenize("BLOCK H-3")
        assert "24/1/3" in N.tokenize("KH NO 24/1/3")

    def test_mixed_alnum(self):
        assert N.tokenize("A5 5A") == ["A5", "5A"]

    def test_words_numbers_punct(self):
        assert N.tokenize("RAJ NAGAR, 110045.") == ["RAJ", "NAGAR", ",", "110045", "."]

    def test_lowercase_input_uppercased(self):
        assert N.tokenize("raj nagar") == ["RAJ", "NAGAR"]
