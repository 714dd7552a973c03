"""Transliteration parity tests (reference tests/test_preprocessing.py:77-117)."""

from indian_address_parser_spark.core import translit as T


class TestDetection:
    def test_contains_devanagari(self):
        assert T.contains_devanagari("गली")
        assert not T.contains_devanagari("GALI")
        assert T.contains_devanagari("GALI गली mixed")

    def test_script_ratio(self):
        r = T.script_ratio("AB12")
        assert r["latin"] == 0.5 and r["numeric"] == 0.5
        r = T.script_ratio("गली")
        assert r["devanagari"] == 1.0
        assert T.script_ratio("") == {"latin": 0.0, "devanagari": 0.0, "numeric": 0.0, "other": 0.0}
        # whitespace is not counted
        assert T.script_ratio("A B")["latin"] == 1.0


class TestTransliterate:
    def test_known_terms(self):
        assert T.transliterate("गली") == "GALI"
        assert T.transliterate("नगर") == "NAGAR"
        assert T.transliterate("दिल्ली") == "DELHI"
        assert T.transliterate("नई दिल्ली") == "NEW DELHI"

    def test_devanagari_digits(self):
        assert T.transliterate("१२३") == "123"

    def test_latin_passthrough(self):
        assert T.transliterate("GALI NO 7") == "GALI NO 7"  # untouched, no devanagari

    def test_schwa_rule(self):
        # क followed by matra ा → 'k' + 'a' (matra), no implicit schwa: "ka" not "kaa"
        assert T.transliterate("का") == "KA"
        # bare consonant क → implicit 'a': "ka"
        assert T.transliterate("क") == "KA"
        # halant kills the vowel: क्क → "kk" + trailing 'a' = "KKA"
        assert T.transliterate("क्क") == "KKA"

    def test_mixed_string_uppercased(self):
        out = T.transliterate("abc गली xyz")
        assert out == "ABC GALI XYZ"


class TestMixedScript:
    def test_word_by_word(self):
        assert T.normalize_mixed_script("गली 7 RAJ nagar") == "GALI 7 RAJ NAGAR"

    def test_known_term_exact_word(self):
        assert T.normalize_mixed_script("मकान नंबर 45") == "HOUSE NUMBER 45"


class TestDetectLanguage:
    def test_hindi(self):
        assert T.detect_language("गली नंबर सात") == "hindi"

    def test_english(self):
        assert T.detect_language("GALI NO 7 RAJ NAGAR") == "english"

    def test_mixed(self):
        assert T.detect_language("गली१२ RAJ NAGAR DELHI one two three") in ("mixed", "english")
        assert T.detect_language("गली AB12 345677") == "mixed"

    def test_numbers_only_defaults_english(self):
        assert T.detect_language("110045 24/1") == "english"
