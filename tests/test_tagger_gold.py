"""Token-level tagging tests over the gold fixture (SURVEY.md §5.2 item 3)
plus the pluggable tagger surface (BIO decode path = reference E7)."""

from indian_address_parser_spark.core.schemas import BIO_LABELS, LABEL2ID
from indian_address_parser_spark.operators.tagger import FakeSequenceTagger, RulesTagger
from indian_address_parser_spark.sources.gold_tags import (
    entity_f1,
    generate_gold_tags,
    sample_to_char_spans,
    validate_sample,
)


class TestGoldFixture:
    def test_deterministic(self):
        a = generate_gold_tags(n_samples=150, seed=42)
        b = generate_gold_tags(n_samples=150, seed=42)
        assert a == b

    def test_invariants(self):
        for s in generate_gold_tags(n_samples=150):
            assert validate_sample(s), s["id"]

    def test_min_coverage_per_entity(self):
        from collections import Counter

        counts = Counter()
        for s in generate_gold_tags(n_samples=150, min_per_entity=20):
            for tag in s["ner_tags"]:
                if tag.startswith("B-"):
                    counts[tag[2:]] += 1
        for entity in ("HOUSE_NUMBER", "PLOT", "KHASRA", "GALI", "COLONY",
                       "SUBAREA", "AREA", "CITY", "PINCODE", "STATE",
                       "FLOOR", "BLOCK", "SECTOR"):
            assert counts[entity] >= 20, (entity, counts[entity])

    def test_bio_tags_in_vocabulary(self):
        vocab = set(BIO_LABELS)
        for s in generate_gold_tags(n_samples=50):
            assert all(t in vocab for t in s["ner_tags"])


class TestBioDecodePath:
    """A perfect sequence model (simulated) must decode to exactly the gold
    spans through the shared E7 BIO-decode — validating the BERT-CRF
    tagger's post-model path without weights."""

    @staticmethod
    def _fake_perfect(sample):
        """Build (predictions, offsets, mask) at token granularity from gold."""

        def predict(text):
            assert text == sample["text"]
            predictions, offsets = [], []
            pos = 0
            for token, tag in zip(sample["tokens"], sample["ner_tags"]):
                start = text.index(token, pos)
                predictions.append(LABEL2ID[tag])
                offsets.append((start, start + len(token)))
                pos = start + len(token)
            mask = [1] * len(predictions)
            return predictions, offsets, mask

        return predict

    def test_perfect_model_recovers_gold_spans(self):
        samples = generate_gold_tags(n_samples=60)
        gold, pred = [], []
        for s in samples:
            tagger = FakeSequenceTagger(self._fake_perfect(s))
            spans = tagger.tag_batch([s["text"]])[0]
            gold.append(sample_to_char_spans(s))
            pred.append([(sp.label, sp.start, sp.end) for sp in spans])
        scores = entity_f1(gold, pred)
        assert scores["f1"] == 1.0, scores

    def test_orphan_i_tag_opens_entity_at_085(self):
        tagger = FakeSequenceTagger(
            lambda text: ([LABEL2ID["I-CITY"]], [(0, 5)], [1])
        )
        spans = tagger.tag_batch(["DELHI"])[0]
        assert len(spans) == 1
        assert spans[0].label == "CITY" and spans[0].confidence == 0.85

    def test_special_tokens_skipped(self):
        # (0,0) offsets and mask=0 entries are padding/special tokens
        tagger = FakeSequenceTagger(
            lambda text: (
                [LABEL2ID["B-CITY"], LABEL2ID["B-CITY"], LABEL2ID["B-CITY"]],
                [(0, 0), (0, 5), (0, 5)],
                [1, 1, 0],
            )
        )
        spans = tagger.tag_batch(["DELHI"])[0]
        assert len(spans) == 1


class TestRulesTaggerEval:
    def test_rules_tagger_scores_reasonably_on_gold(self):
        """The rules extractor is not the model, but on gold-style composed
        addresses it should find the deterministic entity types (PINCODE,
        CITY) with high accuracy."""
        samples = generate_gold_tags(n_samples=100)
        tagger = RulesTagger()
        hit = total = 0
        for s in samples:
            gold = {lab for lab, _, _ in sample_to_char_spans(s)}
            pred = {sp.label for sp in tagger.tag_batch([s["text"]])[0]}
            for lab in ("PINCODE", "CITY"):
                if lab in gold:
                    total += 1
                    hit += lab in pred
        assert hit / total >= 0.95, (hit, total)


class TestBertCrfSurface:
    def test_lazy_load_missing_checkpoint(self):
        """Construction is lazy (no checkpoint touch — workers construct the
        tagger before first batch); tagging with a missing checkpoint dir
        fails cleanly at load time."""
        import pytest

        from indian_address_parser_spark.operators.tagger import BertCrfTagger

        tagger = BertCrfTagger("/nonexistent/model")  # must not raise
        with pytest.raises(FileNotFoundError):
            tagger.tag_batch(["NEW DELHI 110024"])
