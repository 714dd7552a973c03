"""Source/sink wrapper tests (SURVEY.md §2.1)."""

from indian_address_parser_spark.sources import io as sio
from indian_address_parser_spark.sources.gold_tags import generate_gold_tags


class TestTextSources:
    def test_read_address_lines(self, spark, tmp_path):
        p = tmp_path / "addrs.txt"
        p.write_text("H.NO 5, DELHI 110041\n\n  RAJ NAGAR, DELHI  \n")
        df = sio.read_address_lines(spark, str(p))
        rows = [r["address"] for r in df.collect()]
        assert rows == ["H.NO 5, DELHI 110041", "RAJ NAGAR, DELHI"]

    def test_address_literals(self, spark):
        assert sio.address_literals(spark, ["a b c"]).count() == 1


class TestGoldJsonl:
    def test_roundtrip(self, spark, tmp_path):
        samples = generate_gold_tags(n_samples=30)  # coverage phase may exceed n_samples
        df = spark.createDataFrame(samples, sio.GOLD_SCHEMA)
        out = str(tmp_path / "gold")
        sio.write_gold_jsonl(df, out)
        back = sio.read_gold_jsonl(spark, out)
        assert back.count() == len(samples)
        assert back.schema == sio.GOLD_SCHEMA
        a = {r["id"]: (r["text"], tuple(r["tokens"]), tuple(r["ner_tags"])) for r in df.collect()}
        b = {r["id"]: (r["text"], tuple(r["tokens"]), tuple(r["ner_tags"])) for r in back.collect()}
        assert a == b


class TestConll:
    def test_roundtrip(self, tmp_path):
        samples = generate_gold_tags(n_samples=20)  # may exceed 20 for coverage
        p = str(tmp_path / "gold.conll")
        sio.write_conll_bio(samples, p)
        back = sio.read_conll_bio(p)
        assert len(back) == len(samples)
        for orig, got in zip(samples, back):
            assert got["tokens"] == orig["tokens"]
            assert got["ner_tags"] == orig["ner_tags"]
            assert got["text"] == orig["text"]


class TestParsedJson:
    def test_mentions_json_sink(self, spark, tmp_path):
        from indian_address_parser_spark.operators.extract import extract_mentions
        from indian_address_parser_spark.sources.pages import generate

        mentions = extract_mentions(generate(spark, n_households=30)["pages"])
        out = str(tmp_path / "mentions_json")
        sio.write_parsed_json(mentions, out)
        back = spark.read.json(out)
        assert back.count() == mentions.count()
