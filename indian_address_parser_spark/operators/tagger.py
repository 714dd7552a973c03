"""Pluggable sequence taggers: rules-only (default) and BERT-CRF.

The reference's trained weights are stripped from its repo
(``/root/reference/.MISSING_LARGE_BLOBS``; both its API and demo fall back
to rules-only — ``api/main.py:47-58``, ``src/address_parser/pipeline.py:
121-133``), so the deterministic parity path is ``RulesTagger``.

``BertCrfTagger`` is nonetheless fully RUNNABLE: the complete inference
stack (WordPiece tokenizer with offset mappings, BERT encoder, linear
head, CRF Viterbi decode) is re-implemented in numpy in
``operators/bert_crf_np.py`` and loaded from a directory checkpoint —
batched Arrow UDF, model loaded once per Python worker (mirroring the
reference API's load-once lifespan), BIO→span conversion via the shared
``core.extractor.bio_decode`` (E7 semantics). Tests drive it end-to-end
with deterministic seeded weights; a trained export drops into the same
checkpoint directory on a real cluster.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indian_address_parser_spark.core import refine
from indian_address_parser_spark.core.extractor import bio_decode, extract_rules_only
from indian_address_parser_spark.core.parse import preprocess
from indian_address_parser_spark.core.schemas import Span
from indian_address_parser_spark.functions.udfs import ENTITY_TYPE


class RulesTagger:
    """E2 rules extractor — the reference's deterministic CI path."""

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:
        return [extract_rules_only(t) for t in texts]


class FakeSequenceTagger:
    """Test double: caller supplies (predictions, offsets, mask) per text;
    decoding then runs through the real E7 path."""

    def __init__(self, predict_fn: Callable[[str], tuple[list[int], list[tuple[int, int]], list[int]]]):
        self.predict_fn = predict_fn

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:
        out = []
        for text in texts:
            predictions, offsets, mask = self.predict_fn(text)
            out.append(bio_decode(text, predictions, offsets, mask))
        return out


class BertCrfTagger:
    """BERT-CRF tagger (reference ``pipeline.py:233-270``), numpy inference.

    Loads lazily ONCE per Python worker from a directory checkpoint
    (``operators/bert_crf_np.py`` — tokenizer + encoder + linear head +
    CRF Viterbi, reference ``bert_crf.py:177-222,296-356,395-439``), batch
    tokenizes with offset mappings, Viterbi-decodes whole Arrow batches as
    tensor ops, then converts BIO tags to spans via the shared
    ``core.extractor.bio_decode`` (E7 semantics). Torch-free: runs on any
    executor image.
    """

    def __init__(self, model_path: str, max_length: int | None = None):
        self.model_path = model_path
        self.max_length = max_length
        self._model = None

    def _load(self):
        from indian_address_parser_spark.operators.bert_crf_np import BertCrfModel

        self._model = BertCrfModel.from_pretrained(self.model_path)

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:
        if self._model is None:
            self._load()
        predictions, offsets, masks = self._model.decode_texts(
            texts, max_length=self.max_length
        )
        out = []
        for row, (text, pred) in enumerate(zip(texts, predictions)):
            off = [tuple(o) for o in offsets[row]]
            mask = list(masks[row])
            out.append(bio_decode(text, [int(t) for t in pred], off, mask))
        return out


def make_tagger_udf(tagger_factory: Callable[[], object], apply_refine: bool = True):
    """mapInPandas fn: (text) → (text, normalized, entities) using any tagger.

    ``tagger_factory`` runs once per Python worker (module/worker reuse), so
    a heavy model loads once — not once per batch.
    """
    state: dict = {}

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if "tagger" not in state:
            state["tagger"] = tagger_factory()
        tagger = state["tagger"]
        for pdf in batches:
            texts = [t if t is not None else "" for t in pdf["text"]]
            normalized = [preprocess(t) for t in texts]
            span_lists = tagger.tag_batch(normalized)
            if apply_refine:
                span_lists = [
                    refine.refine(n, spans) for n, spans in zip(normalized, span_lists)
                ]
            yield pd.DataFrame(
                {
                    "text": texts,
                    "normalized": normalized,
                    "entities": [[sp.as_dict() for sp in spans] for spans in span_lists],
                }
            )

    return tag


def tag_texts(df: DataFrame, tagger_factory: Callable[[], object] | None = None) -> DataFrame:
    """DataFrame(text) → (text, normalized, entities) via the chosen tagger."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("normalized", T.StringType()),
            T.StructField("entities", ENTITY_TYPE),
        ]
    )
    factory = tagger_factory or RulesTagger
    return df.select("text").mapInPandas(make_tagger_udf(factory), schema)
