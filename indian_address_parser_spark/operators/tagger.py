"""Pluggable sequence taggers: rules-only (default) and BERT-CRF.

The reference's trained weights are stripped from its repo
(``/root/reference/.MISSING_LARGE_BLOBS``; both its API and demo fall back
to rules-only — ``api/main.py:47-58``, ``src/address_parser/pipeline.py:
121-133``), so the deterministic path is ``RulesTagger`` and the BERT-CRF
path is a pluggable surface: batched Arrow UDF, model loaded once per
Python worker (mirroring the reference API's load-once lifespan), Viterbi
decode via the model's ``decode``, BIO→span conversion via the shared
``core.extractor.bio_decode`` (E7 semantics).

``BertCrfTagger`` requires torch+transformers (absent in this container) —
construction raises cleanly without them; ``FakeSequenceTagger`` drives the
identical decode path in tests so the Spark plumbing is exercised.
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
    """BERT-CRF tagger surface (reference ``pipeline.py:233-270``).

    Loads lazily per process: tokenizer + model once, batch tokenize with
    offset mappings, ``model.decode`` (CRF Viterbi), then shared BIO decode.
    """

    def __init__(self, model_path: str, max_length: int = 128, device: str = "cpu"):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - absent in this container
            raise ImportError(
                "BertCrfTagger requires torch+transformers; use RulesTagger "
                "or provide the dependencies on the cluster image"
            ) from e
        self.model_path = model_path
        self.max_length = max_length
        self.device = device
        self._model = None
        self._tokenizer = None

    def _load(self):  # pragma: no cover - needs torch
        from transformers import AutoTokenizer

        self._tokenizer = AutoTokenizer.from_pretrained(self.model_path)
        raise NotImplementedError(
            "model weights are not shipped with the reference repo "
            "(.MISSING_LARGE_BLOBS); plug a trained checkpoint here"
        )

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:  # pragma: no cover
        if self._model is None:
            self._load()
        encoding = self._tokenizer(
            texts,
            truncation=True,
            max_length=self.max_length,
            return_offsets_mapping=True,
            padding=True,
            return_tensors="pt",
        )
        offsets = encoding.pop("offset_mapping").tolist()
        masks = encoding["attention_mask"].tolist()
        predictions = self._model.decode(
            input_ids=encoding["input_ids"].to(self.device),
            attention_mask=encoding["attention_mask"].to(self.device),
        )
        return [
            bio_decode(text, pred, off, mask)
            for text, pred, off, mask in zip(texts, predictions, offsets, masks)
        ]


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
