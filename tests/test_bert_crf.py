"""BERT-CRF numpy inference stack (E3/E4/E5/E6).

Reference parity targets:
- CRF Viterbi decode: ``src/address_parser/models/bert_crf.py:177-222``
  (verified here against brute-force enumeration over ALL tag sequences).
- CRF forward log-likelihood: ``bert_crf.py:51-88,143-175`` (brute force:
  log softmax over every path's score).
- checkpoint-dir load + batched decode: ``bert_crf.py:395-439`` with
  deterministic seeded weights standing in for the stripped trained blobs.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from indian_address_parser_spark.core.schemas import BIO_LABELS
from indian_address_parser_spark.operators.bert_crf_np import (
    CRF,
    BertCrfModel,
    WordPieceTokenizer,
    make_random_checkpoint,
)


def _random_crf(rng, T):
    return CRF(
        rng.normal(size=(T, T)),
        rng.normal(size=T),
        rng.normal(size=T),
    )


def _path_score(crf, em_row, tags):
    """Score of one tag path on one (unpadded) sequence."""
    s = crf.start_transitions[tags[0]] + em_row[0, tags[0]]
    for i in range(1, len(tags)):
        s += crf.transitions[tags[i - 1], tags[i]] + em_row[i, tags[i]]
    return s + crf.end_transitions[tags[-1]]


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(7)
    T, B, S = 4, 6, 5
    crf = _random_crf(rng, T)
    em = rng.normal(size=(B, S, T))
    lengths = rng.integers(1, S + 1, size=B)
    mask = np.arange(S)[None, :] < lengths[:, None]

    got = crf.decode(em, mask)
    for b in range(B):
        L = lengths[b]
        best = max(
            itertools.product(range(T), repeat=L),
            key=lambda tags: _path_score(crf, em[b], tags),
        )
        assert got[b] == list(best), f"sample {b}"


def test_viterbi_no_mask_full_length():
    rng = np.random.default_rng(11)
    T, B, S = 3, 4, 4
    crf = _random_crf(rng, T)
    em = rng.normal(size=(B, S, T))
    got = crf.decode(em)  # mask=None → all positions real
    for b in range(B):
        best = max(
            itertools.product(range(T), repeat=S),
            key=lambda tags: _path_score(crf, em[b], tags),
        )
        assert got[b] == list(best)


def test_log_likelihood_matches_bruteforce():
    rng = np.random.default_rng(13)
    T, B, S = 3, 4, 4
    crf = _random_crf(rng, T)
    em = rng.normal(size=(B, S, T))
    lengths = rng.integers(1, S + 1, size=B)
    mask = np.arange(S)[None, :] < lengths[:, None]
    tags = rng.integers(0, T, size=(B, S))

    got = crf.log_likelihood(em, tags, mask)
    for b in range(B):
        L = lengths[b]
        scores = np.array(
            [
                _path_score(crf, em[b], path)
                for path in itertools.product(range(T), repeat=L)
            ]
        )
        m = scores.max()
        logz = m + np.log(np.exp(scores - m).sum())
        want = _path_score(crf, em[b], tuple(tags[b][:L])) - logz
        assert got[b] == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

VOCAB_WORDS = [
    "H", "NO", "45", "BLOCK", "C", "LAJPAT", "NAGAR", "NEW", "DELHI",
    "110024", ",", ".", "GALI", "##024", "110", "HOUSE",
]


def test_wordpiece_offsets_roundtrip():
    tok = WordPieceTokenizer(["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + VOCAB_WORDS)
    text = "H NO 45, LAJPAT NAGAR, NEW DELHI 110024"
    enc = tok.encode_batch([text])
    ids = enc["input_ids"][0]
    offs = enc["offset_mapping"][0]
    mask = enc["attention_mask"][0]
    assert ids[0] == tok.cls_id and tuple(offs[0]) == (0, 0)
    sep_pos = int(mask.sum()) - 1
    assert ids[sep_pos] == tok.sep_id and tuple(offs[sep_pos]) == (0, 0)
    # every non-special offset slices back to a piece of the original text
    for i in range(1, sep_pos):
        s, e = offs[i]
        assert 0 <= s < e <= len(text)
        piece = tok.vocab[ids[i]].removeprefix("##")
        if piece != "[UNK]":
            assert text[s:e] == piece
    # greedy longest-match: whole-word "110024" wins over "110"+"##024"
    toks = [tok.vocab[i] for i in ids[1:sep_pos]]
    assert "110024" in toks


def test_wordpiece_greedy_continuation():
    tok = WordPieceTokenizer(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "110", "##041", "##0", "##41"]
    )
    enc = tok.encode_batch(["110041"])
    ids = enc["input_ids"][0]
    mask = enc["attention_mask"][0]
    toks = [tok.vocab[i] for i in ids[1 : int(mask.sum()) - 1]]
    assert toks == ["110", "##041"]  # longest continuation match
    offs = enc["offset_mapping"][0]
    assert tuple(offs[1]) == (0, 3) and tuple(offs[2]) == (3, 6)


def test_wordpiece_unk_covers_whole_word():
    tok = WordPieceTokenizer(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "A"])
    enc = tok.encode_batch(["A ZZZ"])
    ids, offs = enc["input_ids"][0], enc["offset_mapping"][0]
    assert tok.vocab[ids[2]] == "[UNK]"
    assert tuple(offs[2]) == (2, 5)


# ---------------------------------------------------------------------------
# end-to-end checkpoint → decode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("bert_crf_ckpt")
    return make_random_checkpoint(str(d), VOCAB_WORDS, seed=42)


def test_checkpoint_decode_valid_and_deterministic(ckpt):
    model = BertCrfModel.from_pretrained(ckpt)
    texts = [
        "H NO 45, LAJPAT NAGAR, NEW DELHI 110024",
        "HOUSE NO 45 BLOCK C GALI 110",
        "NEW DELHI",
    ]
    preds, offs, masks = model.decode_texts(texts)
    n_labels = model.config["num_labels"]
    assert n_labels == len(BIO_LABELS)
    for row, text in enumerate(texts):
        real = int(masks[row].sum())
        assert len(preds[row]) == real
        assert all(0 <= t < n_labels for t in preds[row])
    # deterministic
    preds2, _, _ = model.decode_texts(texts)
    assert [list(p) for p in preds] == [list(p) for p in preds2]


def test_padding_invariance(ckpt):
    """Decoding a text alone == decoding it inside a padded batch — the
    attention-mask bias and CRF mask must make padding inert."""
    model = BertCrfModel.from_pretrained(ckpt)
    short = "NEW DELHI"
    long = "H NO 45, LAJPAT NAGAR, NEW DELHI 110024 HOUSE NO 45 BLOCK C"
    solo, _, _ = model.decode_texts([short])
    batched, _, _ = model.decode_texts([short, long])
    assert list(solo[0]) == list(batched[0])


def test_decode_emissions_crf_agree_with_bruteforce(ckpt):
    """The full model's decode equals brute-force Viterbi on its own
    emissions — ties together encoder, mask handling and the CRF."""
    model = BertCrfModel.from_pretrained(ckpt)
    text = "NEW DELHI 45"
    enc = model.tokenizer.encode_batch([text], max_length=16)
    em = model.encoder.emissions(enc["input_ids"], enc["attention_mask"])
    L = int(enc["attention_mask"][0].sum())
    # brute force is exponential in L — trim tags to the argmax-topK set to
    # keep the product tractable while still exercising transitions
    top = np.argsort(-em[0][:L], axis=1)[:, :3]
    cand_tags = sorted(set(top.flatten().tolist()))
    best = max(
        itertools.product(cand_tags, repeat=L),
        key=lambda tags: _path_score(model.crf, em[0], tags),
    )
    got = model.crf.decode(em, enc["attention_mask"].astype(bool))[0]
    if all(t in cand_tags for t in got):
        # viterbi's optimum lies in the restricted set → must equal restricted max
        assert got == list(best)
    # and always: viterbi path scores ≥ restricted brute-force max
    assert _path_score(model.crf, em[0], tuple(got)) >= _path_score(
        model.crf, em[0], best
    ) - 1e-9


# ---------------------------------------------------------------------------
# Spark end-to-end (mapInPandas, model loaded once per worker)
# ---------------------------------------------------------------------------


def test_spark_tag_texts_bert_crf(spark, ckpt):
    from indian_address_parser_spark.operators.tagger import BertCrfTagger, tag_texts

    df = spark.createDataFrame(
        [
            ("H NO 45, LAJPAT NAGAR, NEW DELHI 110024",),
            ("HOUSE NO 45 BLOCK C GALI 110",),
            ("NEW DELHI",),
        ],
        ["text"],
    )
    out = tag_texts(df, lambda: BertCrfTagger(ckpt)).collect()
    assert len(out) == 3
    labels = set(BIO_LABELS)
    for row in out:
        assert row["normalized"]
        for ent in row["entities"]:
            assert 0 <= ent["start"] <= ent["end"] <= len(row["normalized"])
            # entity labels come from the BIO space minus the B-/I- prefix
            assert (
                f"B-{ent['label']}" in labels or ent["label"] in ("O",)
            ), ent["label"]
