"""Numpy BERT-CRF sequence tagger (E3/E4/E5) — dependency-free inference.

The reference ships a torch BERT-CRF (``src/address_parser/models/
bert_crf.py``): CRF layer with start/end/pairwise transitions and batched
Viterbi decode (``bert_crf.py:177-222``), a BERT encoder + linear
classification head producing emissions (``bert_crf.py:296-356``), and a
directory checkpoint format (``bert_crf.py:395-439``). Its trained weights
are stripped from the repo (``.MISSING_LARGE_BLOBS``), and torch /
transformers are not installed in this environment — so this module
re-implements the full *inference* path in numpy:

- :class:`CRF` — batched Viterbi decode with the exact recurrence and
  masking semantics of the reference (score/history/backtrack through
  ``seq_ends``), plus the forward-algorithm log-likelihood (E6) so the
  decode can be property-tested against brute-force enumeration.
- :class:`NumpyBertEncoder` — post-LayerNorm transformer encoder (BERT
  architecture: word+position+type embeddings, multi-head self-attention,
  GELU FFN) + linear classifier → per-token emissions.
- :class:`WordPieceTokenizer` — HF-convention fast tokenizer: basic
  whitespace/punctuation split with character offsets, greedy
  longest-match WordPiece, ``[CLS]``/``[SEP]`` specials with (0,0) offset
  mapping, batch padding + attention masks.
- Directory checkpoints (``config.json`` + ``vocab.txt`` + ``weights.npz``)
  mirroring the reference's ``save_pretrained`` layout, with
  :func:`make_random_checkpoint` producing deterministic seeded weights so
  the whole path is testable without shipped blobs.

Everything is pure numpy: inside a Spark ``mapInPandas`` worker the model
loads once per Python worker and decodes Arrow batches as whole-tensor
ops — no per-token Python in the encoder or the Viterbi DP loop body
(the DP loops over sequence positions, vectorized across batch × tags).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from indian_address_parser_spark.core.schemas import BIO_LABELS

# ---------------------------------------------------------------------------
# CRF (reference bert_crf.py:16-222)
# ---------------------------------------------------------------------------


class CRF:
    """Linear-chain CRF: batched Viterbi decode + forward log-likelihood.

    Parameters follow the reference layout: ``transitions[i, j]`` is the
    score of moving FROM tag i TO tag j; ``start_transitions``/
    ``end_transitions`` score the first/last tag of each sequence.
    """

    def __init__(self, transitions: np.ndarray, start: np.ndarray, end: np.ndarray):
        self.num_tags = transitions.shape[0]
        assert transitions.shape == (self.num_tags, self.num_tags)
        assert start.shape == (self.num_tags,) and end.shape == (self.num_tags,)
        self.transitions = transitions.astype(np.float64)
        self.start_transitions = start.astype(np.float64)
        self.end_transitions = end.astype(np.float64)

    def decode(self, emissions: np.ndarray, mask: np.ndarray | None = None) -> list[list[int]]:
        """Viterbi decode. ``emissions`` (batch, seq, tags); ``mask``
        (batch, seq) bool — True for real tokens. Returns per-sample best
        tag sequences truncated to each sample's true length (reference
        ``_viterbi_decode`` semantics, bert_crf.py:177-222)."""
        emissions = np.asarray(emissions, dtype=np.float64)
        if mask is None:
            mask = np.ones(emissions.shape[:2], dtype=bool)
        mask = np.asarray(mask, dtype=bool)
        # reference transposes to time-major
        em = emissions.transpose(1, 0, 2)  # (S, B, T)
        mk = mask.transpose(1, 0)  # (S, B)
        seq_length, batch_size, num_tags = em.shape

        score = self.start_transitions + em[0]  # (B, T)
        history = np.empty((max(seq_length - 1, 0), batch_size, num_tags), dtype=np.int64)

        for i in range(1, seq_length):
            # (B, prev, next): score[b, p] + transitions[p, n] + emissions[i][b, n]
            next_score = score[:, :, None] + self.transitions[None, :, :] + em[i][:, None, :]
            indices = next_score.argmax(axis=1)  # (B, T) best prev per next
            best = np.take_along_axis(next_score, indices[:, None, :], axis=1)[:, 0, :]
            score = np.where(mk[i][:, None], best, score)
            history[i - 1] = indices

        score = score + self.end_transitions
        seq_ends = mk.astype(np.int64).sum(axis=0) - 1  # (B,)

        # Vectorized backtrack: walk history from the longest sequence down,
        # updating only samples whose (masked) sequence reaches that step —
        # identical output to the reference's per-sample loop.
        best_last = score.argmax(axis=1)  # (B,)
        rows = np.arange(batch_size)
        # tags_rev[k] = tag at position seq_ends - k for each sample
        out_tags = np.zeros((seq_length, batch_size), dtype=np.int64)
        out_tags[0] = best_last
        cur = best_last.copy()
        step = np.ones(batch_size, dtype=np.int64)  # next write index per sample
        for h in range(seq_length - 2, -1, -1):
            active = h < seq_ends  # history[:seq_ends] consumed in reverse
            prev = history[h][rows, cur]
            cur = np.where(active, prev, cur)
            # write prev tag for active samples at their current step
            w = np.where(active)[0]
            out_tags[step[w], w] = prev[w]
            step[w] += 1
        return [
            list(out_tags[: seq_ends[b] + 1, b][::-1]) for b in range(batch_size)
        ]

    # -- forward algorithm (E6; reference bert_crf.py:51-88 + 143-175) -----

    def log_likelihood(
        self, emissions: np.ndarray, tags: np.ndarray, mask: np.ndarray | None = None
    ) -> np.ndarray:
        """Per-sample log P(tags | emissions) (the reference loss is the
        negated mean/sum of this)."""
        emissions = np.asarray(emissions, dtype=np.float64)
        tags = np.asarray(tags, dtype=np.int64)
        if mask is None:
            mask = np.ones(tags.shape, dtype=bool)
        mask = np.asarray(mask, dtype=bool)
        em = emissions.transpose(1, 0, 2)
        tg = tags.transpose(1, 0)
        mk = mask.transpose(1, 0)
        return self._score(em, tg, mk) - self._normalizer(em, mk)

    def _score(self, em: np.ndarray, tg: np.ndarray, mk: np.ndarray) -> np.ndarray:
        # pytorch-crf formulation (each emission counted exactly once).
        # Deliberate deviation: the reference's ``_compute_score``
        # (bert_crf.py:113-141) adds the final real emission TWICE for
        # right-padded sequences (the position loop already covered it when
        # i ≤ seq-2, then the "last emission" line re-adds it) — a training
        # -loss quirk we do not reproduce since this engine never trains;
        # decode parity is unaffected (Viterbi uses emissions directly).
        seq_length, batch_size = tg.shape
        mf = mk.astype(np.float64)
        rows = np.arange(batch_size)
        score = self.start_transitions[tg[0]] + em[0, rows, tg[0]]
        for i in range(1, seq_length):
            step = self.transitions[tg[i - 1], tg[i]] + em[i, rows, tg[i]]
            score = score + step * mf[i]
        last_idx = mk.astype(np.int64).sum(axis=0) - 1
        last_tags = tg[last_idx, rows]
        score = score + self.end_transitions[last_tags]
        return score

    def _normalizer(self, em: np.ndarray, mk: np.ndarray) -> np.ndarray:
        seq_length = em.shape[0]
        score = self.start_transitions + em[0]  # (B, T)
        for i in range(1, seq_length):
            nxt = score[:, :, None] + self.transitions[None, :, :] + em[i][:, None, :]
            m = nxt.max(axis=1, keepdims=True)
            nxt = np.log(np.exp(nxt - m).sum(axis=1)) + m[:, 0, :]
            score = np.where(mk[i][:, None], nxt, score)
        score = score + self.end_transitions
        m = score.max(axis=1, keepdims=True)
        return np.log(np.exp(score - m).sum(axis=1)) + m[:, 0]


# ---------------------------------------------------------------------------
# WordPiece tokenizer (HF fast-tokenizer conventions)
# ---------------------------------------------------------------------------

_BASIC_SPLIT = re.compile(r"\w+|[^\w\s]", re.UNICODE)


class WordPieceTokenizer:
    """Minimal HF-convention WordPiece tokenizer with offset mappings.

    Basic split: maximal runs of word chars, or single punctuation chars
    (offsets into the ORIGINAL string); each word then greedy longest-match
    WordPiece against the vocab (continuations prefixed ``##``), falling
    back to ``[UNK]`` for the whole word. Special tokens get offset (0, 0),
    which the downstream BIO decode skips (core/extractor.py bio_decode).
    """

    PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"

    def __init__(self, vocab: list[str], lowercase: bool = False):
        self.vocab = list(vocab)
        self.token2id = {t: i for i, t in enumerate(self.vocab)}
        for special in (self.PAD, self.UNK, self.CLS, self.SEP):
            if special not in self.token2id:
                raise ValueError(f"vocab missing special token {special}")
        self.pad_id = self.token2id[self.PAD]
        self.unk_id = self.token2id[self.UNK]
        self.cls_id = self.token2id[self.CLS]
        self.sep_id = self.token2id[self.SEP]
        self.lowercase = lowercase

    def _wordpiece(self, word: str, base: int) -> list[tuple[int, int, int]]:
        """word → [(token_id, start, end)] with offsets into the original."""
        pieces: list[tuple[int, int, int]] = []
        i = 0
        while i < len(word):
            j = len(word)
            found = None
            while j > i:
                sub = word[i:j]
                cand = sub if i == 0 else "##" + sub
                tid = self.token2id.get(cand)
                if tid is not None:
                    found = (tid, base + i, base + j)
                    break
                j -= 1
            if found is None:
                return [(self.unk_id, base, base + len(word))]
            pieces.append(found)
            i = found[2] - base
        return pieces

    def encode_batch(self, texts: list[str], max_length: int = 128):
        """→ dict(input_ids, attention_mask, offset_mapping) as numpy arrays
        padded to the batch max (≤ max_length)."""
        all_ids: list[list[int]] = []
        all_offsets: list[list[tuple[int, int]]] = []
        for text in texts:
            src = text.lower() if self.lowercase else text
            ids = [self.cls_id]
            offsets: list[tuple[int, int]] = [(0, 0)]
            for m in _BASIC_SPLIT.finditer(src):
                for tid, s, e in self._wordpiece(m.group(0), m.start()):
                    ids.append(tid)
                    offsets.append((s, e))
                if len(ids) >= max_length - 1:
                    break
            ids = ids[: max_length - 1]
            offsets = offsets[: max_length - 1]
            ids.append(self.sep_id)
            offsets.append((0, 0))
            all_ids.append(ids)
            all_offsets.append(offsets)

        width = max(len(ids) for ids in all_ids) if all_ids else 1
        n = len(all_ids)
        input_ids = np.full((n, width), self.pad_id, dtype=np.int64)
        attention = np.zeros((n, width), dtype=np.int64)
        offset_map = np.zeros((n, width, 2), dtype=np.int64)
        for r, (ids, offs) in enumerate(zip(all_ids, all_offsets)):
            input_ids[r, : len(ids)] = ids
            attention[r, : len(ids)] = 1
            offset_map[r, : len(offs)] = offs
        return {
            "input_ids": input_ids,
            "attention_mask": attention,
            "offset_mapping": offset_map,
        }


# ---------------------------------------------------------------------------
# BERT encoder + classifier (reference bert_crf.py:235-356, numpy)
# ---------------------------------------------------------------------------


def _layer_norm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray, eps: float = 1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


try:  # exact erf GELU (BERT's activation) when scipy is available
    from scipy.special import erf as _erf

    def _gelu(x: np.ndarray) -> np.ndarray:
        return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))

except ImportError:  # pragma: no cover - tanh approximation BERT also ships
    def _gelu(x: np.ndarray) -> np.ndarray:
        return (
            0.5
            * x
            * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * np.power(x, 3))))
        )


class NumpyBertEncoder:
    """Post-LN transformer encoder + token classification head.

    ``weights`` is a flat dict (see :func:`make_random_checkpoint` for the
    key layout). All ops are whole-tensor numpy — one call processes an
    entire Arrow batch.
    """

    def __init__(self, config: dict, weights: dict):
        self.cfg = config
        self.w = weights

    def emissions(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        """(B, S) ids + mask → (B, S, num_labels) float64 logits."""
        w = self.w
        B, S = input_ids.shape
        H = self.cfg["num_heads"]
        x = (
            w["embeddings.word"][input_ids]
            + w["embeddings.position"][:S][None, :, :]
            + w["embeddings.token_type"][0][None, None, :]
        )
        x = _layer_norm(x, w["embeddings.ln.gamma"], w["embeddings.ln.beta"])

        # additive attention bias: -1e9 on padded KEY positions
        bias = (1.0 - attention_mask[:, None, None, :].astype(np.float64)) * -1e9

        for i in range(self.cfg["num_layers"]):
            p = f"layer{i}."
            q = x @ w[p + "attn.q.w"] + w[p + "attn.q.b"]
            k = x @ w[p + "attn.k.w"] + w[p + "attn.k.b"]
            v = x @ w[p + "attn.v.w"] + w[p + "attn.v.b"]
            D = q.shape[-1]
            dh = D // H

            def split(t):
                return t.reshape(B, S, H, dh).transpose(0, 2, 1, 3)  # (B, H, S, dh)

            qh, kh, vh = split(q), split(k), split(v)
            scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh) + bias
            scores = scores - scores.max(axis=-1, keepdims=True)
            attn = np.exp(scores)
            attn = attn / attn.sum(axis=-1, keepdims=True)
            ctx = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, S, D)
            attn_out = ctx @ w[p + "attn.o.w"] + w[p + "attn.o.b"]
            x = _layer_norm(x + attn_out, w[p + "ln1.gamma"], w[p + "ln1.beta"])

            h = _gelu(x @ w[p + "ffn.w1"] + w[p + "ffn.b1"])
            ffn_out = h @ w[p + "ffn.w2"] + w[p + "ffn.b2"]
            x = _layer_norm(x + ffn_out, w[p + "ln2.gamma"], w[p + "ln2.beta"])

        return x @ w["classifier.w"] + w["classifier.b"]


# ---------------------------------------------------------------------------
# checkpoint I/O (reference bert_crf.py:395-439 directory layout)
# ---------------------------------------------------------------------------


class BertCrfModel:
    """Loaded checkpoint: tokenizer + encoder + CRF, decode-ready."""

    def __init__(self, tokenizer: WordPieceTokenizer, encoder: NumpyBertEncoder, crf: CRF, config: dict):
        self.tokenizer = tokenizer
        self.encoder = encoder
        self.crf = crf
        self.config = config

    def decode_texts(self, texts: list[str], max_length: int | None = None):
        """texts → (predictions, offset_mapping, attention_mask) per text —
        the tuple the BIO-span decoder consumes."""
        enc = self.tokenizer.encode_batch(
            texts, max_length=max_length or self.config.get("max_length", 128)
        )
        em = self.encoder.emissions(enc["input_ids"], enc["attention_mask"])
        preds = self.crf.decode(em, enc["attention_mask"].astype(bool))
        return preds, enc["offset_mapping"], enc["attention_mask"]

    @classmethod
    def from_pretrained(cls, model_dir: str) -> "BertCrfModel":
        with open(os.path.join(model_dir, "config.json")) as f:
            config = json.load(f)
        with open(os.path.join(model_dir, "vocab.txt"), encoding="utf-8") as f:
            vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        npz = np.load(os.path.join(model_dir, "weights.npz"))
        weights = {k: npz[k] for k in npz.files}
        tokenizer = WordPieceTokenizer(vocab, lowercase=config.get("lowercase", False))
        encoder = NumpyBertEncoder(config, weights)
        crf = CRF(
            weights["crf.transitions"], weights["crf.start"], weights["crf.end"]
        )
        return cls(tokenizer, encoder, crf, config)


def make_random_checkpoint(
    model_dir: str,
    vocab_words: list[str],
    seed: int = 0,
    hidden: int = 32,
    num_layers: int = 2,
    num_heads: int = 2,
    intermediate: int = 64,
    max_position: int = 160,
    num_labels: int = len(BIO_LABELS),
    max_length: int = 128,
) -> str:
    """Write a deterministic seeded checkpoint (test fixture — the reference's
    trained blobs are not shipped; weights here are N(0, σ) with the same
    shapes/layout a trained export would have)."""
    rng = np.random.default_rng(seed)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + sorted(set(vocab_words))
    V = len(vocab)

    def g(*shape, scale=0.05):
        return rng.normal(0.0, scale, size=shape)

    w: dict[str, np.ndarray] = {
        "embeddings.word": g(V, hidden, scale=0.5),
        "embeddings.position": g(max_position, hidden, scale=0.1),
        "embeddings.token_type": g(2, hidden, scale=0.1),
        "embeddings.ln.gamma": np.ones(hidden),
        "embeddings.ln.beta": np.zeros(hidden),
        "classifier.w": g(hidden, num_labels, scale=0.5),
        "classifier.b": np.zeros(num_labels),
        "crf.transitions": rng.uniform(-0.1, 0.1, size=(num_labels, num_labels)),
        "crf.start": rng.uniform(-0.1, 0.1, size=num_labels),
        "crf.end": rng.uniform(-0.1, 0.1, size=num_labels),
    }
    for i in range(num_layers):
        p = f"layer{i}."
        w.update(
            {
                p + "attn.q.w": g(hidden, hidden),
                p + "attn.q.b": np.zeros(hidden),
                p + "attn.k.w": g(hidden, hidden),
                p + "attn.k.b": np.zeros(hidden),
                p + "attn.v.w": g(hidden, hidden),
                p + "attn.v.b": np.zeros(hidden),
                p + "attn.o.w": g(hidden, hidden),
                p + "attn.o.b": np.zeros(hidden),
                p + "ln1.gamma": np.ones(hidden),
                p + "ln1.beta": np.zeros(hidden),
                p + "ffn.w1": g(hidden, intermediate),
                p + "ffn.b1": np.zeros(intermediate),
                p + "ffn.w2": g(intermediate, hidden),
                p + "ffn.b2": np.zeros(hidden),
                p + "ln2.gamma": np.ones(hidden),
                p + "ln2.beta": np.zeros(hidden),
            }
        )

    os.makedirs(model_dir, exist_ok=True)
    np.savez(os.path.join(model_dir, "weights.npz"), **w)
    with open(os.path.join(model_dir, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    config = {
        "vocab_size": V,
        "hidden_size": hidden,
        "num_layers": num_layers,
        "num_heads": num_heads,
        "intermediate_size": intermediate,
        "max_position": max_position,
        "num_labels": num_labels,
        "max_length": max_length,
        "lowercase": False,
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return model_dir
