"""Round-trip tests for the torch/HF → npz checkpoint converter.

The fixture is a synthetic state_dict in the reference's exact export layout
(reference ``src/address_parser/models/bert_crf.py:396-417``): HF BERT weight
names under ``bert.*``, torch ``(out, in)`` Linear orientation, ``crf.*``
parameters, written with the torch zip serialization format (no torch in this
container — the writer emits the format from numpy).
"""

import json
import os

import numpy as np
import pytest

from indian_address_parser_spark.operators.bert_crf_np import (
    BertCrfModel,
    make_random_checkpoint,
)
from indian_address_parser_spark.operators.checkpoint_convert import (
    convert_checkpoint,
    export_state_dict,
    map_state_dict,
    read_torch_state_dict,
    write_torch_state_dict,
)

VOCAB_WORDS = [
    "house",
    "no",
    "12",
    "mg",
    "road",
    "shivaji",
    "nagar",
    "pune",
    "411001",
    "flat",
    "##01",
    "##ar",
]

TEXTS = [
    "house no 12 mg road shivaji nagar pune 411001",
    "flat 12 shivaji road",
    "",
]


@pytest.fixture(scope="module")
def direct_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_npz")
    make_random_checkpoint(str(d), VOCAB_WORDS, seed=7)
    return BertCrfModel.from_pretrained(str(d)), str(d)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory, direct_model):
    """Write the same weights as a reference-layout torch checkpoint dir."""
    model, npz_dir = direct_model
    d = tmp_path_factory.mktemp("ckpt_hf")
    sd = export_state_dict(model.encoder.w | {
        "crf.transitions": model.crf.transitions,
        "crf.start": model.crf.start_transitions,
        "crf.end": model.crf.end_transitions,
    })
    # torch trains/saves float32; keep float64 here so the round-trip is exact
    write_torch_state_dict(os.path.join(d, "pytorch_model.bin"), sd)
    with open(os.path.join(npz_dir, "vocab.txt")) as f:
        vocab_txt = f.read()
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write(vocab_txt)
    cfg = model.config
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(
            {
                "model_name": "bert-base-multilingual-cased",
                "num_labels": cfg["num_labels"],
                "use_crf": True,
                "hidden_size": cfg["hidden_size"],
                "classifier_dropout": 0.1,
                "num_attention_heads": cfg["num_heads"],
            },
            f,
        )
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"do_lower_case": False}, f)
    return str(d)


def test_zip_roundtrip_preserves_arrays(tmp_path):
    state = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.bias": np.linspace(-1, 1, 5),
        "c.ids": np.array([3, 1, 2], dtype=np.int64),
        "d.flag": np.array([True, False]),
    }
    p = str(tmp_path / "m.bin")
    write_torch_state_dict(p, state)
    back = read_torch_state_dict(p)
    assert list(back) == list(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])
        assert back[k].dtype == np.ascontiguousarray(state[k]).dtype


def test_reader_rejects_arbitrary_globals(tmp_path):
    import pickle
    import zipfile

    p = str(tmp_path / "evil.bin")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(os.system))
    with pytest.raises(pickle.UnpicklingError):
        read_torch_state_dict(p)


def test_map_state_dict_transposes_linears(direct_model):
    model, _ = direct_model
    w = model.encoder.w | {
        "crf.transitions": model.crf.transitions,
        "crf.start": model.crf.start_transitions,
        "crf.end": model.crf.end_transitions,
    }
    sd = export_state_dict(w)
    # torch orientation: classifier.weight is (num_labels, hidden)
    assert sd["classifier.weight"].shape == (
        model.config["num_labels"],
        model.config["hidden_size"],
    )
    back = map_state_dict(sd)
    for k in w:
        np.testing.assert_array_equal(back[k], np.asarray(w[k]))


def test_convert_checkpoint_decodes_identically(direct_model, hf_dir, tmp_path):
    model_a, _ = direct_model
    dst = str(tmp_path / "converted")
    convert_checkpoint(hf_dir, dst)
    model_b = BertCrfModel.from_pretrained(dst)

    assert model_b.config["num_layers"] == model_a.config["num_layers"]
    assert model_b.config["num_heads"] == model_a.config["num_heads"]
    assert model_b.config["hidden_size"] == model_a.config["hidden_size"]

    preds_a, offs_a, mask_a = model_a.decode_texts(TEXTS)
    preds_b, offs_b, mask_b = model_b.decode_texts(TEXTS)
    assert preds_a == preds_b
    np.testing.assert_array_equal(offs_a, offs_b)
    np.testing.assert_array_equal(mask_a, mask_b)

    enc = model_a.tokenizer.encode_batch(TEXTS[:2])
    em_a = model_a.encoder.emissions(enc["input_ids"], enc["attention_mask"])
    em_b = model_b.encoder.emissions(enc["input_ids"], enc["attention_mask"])
    np.testing.assert_allclose(em_a, em_b, rtol=0, atol=0)


def test_convert_honors_explicit_num_heads(direct_model, hf_dir, tmp_path):
    dst = str(tmp_path / "converted_heads")
    model_a, _ = direct_model
    convert_checkpoint(hf_dir, dst, num_heads=model_a.config["num_heads"])
    cfg = json.load(open(os.path.join(dst, "config.json")))
    assert cfg["num_heads"] == model_a.config["num_heads"]


def test_convert_infers_heads_without_config(direct_model, hf_dir, tmp_path):
    """With neither an explicit num_heads nor num_attention_heads in the
    config, the converter falls back to the BERT head-size convention
    max(1, hidden // 64) — which for this tiny 32-wide fixture is 1."""
    import shutil

    src = str(tmp_path / "no_heads_cfg")
    shutil.copytree(hf_dir, src)
    cfg_path = os.path.join(src, "config.json")
    cfg = json.load(open(cfg_path))
    del cfg["num_attention_heads"]
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    dst = str(tmp_path / "converted_fallback")
    convert_checkpoint(src, dst)
    out_cfg = json.load(open(os.path.join(dst, "config.json")))
    assert out_cfg["num_heads"] == 1
    # still loadable and decodable (1 head of width 32)
    model = BertCrfModel.from_pretrained(dst)
    preds, _, _ = model.decode_texts(TEXTS[:1])
    assert len(preds) == 1


def test_reader_rejects_out_of_bounds_tensor(tmp_path):
    """A crafted size/stride that addresses past the storage must be
    rejected before as_strided can alias process memory."""
    import pickle
    import zipfile

    from indian_address_parser_spark.operators.checkpoint_convert import (
        _Global,
        _StateDictPickler,
        _StorageHandle,
        _TensorStub,
    )
    from collections import OrderedDict
    import io

    # 10-element storage, tensor claims 1000 elements
    evil = OrderedDict(
        {"w": _TensorStub(_StorageHandle("0", "FloatStorage", 10), (1000,), (1,))}
    )
    buf = io.BytesIO()
    _StateDictPickler(buf, protocol=2).dump(evil)
    p = str(tmp_path / "oob.bin")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", np.zeros(10, np.float32).tobytes())
    with pytest.raises(pickle.UnpicklingError, match="addresses element"):
        read_torch_state_dict(p)


def test_convert_rejects_vocab_mismatch(hf_dir, tmp_path):
    import shutil

    broken = str(tmp_path / "broken")
    shutil.copytree(hf_dir, broken)
    with open(os.path.join(broken, "vocab.txt"), "a") as f:
        f.write("extraword\n")
    with pytest.raises(ValueError, match="vocab.txt"):
        convert_checkpoint(broken, str(tmp_path / "out"))


@pytest.fixture()
def hf_quirk_dir(hf_dir, tmp_path):
    """Same weights re-exported with real-world HF naming quirks: gamma/beta
    LayerNorm aliases (pre-2019 / TF-converted exports), a tied MLM decoder
    aliasing the word-embedding matrix, its bias, and a position_ids buffer."""
    import shutil

    src = str(tmp_path / "hf_quirks")
    shutil.copytree(hf_dir, src)
    sd = read_torch_state_dict(os.path.join(hf_dir, "pytorch_model.bin"))
    quirked = {}
    for name, arr in sd.items():
        name = name.replace(".LayerNorm.weight", ".LayerNorm.gamma").replace(
            ".LayerNorm.bias", ".LayerNorm.beta"
        )
        quirked[name] = arr
    emb = sd["bert.embeddings.word_embeddings.weight"]
    quirked["cls.predictions.decoder.weight"] = emb  # tied embeddings
    quirked["cls.predictions.bias"] = np.zeros(emb.shape[0])
    quirked["bert.embeddings.position_ids"] = np.arange(
        sd["bert.embeddings.position_embeddings.weight"].shape[0], dtype=np.int64
    )
    write_torch_state_dict(os.path.join(src, "pytorch_model.bin"), quirked)
    return src


def test_convert_handles_hf_quirk_names(direct_model, hf_quirk_dir, tmp_path):
    """gamma/beta aliases + tied decoder + buffers convert to a model that
    decodes bit-identically to the directly-built one."""
    model_a, _ = direct_model
    dst = str(tmp_path / "converted_quirks")
    convert_checkpoint(hf_quirk_dir, dst)
    model_b = BertCrfModel.from_pretrained(dst)
    preds_a, _, _ = model_a.decode_texts(TEXTS)
    preds_b, _, _ = model_b.decode_texts(TEXTS)
    assert preds_a == preds_b


def test_map_state_dict_reports_missing_keys(hf_dir):
    sd = read_torch_state_dict(os.path.join(hf_dir, "pytorch_model.bin"))
    del sd["crf.start_transitions"]
    del sd["bert.encoder.layer.0.intermediate.dense.bias"]
    with pytest.raises(ValueError, match=r"absent.*crf\.start"):
        map_state_dict(sd)


def test_map_state_dict_reports_unmapped_keys(hf_dir):
    sd = read_torch_state_dict(os.path.join(hf_dir, "pytorch_model.bin"))
    sd["bert.encoder.layer.0.adapter.down.weight"] = np.zeros((4, 4))
    with pytest.raises(ValueError, match="unmapped.*adapter"):
        map_state_dict(sd)


def _set_id2label(src_dir: str, labels: list[str]) -> None:
    cfg_path = os.path.join(src_dir, "config.json")
    cfg = json.load(open(cfg_path))
    cfg["id2label"] = {str(i): lab for i, lab in enumerate(labels)}
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)


def test_convert_rejects_reordered_id2label(hf_dir, tmp_path):
    """Same-size but reordered label set must fail loudly — the npz runtime
    decodes through the fixed BIO_LABELS order, so accepting it would emit
    silently wrong entity labels (ADVICE r3)."""
    import shutil

    from indian_address_parser_spark.core.schemas import BIO_LABELS

    src = str(tmp_path / "reordered")
    shutil.copytree(hf_dir, src)
    n = json.load(open(os.path.join(src, "config.json")))["num_labels"]
    _set_id2label(src, list(reversed(BIO_LABELS[:n])))
    with pytest.raises(ValueError, match="id2label"):
        convert_checkpoint(src, str(tmp_path / "out_reordered"))


def test_convert_accepts_and_persists_matching_id2label(hf_dir, tmp_path):
    import shutil

    from indian_address_parser_spark.core.schemas import BIO_LABELS

    src = str(tmp_path / "labeled")
    shutil.copytree(hf_dir, src)
    n = json.load(open(os.path.join(src, "config.json")))["num_labels"]
    _set_id2label(src, list(BIO_LABELS[:n]))
    dst = str(tmp_path / "out_labeled")
    convert_checkpoint(src, dst)
    out_cfg = json.load(open(os.path.join(dst, "config.json")))
    assert out_cfg["id2label"] == {str(i): BIO_LABELS[i] for i in range(n)}


def _rewrite_cfg(src: str, **updates) -> None:
    cfg_path = os.path.join(src, "config.json")
    cfg = json.load(open(cfg_path))
    cfg.update(updates)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)


def test_convert_rejects_truncated_top_layers(hf_dir, tmp_path):
    """Dropping ENTIRE top encoder layers keeps the remaining ids
    contiguous and every per-present-layer key intact — only the declared
    num_hidden_layers can catch the silently-shallower model."""
    import re
    import shutil

    src = str(tmp_path / "truncated")
    shutil.copytree(hf_dir, src)
    bin_path = os.path.join(src, "pytorch_model.bin")
    sd = read_torch_state_dict(bin_path)
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
        }
    )
    assert len(layer_ids) >= 2, "fixture must be deep enough to truncate"
    top = layer_ids[-1]
    sd = {k: v for k, v in sd.items() if f"encoder.layer.{top}." not in k}
    write_torch_state_dict(bin_path, sd)
    _rewrite_cfg(src, num_hidden_layers=len(layer_ids))
    with pytest.raises(ValueError, match="num_hidden_layers"):
        convert_checkpoint(src, str(tmp_path / "out_truncated"))


def test_convert_accepts_matching_num_hidden_layers(hf_dir, tmp_path):
    import shutil

    from indian_address_parser_spark.operators.bert_crf_np import BertCrfModel

    src = str(tmp_path / "declared")
    shutil.copytree(hf_dir, src)
    sd = read_torch_state_dict(os.path.join(src, "pytorch_model.bin"))
    import re

    n_layers = len(
        {
            int(m.group(1))
            for k in sd
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
        }
    )
    _rewrite_cfg(src, num_hidden_layers=n_layers)
    dst = str(tmp_path / "out_declared")
    convert_checkpoint(src, dst)
    assert BertCrfModel.from_pretrained(dst).config["num_layers"] == n_layers
