"""Torch/HF checkpoint → npz converter for the numpy BERT-CRF stack.

The reference trains ``BertCRFForTokenClassification`` and exports with
``save_pretrained`` (reference ``src/address_parser/models/bert_crf.py:396-417``):

* ``pytorch_model.bin`` — ``torch.save(model.state_dict())``, i.e. a zip
  archive (torch's public serialization format) whose ``data.pkl`` pickles an
  ``OrderedDict[str, Tensor]`` with per-tensor raw storages under ``data/<n>``
* ``config.json`` — ``{model_name, num_labels, use_crf, hidden_size, ...}``
* HF tokenizer files alongside (``vocab.txt``, ``tokenizer_config.json``)

:class:`~indian_address_parser_spark.operators.bert_crf_np.BertCrfModel` reads
a different, numpy-native layout (``weights.npz`` + ``vocab.txt`` +
``config.json``). :func:`convert_checkpoint` bridges the two so a real trained
export (e.g. the reference's ``models/address_ner_v4``) can drop into the
Spark tagger without torch installed anywhere in the cluster:

* the state_dict is parsed with ``zipfile`` + a restricted
  :class:`pickle.Unpickler` that only admits the handful of globals torch's
  format uses (storage classes, ``_rebuild_tensor_v2``, ``OrderedDict``) —
  anything else raises, so a hostile pickle cannot execute code;
* HF/torch weight names (``bert.embeddings.*``,
  ``bert.encoder.layer.N.attention.*``, ``crf.transitions``, …) map onto the
  npz keys, transposing every ``nn.Linear`` weight from torch's ``(out, in)``
  to the ``x @ w`` ``(in, out)`` orientation the numpy encoder uses.

:func:`write_torch_state_dict` emits the same zip format from plain numpy
arrays (used by tests to synthesise a state_dict-shaped fixture, and usable as
a torch-free exporter); it writes GLOBAL opcodes for ``torch._utils
._rebuild_tensor_v2`` / ``torch.FloatStorage`` without importing torch, so the
output is loadable by real ``torch.load`` as well as by the reader here.
"""

from __future__ import annotations

import io
import json
import os
import pickle
import re
import zipfile
from collections import OrderedDict

import numpy as np

_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype(np.float64),
    "FloatStorage": np.dtype(np.float32),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
_NP_TO_STORAGE = {v: k for k, v in _STORAGE_DTYPES.items()}


# ---------------------------------------------------------------------------
# reading torch's zip serialization format (stdlib only)
# ---------------------------------------------------------------------------


class _StorageType:
    """Stand-in for a ``torch.<T>Storage`` class inside the persistent id."""

    def __init__(self, name: str):
        self.name = name

    def __call__(self, *a, **k):  # pragma: no cover - never instantiated
        raise pickle.UnpicklingError("storage classes are tags, not callables")


def _rebuild_tensor(flat: np.ndarray, offset: int, size, stride, *unused) -> np.ndarray:
    """numpy twin of ``torch._utils._rebuild_tensor_v2`` (storage view → array).

    offset/size/stride come from the (untrusted) pickle, so they are
    bounds-checked against the storage BEFORE ``as_strided`` — otherwise a
    crafted checkpoint could alias process memory far past the buffer
    (info leak into the converted weights, or a segfault). Saved torch
    tensors are contiguous with non-negative strides; anything else is
    rejected."""
    offset = int(offset)
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if offset < 0 or any(s < 0 for s in size) or any(st < 0 for st in stride):
        raise pickle.UnpicklingError("negative tensor offset/size/stride")
    if not size:
        if offset >= flat.size:
            raise pickle.UnpicklingError("scalar offset past end of storage")
        return flat[offset : offset + 1].copy().reshape(())
    if any(s == 0 for s in size):
        return np.zeros(size, dtype=flat.dtype)
    last = offset + sum((s - 1) * st for s, st in zip(size, stride))
    if last >= flat.size:
        raise pickle.UnpicklingError(
            f"tensor (offset={offset}, size={size}, stride={stride}) "
            f"addresses element {last} of a {flat.size}-element storage"
        )
    item = flat.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=size, strides=tuple(s * item for s in stride)
    )
    return np.ascontiguousarray(view)


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler for ``data.pkl``: storages resolve to numpy."""

    def __init__(self, data: bytes, read_record):
        super().__init__(io.BytesIO(data))
        self._read_record = read_record

    def find_class(self, module: str, name: str):
        if module.startswith("torch") and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module.startswith("torch") and name in ("UntypedStorage", "TypedStorage"):
            return _StorageType(name)
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            return _rebuild_tensor
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        raise pickle.UnpicklingError(f"global {module}.{name} is not allowed")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        dtype = _STORAGE_DTYPES.get(getattr(storage_type, "name", ""), None)
        if dtype is None:
            raise pickle.UnpicklingError(f"unsupported storage {storage_type!r}")
        raw = self._read_record(f"data/{key}")
        return np.frombuffer(raw, dtype=dtype, count=int(numel))


def read_torch_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    """Parse a ``torch.save``-format checkpoint into ``{name: ndarray}``."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.split("/")[-1] == "data.pkl"]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl — not a torch zip checkpoint")
        pkl_name = min(pkl_names, key=len)
        root = pkl_name[: -len("data.pkl")]
        data = zf.read(pkl_name)
        state = _TorchUnpickler(data, lambda rel: zf.read(root + rel)).load()
    if not isinstance(state, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(state).__name__}")
    return OrderedDict((k, np.asarray(v)) for k, v in state.items())


# ---------------------------------------------------------------------------
# writing the same format (fixture generator / torch-free exporter)
# ---------------------------------------------------------------------------


class _Global:
    """Marker pickled as a bare GLOBAL opcode (no import, no lookup)."""

    def __init__(self, module: str, name: str):
        self.module, self.name = module, name

    def __call__(self, *a, **k):  # pragma: no cover - satisfies save_reduce's
        raise RuntimeError("pickle-time marker")  # callable check only


class _StorageHandle:
    def __init__(self, key: str, type_name: str, numel: int):
        self.key, self.type_name, self.numel = key, type_name, numel


class _TensorStub:
    def __init__(self, storage: _StorageHandle, shape: tuple, strides: tuple):
        self.storage, self.shape, self.strides = storage, shape, strides


class _StateDictPickler(pickle._Pickler):  # noqa: SLF001 - need overridable save()
    def persistent_id(self, obj):
        if isinstance(obj, _StorageHandle):
            return (
                "storage",
                _Global("torch", obj.type_name),
                obj.key,
                "cpu",
                obj.numel,
            )
        return None

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, _Global):
            self.write(
                pickle.GLOBAL
                + obj.module.encode("utf-8")
                + b"\n"
                + obj.name.encode("utf-8")
                + b"\n"
            )
            return
        if isinstance(obj, _TensorStub):
            self.save_reduce(
                _Global("torch._utils", "_rebuild_tensor_v2"),
                (obj.storage, 0, obj.shape, obj.strides, False, OrderedDict()),
                obj=obj,
            )
            return
        super().save(obj, save_persistent_id)


def write_torch_state_dict(
    path: str, state: dict, root: str = "archive"
) -> str:
    """Write ``{name: ndarray}`` as a ``torch.save``-format zip (no torch)."""
    sd: "OrderedDict[str, _TensorStub]" = OrderedDict()
    storages: list[tuple[str, np.ndarray]] = []
    for i, (name, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(arr)
        type_name = _NP_TO_STORAGE.get(arr.dtype)
        if type_name is None:
            raise ValueError(f"{name}: unsupported dtype {arr.dtype}")
        elem_strides = tuple(s // arr.itemsize for s in arr.strides)
        sd[name] = _TensorStub(
            _StorageHandle(str(i), type_name, int(arr.size)),
            tuple(arr.shape),
            elem_strides,
        )
        storages.append((str(i), arr))
    buf = io.BytesIO()
    _StateDictPickler(buf, protocol=2).dump(sd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", buf.getvalue())
        for key, arr in storages:
            zf.writestr(f"{root}/data/{key}", arr.tobytes())
        zf.writestr(f"{root}/version", "3\n")
    return path


# ---------------------------------------------------------------------------
# HF/torch name layout ↔ npz name layout
# ---------------------------------------------------------------------------

# fixed renames: torch state_dict key → (npz key, transpose?)
_FIXED_MAP = {
    "bert.embeddings.word_embeddings.weight": ("embeddings.word", False),
    "bert.embeddings.position_embeddings.weight": ("embeddings.position", False),
    "bert.embeddings.token_type_embeddings.weight": ("embeddings.token_type", False),
    "bert.embeddings.LayerNorm.weight": ("embeddings.ln.gamma", False),
    "bert.embeddings.LayerNorm.bias": ("embeddings.ln.beta", False),
    "classifier.weight": ("classifier.w", True),
    "classifier.bias": ("classifier.b", False),
    "crf.transitions": ("crf.transitions", False),
    "crf.start_transitions": ("crf.start", False),
    "crf.end_transitions": ("crf.end", False),
}

_LAYER_MAP = {
    "attention.self.query.weight": ("attn.q.w", True),
    "attention.self.query.bias": ("attn.q.b", False),
    "attention.self.key.weight": ("attn.k.w", True),
    "attention.self.key.bias": ("attn.k.b", False),
    "attention.self.value.weight": ("attn.v.w", True),
    "attention.self.value.bias": ("attn.v.b", False),
    "attention.output.dense.weight": ("attn.o.w", True),
    "attention.output.dense.bias": ("attn.o.b", False),
    "attention.output.LayerNorm.weight": ("ln1.gamma", False),
    "attention.output.LayerNorm.bias": ("ln1.beta", False),
    "intermediate.dense.weight": ("ffn.w1", True),
    "intermediate.dense.bias": ("ffn.b1", False),
    "output.dense.weight": ("ffn.w2", True),
    "output.dense.bias": ("ffn.b2", False),
    "output.LayerNorm.weight": ("ln2.gamma", False),
    "output.LayerNorm.bias": ("ln2.beta", False),
}

# present in HF checkpoints but not needed for token-classification inference:
# the pooler head, non-parameter position-id buffers, and the whole MLM
# head under ``cls.`` — including ``cls.predictions.decoder.*``, which in
# tied-embedding exports is a byte-alias of the word-embedding matrix
_IGNORED = re.compile(
    r"^(bert\.pooler\.|bert\.embeddings\.position_ids$|cls\.)"
)

_LAYER_RE = re.compile(r"^bert\.encoder\.layer\.(\d+)\.(.+)$")

# pre-2019 HF exports (and some TF conversions) name LayerNorm parameters
# ``gamma``/``beta`` instead of ``weight``/``bias``
_HF_ALIASES = (
    (re.compile(r"\.LayerNorm\.gamma$"), ".LayerNorm.weight"),
    (re.compile(r"\.LayerNorm\.beta$"), ".LayerNorm.bias"),
)


def _canon_name(name: str) -> str:
    for pat, repl in _HF_ALIASES:
        name = pat.sub(repl, name)
    return name


def map_state_dict(sd: dict) -> "OrderedDict[str, np.ndarray]":
    """HF/torch state_dict names → the npz weight layout (with transposes).

    Raises with an explicit key list on BOTH failure directions: extra
    keys the map does not know (a different architecture — converting
    them silently would drop weights) and missing keys the npz model
    needs (a truncated or differently-structured export — loading would
    otherwise fail later with a bare KeyError deep in the encoder).
    """
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    unmapped: list[str] = []
    for raw_name, arr in sd.items():
        name = _canon_name(raw_name)
        if _IGNORED.match(name):
            continue
        if name in _FIXED_MAP:
            npz_key, transpose = _FIXED_MAP[name]
            out[npz_key] = np.ascontiguousarray(arr.T) if transpose else arr
            continue
        m = _LAYER_RE.match(name)
        if m and m.group(2) in _LAYER_MAP:
            npz_key, transpose = _LAYER_MAP[m.group(2)]
            out[f"layer{m.group(1)}.{npz_key}"] = (
                np.ascontiguousarray(arr.T) if transpose else arr
            )
            continue
        unmapped.append(raw_name)
    if unmapped:
        raise ValueError(
            f"{len(unmapped)} unmapped state_dict keys "
            f"(first 8): {unmapped[:8]}"
        )
    expected = {k for k, _ in _FIXED_MAP.values()}
    for k in out:
        m = re.match(r"^layer(\d+)\.", k)
        if m:
            expected |= {f"layer{m.group(1)}.{sub}" for sub, _ in _LAYER_MAP.values()}
    missing = sorted(expected - set(out))
    if missing:
        raise ValueError(
            f"{len(missing)} required weights absent from the state_dict "
            f"(first 8, npz names): {missing[:8]}"
        )
    return out


def export_state_dict(weights: dict) -> "OrderedDict[str, np.ndarray]":
    """Inverse of :func:`map_state_dict`: npz weights → HF/torch names.

    Used to round-trip-test the converter and to hand a numpy-trained model
    back to a torch consumer.
    """
    inv_fixed = {v[0]: (k, v[1]) for k, v in _FIXED_MAP.items()}
    inv_layer = {v[0]: (k, v[1]) for k, v in _LAYER_MAP.items()}
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    layer_re = re.compile(r"^layer(\d+)\.(.+)$")
    for name, arr in weights.items():
        if name in inv_fixed:
            torch_key, transpose = inv_fixed[name]
        else:
            m = layer_re.match(name)
            if not (m and m.group(2) in inv_layer):
                raise ValueError(f"unknown npz key {name}")
            sub, transpose = inv_layer[m.group(2)]
            torch_key = f"bert.encoder.layer.{m.group(1)}.{sub}"
        out[torch_key] = np.ascontiguousarray(arr.T) if transpose else arr
    return out


# ---------------------------------------------------------------------------
# directory-level conversion
# ---------------------------------------------------------------------------


def convert_checkpoint(
    src_dir: str,
    dst_dir: str,
    num_heads: int | None = None,
    max_length: int = 128,
) -> str:
    """Reference ``save_pretrained`` directory → npz directory.

    ``num_heads`` is the one hyperparameter a state_dict's shapes cannot
    reveal; defaults to ``hidden // 64`` (the BERT head-size convention —
    12 for the reference's 768-wide multilingual encoder) unless the source
    ``config.json`` carries ``num_attention_heads``.
    """
    sd = read_torch_state_dict(os.path.join(src_dir, "pytorch_model.bin"))
    weights = map_state_dict(sd)

    cfg_path = os.path.join(src_dir, "config.json")
    ref_cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            ref_cfg = json.load(f)

    vocab_path = os.path.join(src_dir, "vocab.txt")
    with open(vocab_path, encoding="utf-8") as f:
        vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]

    lowercase = False
    tok_cfg_path = os.path.join(src_dir, "tokenizer_config.json")
    if os.path.exists(tok_cfg_path):
        with open(tok_cfg_path) as f:
            lowercase = bool(json.load(f).get("do_lower_case", False))

    vocab_size, hidden = weights["embeddings.word"].shape
    if vocab_size != len(vocab):
        raise ValueError(
            f"vocab.txt has {len(vocab)} entries but the word-embedding "
            f"matrix is {vocab_size} wide"
        )
    layer_ids = sorted(
        {int(m.group(1)) for k in weights if (m := re.match(r"^layer(\d+)\.", k))}
    )
    num_layers = len(layer_ids)
    if layer_ids != list(range(num_layers)):
        raise ValueError(f"non-contiguous encoder layers {layer_ids}")
    # A truncated export missing entire TOP layers (e.g. 6 of 12) is still
    # contiguous and passes map_state_dict's per-present-layer key check —
    # only the declared depth can catch it, so when the source config
    # states num_hidden_layers it must match exactly.
    declared_layers = int(ref_cfg.get("num_hidden_layers") or 0)
    if declared_layers and declared_layers != num_layers:
        raise ValueError(
            f"config.json declares num_hidden_layers={declared_layers} but "
            f"the state_dict carries {num_layers} encoder layers — "
            "truncated or mismatched export"
        )
    heads = (
        num_heads
        or int(ref_cfg.get("num_attention_heads") or 0)
        or max(1, hidden // 64)  # BERT head-size convention; ≥1 for tiny models
    )
    if hidden % heads:
        raise ValueError(f"hidden {hidden} not divisible by num_heads {heads}")
    num_labels = int(weights["classifier.b"].shape[0])
    if "crf.transitions" not in weights:
        raise ValueError("checkpoint has no CRF parameters (use_crf=False?)")

    # The npz runtime decodes label ids through the FIXED core.schemas
    # BIO_LABELS order. A checkpoint trained with a reordered or custom
    # label set of the same size would pass every shape check and then
    # silently emit wrong entity labels — so when the source config
    # declares its mapping, it must match exactly.
    id2label = ref_cfg.get("id2label")
    if id2label:
        from indian_address_parser_spark.core.schemas import BIO_LABELS

        declared = [
            id2label.get(str(i), id2label.get(i)) for i in range(num_labels)
        ]
        want = list(BIO_LABELS[:num_labels])
        if len(id2label) != num_labels or declared != want:
            diffs = [
                f"{i}: checkpoint={d!r} runtime={w!r}"
                for i, (d, w) in enumerate(zip(declared, want))
                if d != w
            ]
            raise ValueError(
                "checkpoint id2label does not match the runtime BIO_LABELS "
                f"order ({len(id2label)} declared vs {num_labels} labels); "
                f"mismatches (first 8): {diffs[:8]}"
            )

    os.makedirs(dst_dir, exist_ok=True)
    np.savez(os.path.join(dst_dir, "weights.npz"), **weights)
    with open(os.path.join(dst_dir, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    config = {
        "vocab_size": vocab_size,
        "hidden_size": hidden,
        "num_layers": num_layers,
        "num_heads": heads,
        "intermediate_size": int(weights["layer0.ffn.b1"].shape[0]) if num_layers else 0,
        "max_position": int(weights["embeddings.position"].shape[0]),
        "num_labels": num_labels,
        "max_length": int(ref_cfg.get("max_length", max_length)),
        "lowercase": lowercase,
        "converted_from": "torch_state_dict",
    }
    if id2label:
        # carry the (validated) mapping through for traceability
        config["id2label"] = {str(i): id2label.get(str(i), id2label.get(i)) for i in range(num_labels)}
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return dst_dir
