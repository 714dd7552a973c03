"""Import harness for the reference implementation at /root/reference/src.

The reference targets Python ≥3.14 (PEP 649 lazily-evaluated annotations);
on this interpreter its un-quoted forward annotations raise NameError at
import. The loader below compiles each ``address_parser`` module with
``from __future__ import annotations`` injected (semantics-preserving for
this codebase: nothing introspects evaluated annotations at runtime —
pydantic and dataclasses both accept stringified annotations).

Heavy ML deps the rules-only path never executes are stubbed *at module
granularity* so imports resolve:

- ``torch`` / ``transformers``: class placeholders only — the golden test
  runs ``AddressParser.rules_only()`` which never touches them
  (``pipeline.py:121-133``).
- ``rapidfuzz``: ``fuzz.ratio`` is backed by our verified-equivalent
  ``core.fuzzy.indel_ratio`` (normalized Indel similarity — the documented
  rapidfuzz algorithm, property-tested in test_core_gazetteer_fuzzy) and
  ``process.extract`` reproduces rapidfuzz's stable score ordering. The
  gazetteer similarity function is therefore SHARED between both sides of
  the golden test; everything else (normalizer, transliterator, extractor,
  refiner, span plumbing) runs the reference's own code.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import importlib.util
import os
import sys
import types

REF_SRC = "/root/reference/src"

_FUTURE = b"from __future__ import annotations\n"


class _FutureAnnotationsLoader(importlib.machinery.SourceFileLoader):
    def get_data(self, path: str) -> bytes:
        data = super().get_data(path)
        if path.endswith(".py"):
            return _FUTURE + data
        return data

    def get_code(self, fullname):  # bypass stale bytecode caches
        source = self.get_data(self.get_filename(fullname))
        return compile(source, self.get_filename(fullname), "exec", dont_inherit=True)


class _RefFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname != "address_parser" and not fullname.startswith("address_parser."):
            return None
        parts = fullname.split(".")
        base = os.path.join(REF_SRC, *parts)
        if os.path.isdir(base):
            origin = os.path.join(base, "__init__.py")
            spec = importlib.util.spec_from_file_location(
                fullname, origin, loader=_FutureAnnotationsLoader(fullname, origin),
                submodule_search_locations=[base],
            )
            return spec
        origin = base + ".py"
        if os.path.exists(origin):
            return importlib.util.spec_from_file_location(
                fullname, origin, loader=_FutureAnnotationsLoader(fullname, origin)
            )
        return None


def _register_stub(module: types.ModuleType) -> None:
    """Register a stub module WITH a ModuleSpec: a module whose __spec__ is
    None makes ``importlib.util.find_spec`` raise ValueError, which breaks
    pyspark's import-time ``have_package`` probes when a SparkSession is
    created after the harness installs its stubs (single-test-file runs)."""
    module.__spec__ = importlib.machinery.ModuleSpec(module.__name__, loader=None)
    sys.modules[module.__name__] = module


def _stub_ml_modules() -> None:
    if "torch" not in sys.modules:
        torch = types.ModuleType("torch")
        nn = types.ModuleType("torch.nn")

        class _Module:
            def __init__(self, *a, **k):
                pass

        class _Init:
            @staticmethod
            def uniform_(*a, **k):
                pass

        nn.Module = _Module
        nn.Parameter = staticmethod(lambda *a, **k: None)
        nn.Dropout = _Module
        nn.Linear = _Module
        nn.init = _Init()
        torch.nn = nn
        torch.randn = lambda *a, **k: None
        for name in ("Tensor", "LongTensor", "ByteTensor", "BoolTensor"):
            setattr(torch, name, type(name, (), {}))
        _register_stub(torch)
        _register_stub(nn)

    if "transformers" not in sys.modules:
        tf = types.ModuleType("transformers")

        class _Logging:
            @staticmethod
            def set_verbosity_error():
                pass

        tf.AutoTokenizer = type("AutoTokenizer", (), {})
        tf.AutoModel = type("AutoModel", (), {})
        tf.logging = _Logging()
        mo = types.ModuleType("transformers.modeling_outputs")
        mo.TokenClassifierOutput = type("TokenClassifierOutput", (), {})
        _register_stub(tf)
        _register_stub(mo)

    if "rapidfuzz" not in sys.modules:
        from indian_address_parser_spark.core.fuzzy import indel_ratio

        rf = types.ModuleType("rapidfuzz")
        fuzz = types.ModuleType("rapidfuzz.fuzz")
        fuzz.ratio = lambda a, b, **k: indel_ratio(a, b)
        process = types.ModuleType("rapidfuzz.process")

        def extract(query, choices, scorer=fuzz.ratio, limit=5, **k):
            scored = [
                (choice, scorer(query, choice), idx)
                for idx, choice in enumerate(choices)
            ]
            scored.sort(key=lambda t: -t[1])  # stable: ties keep input order
            return scored[:limit]

        process.extract = extract
        rf.fuzz = fuzz
        rf.process = process
        _register_stub(rf)
        _register_stub(fuzz)
        _register_stub(process)


_installed = False


def load_reference():
    """→ the reference ``address_parser`` package, importable & runnable
    (rules-only paths) on this interpreter."""
    global _installed
    if not _installed:
        _stub_ml_modules()
        sys.meta_path.insert(0, _RefFinder())
        _installed = True
    import address_parser

    return address_parser
