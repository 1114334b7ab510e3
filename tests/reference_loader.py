"""Test-only loader for the PyTorch reference implementation.

Used exclusively to verify numerical parity of the JAX rebuild against the
reference (/root/reference, read-only). Stubs the reference's unavailable
runtime deps (flashy, soundfile, torchmetrics) so individual modules import.
Parity tests are skipped automatically when the reference tree is absent.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")
AUDIOCRAFT_ROOT = REFERENCE_ROOT / "audiocraft" / "audiocraft"


def reference_available() -> bool:
    return AUDIOCRAFT_ROOT.is_dir()


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _ensure_pkg(name: str, path: Path) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    sys.modules[name] = mod
    return mod


def load_reference_modules():
    """Import the reference seanet/conv/lstm/quantization modules without
    executing the heavy package __init__ (which needs soundfile/av)."""
    assert reference_available()
    # stub flashy.distrib used by core_vq kmeans sync
    flashy = _stub("flashy")
    distrib = _stub("flashy.distrib", broadcast_tensors=lambda *a, **k: None,
                    is_distributed=lambda: False)
    flashy.distrib = distrib

    _ensure_pkg("refac", AUDIOCRAFT_ROOT)
    _ensure_pkg("refac.modules", AUDIOCRAFT_ROOT / "modules")
    _ensure_pkg("refac.quantization", AUDIOCRAFT_ROOT / "quantization")

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, AUDIOCRAFT_ROOT / rel)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    conv = load("refac.modules.conv", "modules/conv.py")
    lstm = load("refac.modules.lstm", "modules/lstm.py")
    streaming = load("refac.modules.streaming", "modules/streaming.py")
    seanet = load("refac.modules.seanet", "modules/seanet.py")
    base_q = load("refac.quantization.base", "quantization/base.py")
    core_vq = load("refac.quantization.core_vq", "quantization/core_vq.py")
    qpkg = sys.modules["refac.quantization"]
    qpkg.base = base_q
    qpkg.core_vq = core_vq
    vq = load("refac.quantization.vq", "quantization/vq.py")
    return types.SimpleNamespace(
        conv=conv, lstm=lstm, seanet=seanet, vq=vq, core_vq=core_vq
    )


def load_reference_tokenizer(espeak_backend_cls):
    """Import the reference data/tokenizer.py with ``phonemizer`` (absent
    here) and ``torchaudio`` stubbed out, injecting ``espeak_backend_cls``
    as ``EspeakBackend`` so tests can drive the reference TextTokenizer
    (reference data/tokenizer.py:31-83) with recorded espeak output."""
    assert REFERENCE_ROOT.is_dir()
    from .mock_espeak import MockSeparator

    class _Punct:
        @staticmethod
        def default_marks():
            return ';:,.!?¡¿—…"«»“”'

    stub_names = [
        "phonemizer", "phonemizer.backend", "phonemizer.backend.espeak",
        "phonemizer.backend.espeak.language_switch",
        "phonemizer.backend.espeak.words_mismatch",
        "phonemizer.punctuation", "phonemizer.separator", "torchaudio",
    ]
    pre_existing = {n for n in stub_names if n in sys.modules}
    phz = _stub("phonemizer")
    backend = _stub("phonemizer.backend", EspeakBackend=espeak_backend_cls)
    espeak_pkg = _stub("phonemizer.backend.espeak")
    _stub("phonemizer.backend.espeak.language_switch", LanguageSwitch=str)
    _stub("phonemizer.backend.espeak.words_mismatch", WordMismatch=str)
    _stub("phonemizer.punctuation", Punctuation=_Punct)
    _stub("phonemizer.separator", Separator=MockSeparator)
    phz.backend = backend
    backend.espeak = espeak_pkg
    # reference tokenizer.py imports torchaudio at module level (only used
    # by its audio paths, which these tests never touch)
    ta = _stub("torchaudio")
    if not hasattr(ta, "transforms"):
        ta.transforms = types.SimpleNamespace(Resample=None)

    name = "ref_data_tokenizer"
    try:
        spec = importlib.util.spec_from_file_location(
            name, REFERENCE_ROOT / "data" / "tokenizer.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        # drop the stubs so later imports of our own modules still detect
        # the packages as absent (the loaded module keeps its bindings)
        for n in stub_names:
            if n not in pre_existing:
                sys.modules.pop(n, None)
    return mod


def load_reference_lm():
    """Import the reference SSR transformer modules (torch-only deps)."""
    assert REFERENCE_ROOT.is_dir()
    # stub torchmetrics for models/ssr.py (must be an nn.Module for ModuleList)
    import torch

    class _FakeAcc(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            return torch.tensor(0.0)

    tm = _stub("torchmetrics")
    cls = _stub("torchmetrics.classification", MulticlassAccuracy=_FakeAcc)
    tm.classification = cls

    _ensure_pkg("refssr", REFERENCE_ROOT)
    _ensure_pkg("refssr.models", REFERENCE_ROOT / "models")
    _ensure_pkg("refssr.models.modules", REFERENCE_ROOT / "models" / "modules")

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, REFERENCE_ROOT / rel)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    utils = load("refssr.models.modules.utils", "models/modules/utils.py")
    emb = load("refssr.models.modules.embedding", "models/modules/embedding.py")
    scaling = load("refssr.models.modules.scaling", "models/modules/scaling.py")
    activation = load("refssr.models.modules.activation", "models/modules/activation.py")
    transformer = load("refssr.models.modules.transformer", "models/modules/transformer.py")
    ssr = load("refssr.models.ssr", "models/ssr.py")
    return types.SimpleNamespace(
        utils=utils, embedding=emb, activation=activation,
        transformer=transformer, ssr=ssr,
    )
