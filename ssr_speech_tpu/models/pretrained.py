"""Pretrained-checkpoint pipeline: fetch (file / URL / HF-hub) + convert.

Capability parity with the reference loaders
(``audiocraft/audiocraft/models/loaders.py:39-71`` ``_get_state_dict``:
local file, local dir + filename, ``https://`` URL via the torch hub cache,
otherwise a HuggingFace repo id resolved with ``hf_hub_download``) and the
published-checkpoint layout (README "Pretrained Models":
``huggingface.co/westbrook/SSR-Speech-English`` with ``English.pth`` /
``Mandarin.pth`` LM bundles and ``wmencodec.th``).

Fetch resolves to a LOCAL PATH; conversion to JAX params goes through
``models.convert`` (torch [Cout,Cin,K] -> [K,Cin,Cout] etc.). Downloads are
cached under ``$SSR_CACHE_DIR`` (default ``~/.cache/ssr_speech_tpu``).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

logger = logging.getLogger(__name__)

# repo id + filenames of the published checkpoints (reference README.md:60-72)
DEFAULT_REPO = "westbrook/SSR-Speech-English"
MANDARIN_REPO = "westbrook/SSR-Speech-Mandarin"
LM_FILENAME = "English.pth"
CODEC_FILENAME = "wmencodec.th"

# Expected SHA256 of the published checkpoint files, keyed by basename.
# ``None`` = not yet recorded (this build environment has zero egress, so the
# published files were never reachable); the first verified fetch should fill
# these in via ``tools/validate_pretrained.py --record_sha``, after which every
# subsequent fetch is integrity-checked before conversion.
KNOWN_SHA256: Dict[str, Optional[str]] = {
    "English.pth": None,
    "Mandarin.pth": None,
    "wmencodec.th": None,
}


def file_sha256(path: str, chunk: int = 1 << 20) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _verify_sha256(path: str, expected: Optional[str]) -> None:
    if expected is None:
        expected = KNOWN_SHA256.get(os.path.basename(path))
    if expected is None:
        return  # nothing recorded yet — see KNOWN_SHA256 note
    got = file_sha256(path)
    if got != expected:
        raise ValueError(
            f"checkpoint SHA256 mismatch for {path}: expected {expected}, "
            f"got {got} — corrupted download or wrong file")


def _cache_dir(cache_dir: Optional[str] = None) -> str:
    d = cache_dir or os.environ.get(
        "SSR_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ssr_speech_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def fetch_checkpoint(
    file_or_url_or_id: str,
    filename: Optional[str] = None,
    cache_dir: Optional[str] = None,
    sha256: Optional[str] = None,
) -> str:
    """Resolve a checkpoint reference to a local path
    (reference loaders.py:39-65 semantics, minus torch coupling):

      - existing file -> itself,
      - existing dir  -> ``dir/filename``,
      - ``https://...`` -> downloaded once into the cache dir,
      - anything else -> HF hub repo id; needs ``filename`` and the
        ``huggingface_hub`` package (network access).

    When a SHA256 is known (``sha256`` arg or the ``KNOWN_SHA256`` registry),
    the resolved file is integrity-checked before being returned.
    """
    path = _resolve_checkpoint(file_or_url_or_id, filename, cache_dir)
    _verify_sha256(path, sha256)
    return path


def _resolve_checkpoint(
    file_or_url_or_id: str,
    filename: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    ref = str(file_or_url_or_id)
    if os.path.isfile(ref):
        return ref
    if os.path.isdir(ref):
        assert filename, "filename required with a checkpoint directory"
        path = os.path.join(ref, filename)
        if not os.path.isfile(path):
            raise FileNotFoundError(path)
        return path
    if ref.startswith(("https://", "http://")):
        import urllib.parse
        import urllib.request

        name = os.path.basename(urllib.parse.urlparse(ref).path) or "checkpoint"
        dest = os.path.join(_cache_dir(cache_dir), name)
        if not os.path.isfile(dest):
            logger.info("downloading %s -> %s", ref, dest)
            tmp = dest + ".tmp"
            urllib.request.urlretrieve(ref, tmp)
            os.replace(tmp, dest)  # atomic: no torn files on interrupt
        return dest
    # HF hub repo id
    assert filename is not None, \
        "filename needs to be defined if using HF checkpoints"
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "huggingface_hub is required to fetch hub checkpoints; "
            f"pass a local path instead ({ref})") from e
    return hf_hub_download(repo_id=ref, filename=filename,
                           cache_dir=_cache_dir(cache_dir))


def _unwrap_state_dict(sd):
    # audiocraft checkpoints nest the weights (utils/checkpoint.py:
    # {'best_state': {'model': ...}}; exports: {'best_state': ...}); LM
    # bundles keep them under 'model' — unwrap until a flat tensor dict
    for key in ("best_state", "model", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


def load_lm(file_or_url_or_id: str, cache_dir: Optional[str] = None
            ) -> Tuple[Dict[str, Any], Any, Dict[str, int]]:
    """LM bundle -> (jax params, SSRModelConfig, phn2num).

    Accepts our .pkl bundles and the reference's torch bundles
    (``{model, config(argparse args), phn2num}``, steps/trainer.py:220-229;
    the published English.pth / Mandarin.pth use this layout)."""
    from ..config import SSRModelConfig, TokenSpace, ssr_config_from_json
    from ..utils import checkpoint as ckpt
    from . import convert as cvt

    path = fetch_checkpoint(file_or_url_or_id, filename=LM_FILENAME,
                            cache_dir=cache_dir)
    if path.endswith((".pth", ".th", ".pt")):
        import torch

        bundle = torch.load(path, map_location="cpu", weights_only=False)
        args = bundle["config"]
        ns = vars(args) if not isinstance(args, dict) else args
        cfg = SSRModelConfig(
            d_model=ns["d_model"], nhead=ns["nhead"],
            num_layers=ns["num_decoder_layers"],
            n_codebooks=ns["n_codebooks"],
            audio_embedding_dim=ns["audio_embedding_dim"],
            text_vocab_size=ns["text_vocab_size"],
            tokens=TokenSpace(audio_vocab_size=int(ns["audio_vocab_size"]),
                              max_n_spans=ns["max_n_spans"]),
        )
        sd = {k: v.numpy() for k, v in _unwrap_state_dict(bundle["model"]).items()}
        params = cvt.convert_ssr_lm(sd, cfg)
        return params, cfg, bundle["phn2num"]
    bundle = ckpt.load_bundle(path)
    cfg = ssr_config_from_json(json.dumps(bundle["model_config"]))
    return bundle["params"], cfg, bundle["phn2num"]


def load_codec(file_or_url_or_id: str, cache_dir: Optional[str] = None):
    """Codec checkpoint -> AudioTokenizer. Accepts our .pkl bundles and the
    published ``wmencodec.th`` (audiocraft export layout)."""
    from ..config import CodecConfig, codec_config_from_json
    from ..data.tokenizer import AudioTokenizer
    from ..utils import checkpoint as ckpt
    from . import convert as cvt

    path = fetch_checkpoint(file_or_url_or_id, filename=CODEC_FILENAME,
                            cache_dir=cache_dir)
    cfg = CodecConfig()
    if path.endswith((".th", ".pth", ".pt")):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = _unwrap_state_dict(obj)
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
              for k, v in sd.items()}
        params = cvt.convert_wmencodec(sd, cfg)
    else:
        bundle = ckpt.load_bundle(path)
        params = bundle["params"]
        if bundle.get("config") is not None:  # honor the stored geometry
            cfg = codec_config_from_json(json.dumps(bundle["config"]))
    return AudioTokenizer(params, cfg)
